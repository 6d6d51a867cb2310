package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X16 — general coordinate re-projection
  * (/root/reference/sync-db2-ago.py:40-42,70-126).
  *
  * The reference builds a pyproj EPSG transformer and maps it over every
  * geometry's coordinates; in its deployed config the transform is the
  * identity (IN_SRID == AGO_SRID == 4326, config.py:5-6), and any
  * unrecognized shape raises NotImplementedError. Here the supported
  * non-identity pair is EPSG:4326 ↔ EPSG:3857 — the closed-form
  * spherical-Mercator equations — composed from built-in column
  * functions only, so the math runs inside whole-stage codegen and
  * needs no projection library, no UDF, and no per-row interpreter.
  */
object Reproject {

  /** WGS84 / Web Mercator sphere radius (EPSG:3857 definition). */
  private val R = 6378137.0

  /** EPSG:4326 lon (deg) → EPSG:3857 x (m). */
  def mercX(lon: Column): Column = radians(lon) * R

  /** EPSG:4326 lat (deg) → EPSG:3857 y (m). */
  def mercY(lat: Column): Column =
    log(tan(lit(math.Pi / 4) + radians(lat) / 2)) * R

  /** EPSG:3857 x (m) → EPSG:4326 lon (deg). */
  def invLon(x: Column): Column = degrees(x / R)

  /** EPSG:3857 y (m) → EPSG:4326 lat (deg). */
  def invLat(y: Column): Column =
    degrees(atan(exp(y / R)) * 2 - lit(math.Pi / 2))

  /** General (lon, lat) re-projection between the supported SRIDs.
    * Equal SRIDs are the identity — the reference's deployed path; an
    * unsupported pair fails fast at plan-build time, mirroring the
    * reference's NotImplementedError (sync-db2-ago.py:125-126). */
  def project(lon: Column, lat: Column, fromSrid: Int,
      toSrid: Int): (Column, Column) = (fromSrid, toSrid) match {
    case (a, b) if a == b => (lon, lat)
    case (4326, 3857) => (mercX(lon), mercY(lat))
    case (3857, 4326) => (invLon(lon), invLat(lat))
    case other => throw new IllegalArgumentException(
      s"unsupported re-projection $other; supported: identity, 4326<->3857")
  }
}
