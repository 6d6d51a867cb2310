package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.abs
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row
    (4L, 10L, ts("2024-01-01 11:00:00"))  // exactly at a right ts (inclusive)
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:30:00"), 101L),
    (10L, ts("2024-01-01 11:00:00"), 102L),
    (20L, ts("2024-01-01 09:30:00"), 201L)
  ).toDF("user_id", "ts", "event_id")

  test("asof join: latest right at-or-before each left, null when none") {
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts",
        "event_id", "last_err")
      .select("event_id", "last_err").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(1L) == Some(101L))  // 09:30 is latest before 10:00
    assert(out(2L) == Some(102L))  // 11:00 before 12:00
    assert(out(3L) == None)        // nothing before 09:00 for user 20
    assert(out(4L) == Some(102L))  // inclusive: right at exactly 11:00
  }

  test("banded range join finds all pairs within tolerance, incl. boundary") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((11L, 10L, ts("2024-01-01 10:05:00")),  // 300s from both
      (12L, 10L, ts("2024-01-01 10:04:59")),            // 299s / 301s
      (13L, 20L, ts("2024-01-01 10:00:00"))             // other user
    ).toDF("event_id", "user_id", "ts")
    val pairs = TemporalJoins.bandedRangeJoin(l, r, "user_id", "ts", "ts", 300)
      .select("l_id", "r_id", "delta_sec")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set(
      (1L, 11L, -300L), (1L, 12L, -299L), // both within ±300 of 10:00
      (2L, 11L, 300L)))                    // 10:10 vs 10:05 boundary; 12 is 301s away
  }

  test("banded range join equals the naive inequality join on real data") {
    val events = Tables.load(spark, sf0001, "events")
    val l = events.where($"event_type" === "purchase")
    val r = events.where($"event_type" === "error")
    val banded = TemporalJoins.bandedRangeJoin(l, r, "user_id", "ts", "ts", 300)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val naive = l.alias("l").join(r.alias("r"),
        $"l.user_id" === $"r.user_id" &&
          abs(org.apache.spark.sql.functions.unix_micros($"l.ts") -
            org.apache.spark.sql.functions.unix_micros($"r.ts"))
            <= 300L * 1000000L)
      .select($"l.event_id", $"r.event_id").as[(Long, Long)].collect().toSet
    assert(banded == naive)
  }

  test("asof: a null right timestamp never matches (native ASOF semantics)") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((99L, 10L, Option.empty[Timestamp]))
      .toDF("event_id", "user_id", "ts")
      .select($"user_id", $"ts", $"event_id")
    val out = TemporalJoins.asofJoin(l, r, "user_id", "ts",
        "event_id", "last_err")
      .select("last_err").collect()
    assert(out.length == 1 && out.head.isNullAt(0),
      "a null-ts right row must not be invented as the as-of match")
  }

  test("banded range join is exact at sub-second resolution") {
    // true |delta| = 10.9s > 10 but whole-second truncation reads 10:
    // the pair must be EXCLUDED; the 9.95s pair must be included
    val l = Seq((1L, 10L, Timestamp.valueOf("2024-01-01 10:00:20.9")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (11L, 10L, Timestamp.valueOf("2024-01-01 10:00:10.0")),
      (12L, 10L, Timestamp.valueOf("2024-01-01 10:00:10.95")))
      .toDF("event_id", "user_id", "ts")
    val pairs = TemporalJoins.bandedRangeJoin(l, r, "user_id", "ts", "ts", 10)
      .select("r_id").as[Long].collect().toSet
    assert(pairs == Set(12L),
      s"10.9s pair must be outside a 10s tolerance, got $pairs")
  }

  test("bandedRangeJoin rejects a non-positive tolerance") {
    intercept[IllegalArgumentException] {
      TemporalJoins.bandedRangeJoin(left, right, "user_id", "ts", "ts", 0)
    }
  }
}
