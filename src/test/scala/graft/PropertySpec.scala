package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Normalize

/** Property-style tests (SURVEY §5): scalacheck generators with a fixed
  * seed produce an adversarial string corpus once, then each property is
  * checked column-wise over the whole corpus in a single Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val gen: Gen[String] = Gen.frequency(
    5 -> Gen.asciiPrintableStr,
    3 -> Gen.listOf(Gen.choose(Char.MinValue, '퟿')).map(_.mkString),
    1 -> Gen.listOfN(2500, Gen.alphaNumChar).map(_.mkString),
    1 -> Gen.oneOf("", "   ", "<>'", "'''", "0", "007", "999",
      "café ⚠ ñ", "a\tb\nc"))

  private lazy val corpus: Seq[String] =
    (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val df = corpus.toDF("s").cache()

  test("truncation: length bound holds and is prefix-stable") {
    val bad = df.select(
        length(Normalize.truncated($"s", 250)).as("len"),
        Normalize.truncated($"s", 250).as("t250"),
        Normalize.truncated($"s", 2000).as("t2000"))
      .where($"len" > 250 || !$"t2000".startsWith($"t250"))
    assert(bad.count() == 0)
  }

  test("nfkdAscii: output is pure ASCII and idempotent") {
    val once = Normalize.nfkdAscii($"s")
    val bad = df.select(once.as("a"), Normalize.nfkdAscii(once).as("b"))
      .where($"a" =!= $"b" || $"a".rlike("[^\\x00-\\x7F]"))
    assert(bad.count() == 0)
  }

  test("stripEdges: result has no stripped chars at either end; inner preserved") {
    val bad = df.select(Normalize.stripEdges($"s").as("r"))
      .where($"r".rlike("^[<>']|[<>']$"))
    assert(bad.count() == 0)
  }

  test("digitsAsInt: null or in [0, maxValid]") {
    val bad = df.select(Normalize.digitsAsInt($"s").as("d"))
      .where($"d".isNotNull && ($"d" < 0 || $"d" > 100))
    assert(bad.count() == 0)
  }

  test("boolTo01 is total over arbitrary strings") {
    val vals = df.select(Normalize.boolTo01($"s").as("b"))
      .distinct().as[Int].collect().toSet
    assert(vals.subsetOf(Set(0, 1)))
  }

  test("watermark monotonicity: delta of a merge never lowers the watermark") {
    import graft.operators.Incremental
    val base = Tables.load(spark, sf0001, "orders")
    val target = base.where($"o_orderkey" % 3 =!= 0)
    val wm0 = target.agg(Incremental.watermarkExpr("o_orderdate"))
      .head().getTimestamp(0)
    val merged = Incremental.merge(target, base.where($"o_orderkey" % 3 === 0),
      "o_orderkey")
    val wm1 = merged.agg(Incremental.watermarkExpr("o_orderdate"))
      .head().getTimestamp(0)
    assert(!wm1.before(wm0))
  }
}
