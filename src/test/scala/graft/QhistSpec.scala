package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Qhist

class QhistSpec extends SparkSpec {
  import spark.implicits._

  private def metric = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("v"))

  test("bucketing: monotone, bounded by the upper, 1/16 relative width") {
    val vals = Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, 33L, 100L, 1000L,
      123456L, 9999999999L).toDF("v")
    val got = vals
      .select(col("v"), Qhist.bucketOf("v").as("bucket"))
      .withColumn("upper", Qhist.bucketUpper(col("bucket")))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // monotone bucket ids, v never above its bucket's upper bound
    assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    got.foreach { case (v, _, upper) =>
      assert(v <= upper, s"v=$v above upper=$upper")
      assert(upper <= v + v / 16 + 1, s"bucket too wide at v=$v: $upper")
    }
    // spot values verified against the DuckDB replay
    val byV = got.map(g => g._1 -> (g._2, g._3)).toMap
    assert(byV(32L) == (32, 33L))
    assert(byV(1000L) == (111, 1023L))
    assert(byV(9999999999L) == (482, 10200547327L))
  }

  test("merge and unlearn are exact: slice algebra equals rebuilds") {
    val m = metric.localCheckpoint()
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "cnt").as[(Int, Long)].collect().toMap
    val a = Qhist.registers(m.where($"doc_id" % 2 === 0), "v")
    val b = Qhist.registers(m.where($"doc_id" % 2 =!= 0), "v")
    assert(regMap(Qhist.fold(a.unionByName(b))) ==
      regMap(Qhist.registers(m, "v")))
    val neg = Qhist.registers(m.where($"source" === "src0"), "v")
      .withColumn("cnt", -col("cnt"))
    assert(regMap(Qhist.fold(Qhist.registers(m, "v").unionByName(neg))) ==
      regMap(Qhist.registers(m.where($"source" =!= "src0"), "v")))
  }

  test("served cutoffs cover at least p permille and overshoot <= one bucket") {
    val m = metric.localCheckpoint()
    val n = m.count()
    val regs = Qhist.fold(Qhist.registers(m, "v"))
    val ps = Seq(500, 900, 990)
    val served = Qhist.cutoffs(regs, ps)
      .select("p_permille", "cutoff").as[(Int, Long)].collect().toMap
    val values = m.select("v").as[Long].collect().sorted
    ps.foreach { p =>
      val c = served(p)
      // coverage: at least ceil(p*n/1000) values sit at or under c
      val covered = values.count(_ <= c)
      assert(covered * 1000L >= p.toLong * n,
        s"p=$p cutoff=$c covers only $covered of $n")
      // tightness: the exact p-th value's own bucket upper bounds c
      val k = ((p.toLong * n + 999) / 1000).toInt
      val exact = values(k - 1)
      assert(c <= exact + exact / 16 + 1,
        s"p=$p cutoff=$c too far above exact=$exact")
    }
  }

  test("per-group cutoffs serve every group from one bounded table") {
    val m = metric.localCheckpoint()
    val regs = Qhist.fold(Qhist.registers(m, "v", Seq("source")),
      Seq("source"))
    val out = Qhist.cutoffs(regs, Seq(500), Seq("source"))
      .select("source", "cutoff").as[(String, Long)].collect().toMap
    val groups = m.select("source").distinct().as[String].collect()
    assert(out.keySet == groups.toSet)
    groups.foreach { g =>
      val vs = m.where($"source" === g).select("v").as[Long]
        .collect().sorted
      assert(vs.count(_ <= out(g)) * 2L >= vs.length,
        s"median cutoff for $g uncovers half the group")
    }
  }

  test("negative metric values fail the job loudly, not a corrupt histogram") {
    import graft.operators.Qhist
    // the non-negative-long contract used to live only in a comment; a
    // signed metric would emit negative bucket ids with inconsistent
    // upper bounds — now the register build raises instead
    val bad = Seq(5L, -3L, 7L).toDF("v")
    val e = intercept[Exception] {
      Qhist.registers(bad, "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negative metric value")),
      s"expected the contract error, got: $e")
    // and the guard costs nothing on the happy path
    val ok = Qhist.registers(Seq(5L, 3L, 7L).toDF("v"), "v").collect()
    assert(ok.map(_.getAs[Long]("cnt")).sum == 3L)
  }
}
