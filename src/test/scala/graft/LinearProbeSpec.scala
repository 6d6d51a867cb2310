package graft

import graft.operators.LinearProbe

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  test("exact linear data is recovered exactly at lambda = 0") {
    // y = 3 + 2·x1 + 5·x2; all moments are small integers, so the
    // Cramer determinants are exact doubles and the solve is exact.
    val feats = Seq((1L, 1L), (2L, 1L), (1L, 2L), (3L, 5L), (4L, 2L))
      .map { case (x1, x2) => (x1, x2, 3 + 2 * x1 + 5 * x2) }
      .toDF("x1", "x2", "y")
    val r = LinearProbe.ridge2(feats, "x1", "x2", "y", lambda = 0.0).head()
    assert(r.getAs[Double]("b0") == 3.0)
    assert(r.getAs[Double]("b1") == 2.0)
    assert(r.getAs[Double]("b2") == 5.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Long]("n") == 5L)
  }

  test("ridge keeps collinear features finite and shrinks them") {
    // x2 = 2·x1 exactly: OLS is singular; ridge(1.0) must produce
    // finite coefficients and near-perfect fit on y = x1 + x2 (= 3·x1).
    val feats = Seq(1L, 2L, 3L, 4L, 5L)
      .map(x1 => (x1, 2 * x1, 3 * x1)).toDF("x1", "x2", "y")
    val r = LinearProbe.ridge2(feats, "x1", "x2", "y", lambda = 1.0).head()
    val (b0, b1, b2) = (r.getAs[Double]("b0"), r.getAs[Double]("b1"),
      r.getAs[Double]("b2"))
    assert(!b0.isNaN && !b1.isNaN && !b2.isNaN)
    // shrinkage splits the weight across the collinear pair: both
    // contribute, neither explodes
    assert(b1 > 0 && b2 > 0 && b1 < 3 && b2 < 3)
    assert(r.getAs[Double]("r2") > 0.99)
  }

  test("noise around a plane still yields a strong fit with sane signs") {
    // deterministic pseudo-noise from the row index
    val feats = (1 to 200).map { i =>
      val x1 = (i * 13) % 50L
      val x2 = (i * 7) % 30L
      (x1, x2, 10 + 4 * x1 - 2 * x2 + (i % 5) - 2)
    }.toDF("x1", "x2", "y")
    val r = LinearProbe.ridge2(feats, "x1", "x2", "y", lambda = 1.0).head()
    assert(math.abs(r.getAs[Double]("b1") - 4.0) < 0.05)
    assert(math.abs(r.getAs[Double]("b2") + 2.0) < 0.05)
    assert(r.getAs[Double]("r2") > 0.99)
  }

  test("moments are additive: incremental train equals one-shot exactly") {
    val all = (1 to 120).map(i =>
      ((i * 13) % 50L, (i * 7) % 30L, (i * 31) % 90L)).toDF("x1", "x2", "y")
    val b1 = all.where($"x1" % 2 === 0)
    val b2 = all.where($"x1" % 2 =!= 0)
    val inc = LinearProbe.ridgeFromMoments(
      LinearProbe.addMoments(
        LinearProbe.moments(b1, "x1", "x2", "y"),
        LinearProbe.moments(b2, "x1", "x2", "y"))).head()
    val one = LinearProbe.ridge2(all, "x1", "x2", "y").head()
    assert(inc == one) // bit-identical, not approximately equal
  }

  test("exact unlearning: subtracting a batch equals never seeing it") {
    val keep = (1 to 80).map(i =>
      ((i * 13) % 50L, (i * 7) % 30L, (i * 31) % 90L)).toDF("x1", "x2", "y")
    val junk = (1 to 40).map(i =>
      ((i * 5) % 99L, (i * 11) % 44L, (i * 3) % 77L)).toDF("x1", "x2", "y")
    val mKeep = LinearProbe.moments(keep, "x1", "x2", "y")
    val mJunk = LinearProbe.moments(junk, "x1", "x2", "y")
    val unlearned = LinearProbe.ridgeFromMoments(
      LinearProbe.subtractMoments(
        LinearProbe.addMoments(mKeep, mJunk), mJunk)).head()
    assert(unlearned == LinearProbe.ridgeFromMoments(mKeep).head())
  }

  test("training is one aggregate: a single exchange to the combine") {
    val feats = Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id % 100 as x1", "doc_id % 37 as x2",
        "doc_id % 17 as y")
    val plan = LinearProbe.ridge2(feats, "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly the single-row combine exchange in:\n$plan")
  }
}
