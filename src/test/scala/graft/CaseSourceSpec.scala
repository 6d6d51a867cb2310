package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class CaseSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Int = 1000, partitions: Int = 4) =
    spark.read.format("graft.sources.CaseSource")
      .option("rows", rows.toString).option("partitions", partitions.toString)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .orElse(df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collectFirst { case b: BatchScanExec => b }
      }.flatten.headOption)
      .getOrElse(fail("no BatchScanExec in plan"))

  test("full scan produces rows across partitions") {
    val df = read(1000, 4)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
    val r = df.where($"CaseNumber" === "7").head()
    assert(r.getAs[String]("Status") == "Open") // 7 % 3 == 1
    assert(r.getAs[String]("Description") == "case-7")
  }

  test("watermark predicate is pushed into the source and applied there") {
    val wm = Timestamp.valueOf("2024-01-01 08:00:00") // row index > 480
    val df = read(1000, 4).where($"LastModifiedDate" > lit(wm))
    assert(df.count() == 1000 - 481)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("LastModifiedDate"), s"not pushed: $desc")
  }

  test("RecordTypeId equality is pushed; unsupported predicates stay residual") {
    val df = read(1000, 4).where($"RecordTypeId" === "OTHER")
    // i % 5 in {0, 3, 4} → min(2)... recordTypeOf: (i%5).min(2): 0→OTHER,1→012G,2..4→''
    val expected = (0 until 1000).count(i => (i % 5).min(2) == 0)
    assert(df.count() == expected)
    assert(scanOf(df).scan.description().contains("RecordTypeId"))

    // two accepted equalities on the same column must BOTH be enforced
    val conflicting = read(1000, 4)
      .where($"RecordTypeId" === "OTHER" && $"RecordTypeId" === "012G00000014BhVIAU")
    assert(conflicting.count() == 0)

    val residual = read(1000, 4).where($"Description".contains("case-99"))
    assert(residual.count() == 1 + 10) // case-99 and case-990..999
    assert(!scanOf(residual).scan.description().contains("Description ="))
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000, 2).select("CaseNumber", "Status")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq ==
      Seq("CaseNumber", "Status"))
    assert(df.count() == 1000)
  }

  test("incremental-sync shape on top of the connector: wm → delta → merge") {
    val source = read(1000, 4)
    val target = source.where($"LastModifiedDate" <=
      lit(Timestamp.valueOf("2024-01-01 10:00:00")))
    val wm = target.agg(max($"LastModifiedDate")).head().getTimestamp(0)
    val delta = source.where($"LastModifiedDate" > lit(wm))
    val merged = graft.operators.Incremental.merge(target, delta, "CaseNumber")
    assert(merged.count() == 1000)
  }
}
