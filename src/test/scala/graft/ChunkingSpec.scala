package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(text: String, size: Int, overlap: Int) =
    Chunking.tokenChunks(Seq((1L, text)).toDF("doc_id", "text"),
        chunkSize = size, overlap = overlap)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Int, String, Int)].collect().toSeq

  test("hand-computed windows: stride, overlap, short tail") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4, overlap 1 → stride 3 → ceil((10-1)/3) = 3 chunks
    assert(chunk(text, 4, 1) == Seq(
      (0, "w1 w2 w3 w4", 4),
      (1, "w4 w5 w6 w7", 4),
      (2, "w7 w8 w9 w10", 4)))
    // a doc at most one window long yields exactly one window
    assert(chunk("a b c", 4, 1) == Seq((0, "a b c", 3)))
    assert(chunk("a b c d", 4, 1) == Seq((0, "a b c d", 4)))
    // zero overlap partitions exactly
    assert(chunk(text, 5, 0) == Seq(
      (0, "w1 w2 w3 w4 w5", 5), (1, "w6 w7 w8 w9 w10", 5)))
  }

  test("every token is covered and overlaps agree") {
    val docs = Tables.load(spark, sf0001, "documents")
    val chunks = Chunking.tokenChunks(docs, chunkSize = 32, overlap = 4)
    val stride = 28
    // coverage: per doc, token counts sum to n + overlap·(chunks−1)
    val agg = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("s"), count(lit(1)).as("c"))
      .join(docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n")), "doc_id")
    assert(agg.where(col("s") =!= col("n") + (col("c") - 1) * 4)
      .count() == 0)
    // adjacency: chunk i's tokens start where the stride says
    val bad = chunks
      .select(col("doc_id"), col("chunk_idx"),
        split(col("chunk_text"), " ").as("ct"))
      .join(docs.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("toks")), "doc_id")
      .where(element_at(col("ct"), 1) =!=
        element_at(col("toks"), col("chunk_idx") * stride + 1))
    assert(bad.count() == 0)
  }

  test("chunking is a zero-shuffle generate + project") {
    val docs = Tables.load(spark, sf0001, "documents")
    val plan = Chunking.tokenChunks(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("Generate"), s"expected Generate in:\n$plan")
  }

  test("pack doc spans tile every pack contiguously from offset zero") {
    val spans = SparkEntry.queries("ext_pack_doc_spans")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(spans.nonEmpty)
    spans.foreach { case (pack, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"pack $pack does not start at 0")
      sorted.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) =>
          assert(s2 == s1 + n1,
            s"pack $pack has a gap/overlap at offset $s2 (prev $s1+$n1)")
        case _ =>
      }
    }
  }
}
