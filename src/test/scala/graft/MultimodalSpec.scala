package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))

  test("media table: binary payload + round-robin format") {
    val r = media.select("doc_id", "format").as[(Long, String)].collect()
    r.foreach { case (id, f) =>
      assert(f == Seq("png", "wav", "mp4")((id % 3).toInt))
    }
  }

  test("metadata projection: n_bytes equals utf-8 byte length") {
    val r = Multimodal.mediaMetadata(media)
      .join(Tables.load(spark, sf0001, "documents"), "doc_id")
      .select($"n_bytes", length($"text"))
      .as[(Int, Int)].collect()
    // test corpus is pure ASCII → byte length == char length
    r.foreach { case (nb, nc) => assert(nb == nc) }
  }

  test("decode stub is deterministic and byte-derived") {
    val f1 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    val byId = media.as[Multimodal.MediaRow].collect().map(r => r.doc_id -> r).toMap
    f1.take(20).foreach { f =>
      val bytes = byId(f.doc_id).payload
      assert(f.n_bytes == bytes.length)
      assert(f.width == (bytes(0) & 0xff) * 4)
      assert(f.height == (bytes(1) & 0xff) * 3)
    }
  }

  test("frame sampling: one row per frame, 40ms spacing at 25fps") {
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    counts.foreach { case (id, n) => assert(n == id % 5 + 1) }
    frames.select("frame_idx", "offset_ms").as[(Int, Long)].collect()
      .foreach { case (idx, off) => assert(off == idx * 40L) }
  }
}
