package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the step that turns
  * curated documents into training-window-sized pieces (the packer,
  * `ext_token_packing`, then concatenates pieces up to the context
  * budget; this SPLITS single documents that exceed it).
  *
  * Scale shape: per-row `explode(sequence(...))` (GenerateExec) over a
  * codegen'd `slice` — no lambda HOF, no shuffle, no state; a 100 TB
  * chunking pass is exactly as parallel as its scan, and the output
  * partitioning inherits the input's (chunks of a document stay in its
  * partition, which the packer's prefix-sum stage relies on).
  *
  * Token convention: the raw `split(trim(text), '\s+')` array (the
  * engine-shared convention of the shingle/dedup stack) — a
  * whitespace-only document yields one empty-string token and hence one
  * empty chunk, deterministically in both engines.
  */
object Chunking {

  /** One row per (document, window): `chunk_idx` (0-based), the window
    * text, and its token count. Windows advance by `chunkSize -
    * overlap`; the last window may be shorter; documents at most
    * `chunkSize` tokens long yield exactly one window. */
  def tokenChunks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkSize: Int = 64,
      overlap: Int = 8): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(col("toks"))
    // ceil((n - overlap) / stride) via floor — exact for any corpus
    // (doubles are exact far past any real token count)
    val nChunks = greatest(lit(1),
      floor((n - overlap + stride - 1).cast("double") / stride)
        .cast("int"))
    docs.select(col(idCol), toks.as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("toks"), col("chunk_idx") * stride + 1,
          lit(chunkSize))).as("n_tokens"))
  }
}
