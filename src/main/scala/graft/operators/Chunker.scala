package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking with overlap — the inference/embedding-side dual of
  * [[SequencePacking]]: split each document into `chunkSize`-token windows
  * advancing by `stride` tokens (overlap = chunkSize − stride), the standard
  * prep for context-window-bounded embedding and retrieval indexing.
  *
  * Scale shape: tokens, the chunk index sequence, and every chunk string are
  * built per-row with higher-order functions and posexplode — no shuffle, no
  * UDF, whole-stage codegen; a 100 TB corpus chunks during its scan. Output
  * grows by roughly n/stride rows per doc, which is the contract, not a blow-up
  * (stride bounds the duplication factor at chunkSize/stride).
  */
object Chunker {

  /** (id, chunk_idx, n_chunk_tokens, chunk [, keepCols…]) rows. The last
    * chunk of a doc may be shorter than `chunkSize` (slice clamps at the
    * end); docs with at most `chunkSize` tokens produce exactly one chunk.
    * Chunk count for n > chunkSize is floor((n − chunkSize + stride − 1)/
    * stride) + 1 — the minimal windows covering every token with the final
    * window still starting inside the doc. `keepCols` ride the explode
    * verbatim onto every chunk of their doc (zero extra shuffle) — e.g. a
    * `source` column a downstream layout clusters on. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int,
                    keepCols: Seq[String] = Nil): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"need 0 < stride($stride) <= chunkSize($chunkSize)")
    val staged = docs.select(col(idCol) +: TextFunctions.tokens(col(textCol)).as("_toks")
      +: keepCols.map(col): _*)
    val n = size(col("_toks"))
    // positive operands: double-divide + floor == integer ceil-div arithmetic
    val nChunks = when(n <= chunkSize, lit(1L)).otherwise(
      floor((n - chunkSize + stride - 1).cast("double") / stride) + 1L)
    staged
      .select(col(idCol) +: col("_toks") +: keepCols.map(col) :+
        posexplode(transform(sequence(lit(0L), nChunks - 1L),
          i => slice(col("_toks"), (i * stride + 1).cast("int"), lit(chunkSize))))
          .as(Seq("chunk_idx", "_chunk_toks")): _*)
      .select(col(idCol) +: col("chunk_idx").cast("long").as("chunk_idx") +:
        size(col("_chunk_toks")).cast("long").as("n_chunk_tokens") +:
        array_join(col("_chunk_toks"), " ").as("chunk") +: keepCols.map(col): _*)
  }
}
