package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window prep step of a
  * training pipeline: long documents split into fixed-size token windows
  * with overlap (stride < window), so every token lands in at least one
  * chunk and boundaries don't sever context.
  *
  * Tokens are `\S+` runs (whitespace tokenization, case-preserving —
  * deterministic and cross-engine reproducible); the chunk text is the
  * windowed tokens rejoined with single spaces, so intra-token bytes are
  * exact while inter-token whitespace is normalized (documented lossy).
  * Window starts step by `stride`; a trailing start whose window would be
  * entirely inside the previous window's reach (`start+window−stride ≥ n`
  * already covered to the end) is suppressed — no fully-redundant tail
  * chunks, matching the overflow behavior of standard tokenizer chunkers.
  *
  * Scale shape: pure narrow transforms — tokenize, explode the window
  * starts, slice — all inside one whole-stage-codegen pipeline with ZERO
  * exchanges; output order is inherited, and the operator parallelizes
  * with the scan. Zero-token documents produce no chunks.
  */
object Chunking {

  /** (idCol, chunk_idx, n_tokens, chunk_text), one row per window.
    * `window` = tokens per chunk; `stride` = start step (≤ window for
    * overlap `window − stride`). */
  def slidingWindows(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val base = df
      .select(col(idCol),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
    base
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      // suppress trailing windows fully covered by their predecessor
      .filter(col("__s") === 0 || col("__s") + (window - stride) < col("__n"))
      .select(
        col(idCol),
        (col("__s") / stride).cast("long").as("chunk_idx"),
        least(lit(window), col("__n") - col("__s")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__s") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
