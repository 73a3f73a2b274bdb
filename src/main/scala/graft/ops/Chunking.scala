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

  /** Content-defined chunking (CDC — the dedup-friendly chunker, cf.
    * LBFS/rsync rolling-window splitting): a chunk boundary opens at
    * every character position whose k-char gram's md5 hex starts with
    * `selPrefix`, so boundaries are functions of CONTENT alone — insert
    * a byte early in a document and every later chunk boundary
    * re-aligns, where fixed-size chunking would shift all of them
    * (the property that makes chunk-level dedup work). Expected chunk
    * length ≈ 16^|selPrefix| chars.
    *
    * Returns (idCol, chunk_idx, chunk_start (1-based), chunk_len,
    * chunk_md5) — the fingerprint, not the text (chunk-level dedup
    * consumes hashes). A document with no qualifying position is one
    * whole-document chunk; empty documents produce no rows.
    *
    * Scale shape: the position explode and md5 gate are narrow (the
    * same windowed-gram machinery as the span-dedup family — md5 for
    * engine-reproducible selection); the only exchange is the per-doc
    * window ordering boundary positions, whose partitions hold
    * len/16^|prefix| rows per document — bounded by content, not
    * corpus. */
  def contentDefined(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 40,
      selPrefix: String = "0"): DataFrame = {
    require(k > 0 && selPrefix.nonEmpty && selPrefix.matches("[0-9a-f]+"),
      "k > 0 and a lowercase-hex selPrefix required")
    import org.apache.spark.sql.expressions.Window
    // The per-position md5 gate is CPU-dense narrow work (one hash per
    // character position) fused onto a typically single-split corpus
    // scan — spread the docs first (fanOut: no-op on a wide input).
    val base = graft.Tables.fanOut(
      df.select(col(idCol).as("__id"), col(textCol).as("__t"))
        .filter(col("__t").isNotNull && length(col("__t")) > 0))
    // Cut positions (p ≥ 2: a cut at 1 would open an empty chunk).
    // sequence(2, n) DESCENDS for n < 2 — the length guard is load-bearing.
    val cuts = base
      .filter(length(col("__t")) - k + 1 >= 2)
      .select(col("__id"), col("__t"),
        explode(sequence(lit(2), length(col("__t")) - k + 1)).as("p"))
      .filter(substring(md5(col("__t").substr(col("p"), lit(k))), 1, selPrefix.length)
        === selPrefix)
      .select(col("__id"), col("p"))
    // Sentinel end-cut at len+1 for EVERY doc: docs without cuts still
    // yield their whole-document chunk.
    val pts = cuts.unionAll(
      base.select(col("__id"), (length(col("__t")) + 1).as("p")))
    val w = Window.partitionBy("__id").orderBy("p")
    val segs = pts
      .withColumn("s", coalesce(lag("p", 1).over(w), lit(1)))
      .filter(col("p") > col("s"))
    segs
      .join(base, Seq("__id"))
      .withColumn("chunk_idx",
        row_number().over(Window.partitionBy("__id").orderBy("s")).cast("long") - 1)
      .select(col("__id").as(idCol), col("chunk_idx"),
        col("s").cast("long").as("chunk_start"),
        (col("p") - col("s")).cast("long").as("chunk_len"),
        md5(col("__t").substr(col("s"), col("p") - col("s"))).as("chunk_md5"))
  }

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
