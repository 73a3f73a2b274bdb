package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the LM-based quality
  * filter of web-corpus pipelines (cf. CCNet, Wenzek et al. 2020, which
  * gates documents on LM log-likelihood; a unigram model is the
  * engine-native, SQL-reproducible variant): documents whose tokens are
  * improbable under the corpus distribution (gibberish, boilerplate
  * soup, wrong language) score low and can be gated exactly like
  * [[TextAnalysis.qualityScore]].
  *
  * Token model: `[a-z]+` runs of the lowercased text — deterministic and
  * cross-engine reproducible (no tokenizer binary). Probabilities are
  * relative frequencies over ALL token occurrences; the vocabulary keeps
  * tokens with count ≥ `minCount`, and out-of-vocabulary tokens score at
  * the floor ln(1/total) — rarer than every kept token.
  *
  * Scale shape: training is one explode → token-keyed count with
  * map-side partial aggregation (the exchange carries (token, partial
  * count), never text); the corpus-total row is a broadcast single-row
  * constant join. Scoring explodes to (id, token), joins the vocabulary
  * (dwarfed by the corpus — broadcastable; Zipf caps distinct tokens
  * while occurrences grow linearly), and means per id — again partial
  * aggregation. Nothing is driver-side; no UDFs.
  */
object LanguageModel {

  /** `[a-z]+` token array of the lowercased text. */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(lower(c), lit("[a-z]+"), lit(0))

  /** Unigram model: (token, n, total, logp = ln(n/total)) for tokens
    * with n ≥ `minCount`; `total` counts every occurrence (kept or not),
    * so probabilities stay a true distribution over the observed stream
    * and the OOV floor ln(1/total) is strictly below every kept logp.
    * `total` rides along as a constant column so scoring needs no
    * driver-side value. */
  def unigramTable(df: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    val counts = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts
      .filter(col("n") >= minCount)
      .crossJoin(broadcast(total))
      .select(col("token"), col("n"), col("total"),
        log(col("n") / col("total")).as("logp"))
  }

  /** Mean token log-probability per document under `lm` (a
    * [[unigramTable]] output): (idCol, n_tokens, logp_mean). OOV tokens
    * score the floor ln(1/total); a document with zero tokens survives
    * with a null mean. */
  def scoreDocs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lm: DataFrame): DataFrame = {
    // single-row broadcast constant join — the OOV floor, in-plan
    val floorRow = lm.agg(log(lit(1.0) / max("total")).as("__floor"))
    val docToks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val scored = docToks
      .join(lm.select("token", "logp"), Seq("token"), "left")
      .crossJoin(broadcast(floorRow))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(coalesce(col("logp"), col("__floor"))).as("logp_mean"))
    // zero-token documents must survive with a null mean, not vanish
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logp_mean"))
  }
}
