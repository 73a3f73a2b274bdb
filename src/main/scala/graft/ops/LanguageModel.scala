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
    // Tokenize+explode is CPU-dense narrow work on a typically
    // single-split corpus scan — spread first (fanOut: no-op wide).
    val counts = graft.Tables.fanOut(df)
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

  /** Adjacent-token bigram array of the lowercased `[a-z]+` token
    * stream — a pure narrow expression (zip of the array with its own
    * tail), no positional self-join. Empty for texts with < 2 tokens. */
  def bigrams(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = tokens(c)
    when(size(t) >= 2,
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("a"), b.as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** Bigram model: (token_a, token_b, n, logp = ln(n / n_a)) for
    * bigrams with n ≥ `minCount`, where n_a counts ALL bigram starts of
    * token_a (kept or not) — a true conditional distribution P(b|a).
    * Same scale shape as [[unigramTable]]: one explode → (a, b)-keyed
    * count with partial aggregation; the per-start totals are a second
    * tiny aggregation over the count table itself (|vocab| rows, not
    * the corpus). */
  def bigramTable(df: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    val counts = graft.Tables.fanOut(df)
      .select(explode(bigrams(col(textCol))).as("bg"))
      .groupBy(col("bg.a").as("token_a"), col("bg.b").as("token_b"))
      .agg(count(lit(1)).as("n"))
    val starts = counts.groupBy("token_a").agg(sum("n").as("n_a"))
    counts
      .filter(col("n") >= minCount)
      .join(starts, Seq("token_a"))
      .select(col("token_a"), col("token_b"), col("n"),
        log(col("n") / col("n_a")).as("logp"))
  }

  /** Mean bigram log-probability per document under stupid backoff
    * (Brants et al. 2007): score(b|a) = logp(b|a) when the bigram is in
    * `bigramLm`, else ln(`backoff`) + the unigram score of b (OOV at
    * the unigram floor). Returns (idCol, n_bigrams, logp_mean); a
    * document with < 2 tokens survives with a null mean.
    *
    * Scale shape: bigram explode is narrow; both LM joins are
    * vocabulary-sized (Zipf-bounded — broadcastable, AQE decides); the
    * floor is the same in-plan single-row constant join as
    * [[scoreDocs]]. */
  def scoreDocsBigram(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bigramLm: DataFrame,
      unigramLm: DataFrame,
      backoff: Double = 0.4): DataFrame = {
    require(backoff > 0 && backoff <= 1, s"backoff must be in (0, 1], got $backoff")
    val floorRow = unigramLm.agg(log(lit(1.0) / max("total")).as("__floor"))
    val docBi = graft.Tables.fanOut(df)
      .select(col(idCol), explode(bigrams(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.a").as("token_a"), col("bg.b").as("token_b"))
    val scored = docBi
      .join(bigramLm.select(col("token_a"), col("token_b"), col("logp").as("__bg_logp")),
        Seq("token_a", "token_b"), "left")
      .join(unigramLm.select(col("token").as("token_b"), col("logp").as("__uni_logp")),
        Seq("token_b"), "left")
      .crossJoin(broadcast(floorRow))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(coalesce(col("__bg_logp"),
          lit(math.log(backoff)) + coalesce(col("__uni_logp"), col("__floor"))))
          .as("logp_mean"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("logp_mean"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    * every document under `lm` ([[scoreDocs]]), then split each
    * language into `buckets` equal-depth bands by model fit — bucket 1
    * is the best-fitting "head", the last bucket the worst-fitting
    * "tail" a pipeline typically drops. Returns
    * (idCol, langCol, logp_mean, bucket).
    *
    * The band ordering uses the ROUNDED mean log-prob (6 dp) with an id
    * tiebreak: a total order that both Spark and an external checker
    * compute identically — raw double means carry summation-order
    * jitter that could flip near-boundary assignments. Zero-token docs
    * (null mean) sort into the tail, nulls-last on both engines.
    *
    * Scale shape: [[scoreDocs]]' token-keyed aggregation, one id-keyed
    * join to re-attach the language, and a per-language ntile window —
    * the per-group sort is the honest cost of exact depth bands (the
    * approximate path at extreme scale: GK percentile cuts per
    * language, same output contract). */
  def perplexityBuckets(
      df: DataFrame,
      textCol: String,
      idCol: String,
      langCol: String,
      lm: DataFrame,
      buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "need at least two perplexity bands")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(langCol))
      .orderBy(round(col("logp_mean"), 6).desc_nulls_last, col(idCol))
    scoreDocs(df, textCol, idCol, lm)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
      .withColumn("bucket", ntile(buckets).over(w))
      .select(col(idCol), col(langCol),
        round(col("logp_mean"), 6).as("logp_mean"), col("bucket"))
  }

  /** The distributed inner loop of BPE TOKENIZER TRAINING (Sennrich et
    * al. 2016 §3.2): symbol-pair frequencies over the word-frequency
    * table. Words are the `[a-z]+` tokens; symbols are their characters
    * plus a `</w>` end-of-word marker; every adjacent symbol pair
    * contributes the word's corpus frequency (multiplicity included —
    * "aaa" carries (a,a) twice). The argmax row is the next merge; a
    * driver loop applying merges re-derives this table each round, and
    * THIS table is the part that must scale — it touches every token
    * occurrence.
    *
    * Scale shape: one explode → word-keyed count with partial
    * aggregation collapses the corpus to its Zipf-bounded vocabulary;
    * the pair explode then runs over |vocab| rows, not the corpus, and
    * the final (left, right) count is again partial-aggregable.
    * Character access is positional substring (no split-on-empty
    * semantics to disagree on across engines). Returns
    * (sym_a, sym_b, freq) sorted nowhere — consumers order. */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = graft.Tables.fanOut(df)
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wfreq"))
    words
      .select(col("word"), col("wfreq"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(
        col("word").substr(col("p"), lit(1)).as("sym_a"),
        when(col("p") < length(col("word")),
            col("word").substr(col("p") + 1, lit(1)))
          .otherwise(lit("</w>")).as("sym_b"),
        col("wfreq"))
      .groupBy("sym_a", "sym_b")
      .agg(sum("wfreq").as("freq"))
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
    val docToks = graft.Tables.fanOut(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
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
