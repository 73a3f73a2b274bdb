package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 32 — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche32): the text-ops family — token/char census, per-doc TF-IDF
  * and BM25 keywords, vocabulary coverage at the top-1000 cut, sentence
  * segmentation, KWIC extraction, Gopher n-gram repetition, the planted
  * line-repetition ratio, PII redaction, Church-Gale burstiness, and
  * the lang-ID confusion recall. */
class EdgeBranchSpec7 extends GoldenFixtures {

  private def docs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("text_stats pins the four token/char censuses") {
    val dir = tmp()
    docs(dir, Seq((1L, "Ab, c9 x!")))
    // golden_stats.py tranche32: 9 chars, 3 ws tokens, 6 BPE-ish
    // pieces (Ab|,|c|9|x|!), 2 punct.
    val r = one(OpsQueries.textStats(spark, dir))
    assert(r.getAs[Int]("len_chars") == 9)
    assert(r.getAs[Int]("n_ws_tokens") == 3)
    assert(r.getAs[Int]("n_bpe_tokens") == 6)
    assert(r.getAs[Int]("n_punct") == 2)
  }

  test("doc_keywords pins the tf-idf scores and zero-idf tail") {
    val dir = tmp()
    docs(dir, Seq((1L, "apple apple banana"), (2L, "banana cherry")))
    // banana is in every doc -> idf 0 -> score 0.0 but still ranked.
    val out = OpsQueries.docKeywords(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    assert(out == Map(
      (1L, 1L) -> ("apple", 1.386294), (1L, 2L) -> ("banana", 0.0),
      (2L, 1L) -> ("cherry", 0.693147), (2L, 2L) -> ("banana", 0.0)))
  }

  test("text_bm25 pins the per-document term scores") {
    val dir = tmp()
    docs(dir, Seq((1L, "aa aa bb"), (2L, "bb cc")))
    // golden_stats.py tranche32 bm25: saturated tf + length norm.
    val out = OpsQueries.textBm25(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Double]("score"))).toMap
    assert(out == Map(
      (1L, 1) -> ("aa", 0.902322), (1L, 2) -> ("bb", 0.168533),
      (2L, 1) -> ("cc", 0.754913), (2L, 2) -> ("bb", 0.198568)))
  }

  test("vocab_coverage pins the top-1000 cut boundary") {
    import spark.implicits._
    val dir = tmp()
    def tok(i: Int): String = {
      val a = ('a' + i / 676).toChar; val b = ('a' + i / 26 % 26).toChar
      val c = ('a' + i % 26).toChar; s"$a$b$c"
    }
    val common = (0 until 1000).map(tok).mkString(" ")
    docs(dir, Seq(
      (1L, common), (2L, common),
      (3L, s"${tok(0)} ${tok(1000)} ${tok(1001)}")))
    // token 0 appears 3x, tokens 1..999 2x -> exactly 1000 vocab
    // slots; the two singletons in doc 3 fall outside the cut.
    val out = OpsQueries.vocabCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    assert(out(1L) == ((1000L, 0L, 0.0)))
    assert(out(2L) == ((1000L, 0L, 0.0)))
    assert(out(3L) == ((3L, 2L, 0.666667)))
  }

  test("doc_sentences pins the run-split and trim parity") {
    val dir = tmp()
    docs(dir, Seq((1L, "One two. Three! four? five")))
    // golden_stats.py tranche32 sentences: lens 7/5/4/4.
    val r = one(OpsQueries.docSentences(spark, dir))
    assert(r.getAs[Long]("n_sentences") == 4L)
    assert(r.getAs[Double]("mean_len") == 5.0)
    assert(r.getAs[Long]("max_len") == 7L)
  }

  test("kwic_snippets pins the window clamp arithmetic") {
    val dir = tmp()
    val text = "x " * 20 + "vector and more text here for padding purposes"
    docs(dir, Seq((1L, text)))
    // golden_stats.py tranche32 kwic: pos 41, window starts at 11.
    val r = one(OpsQueries.kwicSnippets(spark, dir))
    assert(r.getAs[Long]("pos") == 41L)
    assert(r.getAs[String]("snippet") ==
      "x x x x x x x x x x x x x x x vector and more text here for paddin")
  }

  test("text_ngram_repetition pins the top-bigram and dup-trigram fracs") {
    val dir = tmp()
    docs(dir, Seq((1L, "a b a b a"), (2L, "x y z")))
    // d1: bigrams ab,ba,ab,ba (top 2/4); trigrams aba,bab,aba (dup
    // 2/3). d2 has no repeats.
    val out = OpsQueries.textNgramRepetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("top_bigram_frac"),
          r.getAs[Double]("dup_trigram_frac"))).toMap
    assert(out(1L) == ((4L, 0.5, 0.666667)))
    assert(out(2L) == ((2L, 0.5, 0.0)))
  }

  test("text_repetition pins the planted duplicate-line ratio") {
    val dir = tmp()
    docs(dir, Seq((1L, "z" * 80), (2L, "y" * 40 + "w" * 40)))
    // Even ids get their first 40 chars planted twice -> 3 lines, 2
    // distinct -> 1/3 (the tail must DIFFER from the plant, else all
    // three lines collapse to one distinct); odd ids stay single-line.
    val out = OpsQueries.textRepetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.333333))
  }

  test("text_redact pins the three scrub patterns") {
    val dir = tmp()
    docs(dir, Seq((7L, "hello world")))
    val r = one(OpsQueries.textRedact(spark, dir))
    assert(r.getAs[String]("redacted") ==
      "hello world contact <EMAIL> at <IP> or call <PHONE>.")
  }

  test("term_burstiness pins the cf/df ratio and the df gate") {
    val dir = tmp()
    docs(dir, (1L to 10L).map((_, "the the")) ++ (11L to 20L).map((_, "the")))
    // golden_stats.py tranche32 burstiness: cf 30 over df 20 = 1.5;
    // no other term reaches the df >= 20 support gate.
    val rows = OpsQueries.termBurstiness(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("term") == "the")
    assert(rows(0).getAs[Long]("df") == 20L)
    assert(rows(0).getAs[Long]("cf") == 30L)
    assert(rows(0).getAs[Double]("burstiness") == 1.5)
  }

  test("langid_confusion pins the per-language recall cells") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "en", "the cat and the dog"), (2L, "de", "der hund ist gut"),
      (3L, "en", "xyz qwerty"), (4L, "de", "le chat est la"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Same fixture as the kappa test: diagonal recall 5000 bp each,
    // off-diagonal rows carry null recall.
    val out = OpsQueries.langidConfusion(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_true"), r.getAs[String]("lang_pred")) ->
        (r.getAs[Long]("n"),
          Option(r.getAs[java.lang.Long]("recall_bp")).map(_.toLong))).toMap
    assert(out == Map(
      ("de", "de") -> (1L, Some(5000L)), ("de", "fr") -> (1L, None),
      ("en", "en") -> (1L, Some(5000L)), ("en", "und") -> (1L, None)))
  }
}
