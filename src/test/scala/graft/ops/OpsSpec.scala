package graft.ops

import graft.SparkSpec
import graft.eval.{AucEvaluation, RankingEvaluation, RegressionEvaluation}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ChronoSplit produces exact contiguous rank ranges") {
    val n = 1000
    val df = (0 until n).map { i =>
      // Scrambled insertion order, colliding timestamps (ties).
      val id = CollectiveALS_ids(i)
      (id, (id % 97).toDouble)
    }.toDF("id", "t")
    val Seq(a, b, c) = ChronoSplit.split(df, Seq(0.5, 0.3, 0.2), "t", "id")
    assert(a.count() == 500 && b.count() == 300 && c.count() == 200)
    // Order correctness: every (t, id) in a <= every (t, id) in b, etc.
    val maxA = a.select(max(struct(col("t"), col("id")))).head.getStruct(0)
    val minB = b.select(min(struct(col("t"), col("id")))).head.getStruct(0)
    val maxB = b.select(max(struct(col("t"), col("id")))).head.getStruct(0)
    val minC = c.select(min(struct(col("t"), col("id")))).head.getStruct(0)
    def le(x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row): Boolean =
      x.getDouble(0) < y.getDouble(0) ||
        (x.getDouble(0) == y.getDouble(0) && x.getLong(1) <= y.getLong(1))
    assert(le(maxA, minB) && le(maxB, minC))
    // Union recovers everything exactly once.
    assert(a.unionAll(b).unionAll(c).select("id").distinct().count() == n)
  }

  private def CollectiveALS_ids(i: Int): Long =
    graft.cmf.CollectiveALS.splitmix64(i.toLong) & 0xffffff

  test("Dedup.exact collapses duplicates to the min id") {
    val docs = Seq(
      (1L, "hello  world"), (2L, "Hello world"), (3L, "unique doc"),
      (4L, "hello world "), (5L, "another one")
    ).toDF("doc_id", "text")
    // normalization: lower + trim + collapse whitespace → 1,2,4 identical
    val out = Dedup.exact(docs, "text", "doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(r.fieldIndex("doc_id")) ->
      r.getLong(r.fieldIndex("n_copies"))).toMap
    assert(byId(1L) == 3 && byId(3L) == 1 && byId(5L) == 1)
    val kept = Dedup.exactKeep(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 5L))
  }

  test("TextAnalysis.bm25TopTerms ranks distinctive terms above corpus-wide ones") {
    val docs = Seq(
      (1L, "Zebra zebra zebra common word"),
      (2L, "common word common word filler2"),
      (3L, "common word filler3 stuff three"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.bm25TopTerms(docs, "text", "doc_id", k = 3).collect()
    // A null-text doc has no terms and produces no rows.
    assert(!rows.exists(_.getLong(0) == 4L))
    // At most k rows per doc, ranks contiguous from 1.
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ranks = rs.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.length) && ranks.length <= 3)
    }
    // Case-folded distinctive term wins its doc; a doc-unique term beats
    // terms present in every document (idf dominates equal-ish tf).
    val top1 = rows.filter(r => r.getLong(0) == 1L && r.getInt(3) == 1).head
    assert(top1.getString(1) == "zebra")
    val top2 = rows.filter(r => r.getLong(0) == 2L && r.getInt(3) == 1).head
    assert(top2.getString(1) == "filler2")
  }

  test("AucEvaluation computes the midrank per-user AUC") {
    val pred = Seq(
      (1L, 10L, 4.0), (1L, 11L, 3.0), (1L, 12L, 2.0), (1L, 13L, 1.0),
      (2L, 10L, 4.0), (2L, 11L, 3.0), (2L, 12L, 2.0), (2L, 13L, 1.0),
      (3L, 10L, 1.0), // all-positive user: no negatives → excluded
      (4L, 20L, 3.0), (4L, 21L, 3.0), // tied positive/negative pair
      (2L, 13L, 0.5) // duplicate pred (u,i): max-score dedup keeps 1.0
    ).toDF("u", "i", "score")
    // user 1's truth pair is duplicated: dedup must keep the AUC exact.
    val truth = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 13L),
      (3L, 10L), (4L, 20L)).toDF("u", "i")
    val r = AucEvaluation.evaluate(pred, truth, "u", "i", "score").head
    // user 1: positives hold asc-ranks {3,4} → (7 − 3)/(2·2) = 1.0
    // user 2: positive holds asc-rank 1 → (1 − 1)/(1·3) = 0.0
    //   (the duplicate (2,13,0.5) pred row must dedup to max=1.0, not
    //   rank as a fifth row — without dedup user 2's AUC would shift)
    // user 4: tied pair → midranks 1.5 each → (1.5 − 1)/(1·1) = 0.5
    assert(r.getLong(0) == 3 && r.getDouble(1) == 0.5, r.toString)
  }

  test("TextAnalysis.bm25TopTerms rejects non-numeric doc ids") {
    // ANSI on (Spark 4 default): the engine rejects the cast; ANSI off:
    // the coalesce guard raises. Either way an error, never a silent
    // merge of all bad ids into one null pseudo-document.
    val bad = Seq(("a1", "some text here"), ("a2", "other text")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.bm25TopTerms(bad, "text", "doc_id").collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("numeric") || chain.contains("CAST_INVALID_INPUT"), chain)
  }

  test("TextAnalysis columns compute expected values") {
    val df = Seq((1L, "The quick brown fox, it jumped! Over 2 dogs.")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
      TextAnalysis.punctCount(col("text")).as("punct"),
      TextAnalysis.stopwordCount(col("text")).as("stop"),
      TextAnalysis.langId(col("text")).as("lang")).head
    assert(r.getAs[Int]("ws") == 9)
    // tokens: The quick brown fox , it jumped ! Over 2 dogs . → 12
    assert(r.getAs[Int]("bpe") == 12)
    assert(r.getAs[Int]("punct") == 3) // , ! .
    assert(r.getAs[Int]("stop") == 2)  // the, it
    assert(r.getAs[String]("lang") == "en")
  }

  test("repetitionRatio and redactPii compute expected values") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a b c\na b c\nd e f"),          // 2 distinct of 3 lines
      (2L, "unique one\n\n  \nunique two"), // blanks ignored -> 0
      (3L, "x\nx\nx\nx"),                   // 1 distinct of 4
      (4L, ""),                             // empty: nothing repeats
      (5L, "  \n \n")                       // blank-only: nothing repeats
    ).toDF("id", "t")
      .select(col("id"), round(TextAnalysis.repetitionRatio(col("t")), 6).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 0.333333 && rows(2L) == 0.0 && rows(3L) == 0.75, rows)
    assert(rows(4L) == 0.0 && rows(5L) == 0.0, rows)
    val red = Seq("mail bob.smith+x@corp.io, host 10.0.0.1, tel 06 123 456 78, year 2024")
      .toDF("t").select(TextAnalysis.redactPii(col("t")))
      .head.getString(0)
    assert(red == "mail <EMAIL>, host <IP>, tel <PHONE>, year 2024", red)
  }

  test("RegressionEvaluation computes exact metrics") {
    val df = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 5.0), (4.0, 3.0))
      .toDF("label", "prediction")
    val m = RegressionEvaluation.evaluate(df, "label", "prediction").head
    // errors: 1, 0, 2, -1 → sse=6, sae=4, n=4
    assert(m.getAs[Long]("n") == 4)
    assert(math.abs(m.getAs[Double]("mse") - 1.5) < 1e-12)
    assert(math.abs(m.getAs[Double]("mae") - 1.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("rmse") - math.sqrt(1.5)) < 1e-12)
    // labels mean 2.5, sst = 5 → r2 = 1 - 6/5 = -0.2
    assert(math.abs(m.getAs[Double]("r2") - (-0.2)) < 1e-12)
  }

  test("RankingEvaluation matches hand-computed single-user example") {
    val pred = Seq((1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0))
      .toDF("u", "i", "score")
    val truth = Seq((1L, 10L), (1L, 30L)).toDF("u", "i")
    val m = RankingEvaluation.evaluate(pred, truth, "u", "i", "score", Seq(2)).head
    assert(math.abs(m.getAs[Double]("precision_at") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("recall_at") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("f1_at") - 0.5) < 1e-9)
    val idcg2 = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(m.getAs[Double]("ndcg_at") - 1.0 / idcg2) < 1e-9)
    assert(math.abs(m.getAs[Double]("map_at") - 0.5) < 1e-9)
  }

  test("winnowing fingerprint: shared substrings surface, density is bounded") {
    val k = 5
    val w = 4
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val a = "PREFIX ALPHA " + shared + " SUFFIX ONE"
    val b = "other start text " + shared + " different ending words"
    val c = "completely unrelated content zzz qqq xxx vvv kkk jjj mmm www"
    val fa = TextAnalysis.winnow(a, k, w).toSet
    val fb = TextAnalysis.winnow(b, k, w).toSet
    val fc = TextAnalysis.winnow(c, k, w).toSet
    // Guarantee: a shared substring of length >= w+k-1 yields >= 1 shared hash.
    assert(fa.intersect(fb).nonEmpty)
    // Unrelated text shares (essentially) nothing.
    assert(fa.intersect(fc).size <= 1)
    // Identical text -> identical fingerprint; whitespace/case-insensitive.
    assert(TextAnalysis.winnow(a, k, w) == TextAnalysis.winnow("  " + a.toUpperCase, k, w))
    // Density ~2/(w+1): selected hashes are a small fraction of all k-grams.
    assert(fa.size <= a.length - k + 1)
    assert(fa.size >= (a.length - k + 1) / (w * 3))
    // DataFrame wrapper keeps ids and produces array<bigint>.
    import spark.implicits._
    val df = TextAnalysis.winnowFingerprint(
      Seq((1L, a), (2L, b), (3L, "tiny")).toDF("doc_id", "text"), "text", "doc_id")
    assert(df.columns.toSeq == Seq("doc_id", "fp_winnow"))
    assert(df.schema("fp_winnow").dataType.simpleString == "array<bigint>")
    assert(df.count() == 3)
  }

  test("Multimodal frame sampling and resize keep the pipeline shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, length => strlen}
    val docs = Seq((1L, "a" * 300), (2L, "b" * 45), (3L, "")).toDF("doc_id", "text")
    val payloads = Multimodal.withPayload(docs, "doc_id", "text")

    val frames = Multimodal.sampleFrames(payloads, 4)
    // Fan-out respects the per-doc pseudo frame count, never exceeds n.
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.values.forall(c => c >= 1 && c <= 4), s"$perDoc")
    assert(frames.schema("frame").dataType.typeName == "binary")
    // Frames are deterministic: same input, same bytes.
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(key(frames) == key(Multimodal.sampleFrames(payloads, 4)))

    val resized = Multimodal.resize(payloads, 64, 64)
    assert(resized.count() == 3)
    val lens = resized.select(strlen(col("payload"))).collect().map(_.getInt(0)).toSet
    assert(lens == Set(64 * 64 / 64), s"$lens")
    val metas = resized.select(col("meta.width"), col("meta.height")).distinct().collect()
    assert(metas.length == 1 && metas(0).getLong(0) == 64 && metas(0).getLong(1) == 64)
    // Distinct inputs produce distinct digests.
    assert(resized.agg(countDistinct(col("payload"))).head.getLong(0) == 3)
  }

  test("RankingMetrics facade returns the same values as RankingEvaluation") {
    import spark.implicits._
    import graft.eval.{RankingEvaluation, RankingMetrics}
    val pred = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
      (2L, 10L, 0.5), (2L, 13L, 0.4))
      .toDF("u", "i", "score")
    val truth = Seq((1L, 10L), (1L, 12L), (2L, 13L)).toDF("u", "i")
    val ks = Seq(1, 3)
    val direct = RankingEvaluation.evaluate(pred, truth, "u", "i", "score", ks)
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Double]("precision_at"), r.getAs[Double]("ndcg_at"), r.getAs[Double]("map_at")))
      .toMap
    val m = RankingMetrics(pred, truth)
      .setUserCol("u").setItemCol("i").setPredictionCol("score").setRatingCol("ignored")
    val (ps, ns, as_) = (m.precisionAt(ks), m.ndcgAt(ks), m.mapAt(ks))
    ks.zipWithIndex.foreach { case (k, ix) =>
      assert(ps(ix) == direct(k)._1 && ns(ix) == direct(k)._2 && as_(ix) == direct(k)._3)
    }
  }

  test("SkewJoin.saltedJoin equals the plain join on a skewed key") {
    import spark.implicits._
    // 90% of fact rows hit one hot key.
    val facts = (0 until 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong)
    }.toDF("k", "payload")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("k", "label")
    for (joinType <- Seq("inner", "left")) {
      val plain = facts.join(dim, Seq("k"), joinType)
        .select("k", "payload", "label")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val salted = SkewJoin.saltedJoin(facts, dim, "k", 8, joinType)
        .select("k", "payload", "label")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(salted == plain, s"$joinType mismatch")
    }
  }

  test("Sketches.groupProfile tracks the exact profile within its bounds") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(6000) { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, rnd.nextInt(400).toLong, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("g", "uid", "v")
    val approx = Sketches.groupProfile(df, "g", "uid", "v", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Sketches.groupProfileExact(df, "g", "uid", "v", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == Set("a", "b"))
    for (g <- Seq("a", "b")) {
      val a = approx(g); val e = exact(g)
      assert(a.getLong(a.fieldIndex("n_rows")) == e.getLong(e.fieldIndex("n_rows_exact")))
      val ad = a.getLong(a.fieldIndex("approx_distinct")).toDouble
      val ed = e.getLong(e.fieldIndex("exact_distinct")).toDouble
      assert(math.abs(ad - ed) <= 0.05 * ed, s"HLL off by ${math.abs(ad - ed) / ed}")
      val ap = a.getSeq[Double](a.fieldIndex("approx_percentiles"))
      val ep = e.getSeq[Double](e.fieldIndex("exact_percentiles"))
      // GK rank error ≤ n/accuracy ≤ 1 rank here; on ~100 buckets of
      // uniform values that is well under 5 value units.
      ap.zip(ep).foreach { case (av, ev) =>
        assert(math.abs(av - ev) <= 5.0, s"percentile $av vs $ev")
      }
    }
  }

  test("LanguageModel: unigram logps, OOV floor, zero-token survival") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The THE the zz"),
      (3L, "1234 5678 !!")
    ).toDF("doc_id", "text")
    // tokens: doc1 = the,cat,sat,on,the,mat; doc2 = the,the,the,zz;
    // doc3 = none. counts: the=5, others=1 each; total=10.
    val lm = LanguageModel.unigramTable(docs, "text", minCount = 2L)
    val vocab = lm.collect()
    assert(vocab.length == 1)
    val row = vocab.head
    assert(row.getString(0) == "the" && row.getLong(1) == 5L && row.getLong(2) == 10L)
    assert(math.abs(row.getDouble(3) - math.log(0.5)) < 1e-12)

    val scores = LanguageModel.scoreDocs(docs, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r).toMap
    val floor = math.log(0.1)
    assert(scores(1L).getLong(1) == 6L)
    assert(math.abs(scores(1L).getDouble(2) -
      (2 * math.log(0.5) + 4 * floor) / 6) < 1e-12)
    assert(scores(2L).getLong(1) == 4L)
    assert(math.abs(scores(2L).getDouble(2) -
      (3 * math.log(0.5) + floor) / 4) < 1e-12)
    // zero-token doc survives with null mean, not dropped
    assert(scores(3L).getLong(1) == 0L && scores(3L).isNullAt(2))
  }

  test("LanguageModel bigrams: conditional logps, stupid backoff, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // bigrams (a,b)x2 (b,a)x2
      (4L, "b b"),       // bigram (b,b)x1 — below minCount, backs off
      (5L, "x")          // 1 token → no bigrams
    ).toDF("doc_id", "text")
    val bi = LanguageModel.bigramTable(docs, "text", minCount = 2L)
    val biMap = bi.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // starts: a→2, b→3 (2×(b,a) + 1×(b,b))
    assert(biMap.keySet == Set(("a", "b"), ("b", "a")))
    assert(biMap(("a", "b"))._1 == 2L && math.abs(biMap(("a", "b"))._2 - 0.0) < 1e-12)
    assert(math.abs(biMap(("b", "a"))._2 - math.log(2.0 / 3.0)) < 1e-12)

    val uni = LanguageModel.unigramTable(docs, "text", minCount = 1L)
    // unigram counts: a=3, b=4, x=1, total=8
    val scores = LanguageModel.scoreDocsBigram(docs, "text", "doc_id", bi, uni)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(scores(1L).getLong(1) == 4L)
    assert(math.abs(scores(1L).getDouble(2) - math.log(2.0 / 3.0) / 2) < 1e-12)
    assert(scores(4L).getLong(1) == 1L)
    assert(math.abs(scores(4L).getDouble(2) -
      (math.log(0.4) + math.log(0.5))) < 1e-12)
    assert(scores(5L).getLong(1) == 0L && scores(5L).isNullAt(2))
  }

  test("Chunking.slidingWindows: overlap, tail suppression, empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a  b \n c"),                              // 3 tokens, messy ws
      (3L, "   ")                                     // 0 tokens
    ).toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "text", "doc_id", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc1: starts 0,3,6,9; start 9 suppressed (9+1 >= 10: window 6 already
    // reached the end... check: keep iff s+1 < 10 → 9 dropped)
    val d1 = out.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted
    assert(d1 == Seq(0L, 1L, 2L), s"doc1 chunk idxs $d1")
    assert(out((1L, 0L)).getString(3) == "w1 w2 w3 w4")
    assert(out((1L, 1L)).getString(3) == "w4 w5 w6 w7")   // 1-token overlap
    assert(out((1L, 2L)).getString(3) == "w7 w8 w9 w10")
    assert(out((1L, 2L)).getLong(2) == 4L)
    // doc2: single window covers all 3 tokens, whitespace normalized
    assert(out((2L, 0L)).getString(3) == "a b c" && out((2L, 0L)).getLong(2) == 3L)
    assert(!out.keySet.exists(_._1 == 3L), "zero-token doc must yield no chunks")
    // every token of doc1 appears in at least one chunk
    val covered = out.filter(_._1._1 == 1L).values
      .flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("Chunking.contentDefined: chunks tile the doc; boundaries survive a prefix edit") {
    import spark.implicits._
    val text = (1 to 120).map(i => s"tok$i").mkString(" ") // ~600 chars
    val docs = Seq((1L, text), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val out = Chunking.contentDefined(docs, "text", "doc_id", k = 20, selPrefix = "0")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap

    // Tiling: per doc, chunks are contiguous from 1 and sum to the length.
    val d1 = out.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2).map(_._2)
    assert(d1.nonEmpty)
    assert(d1.head._1 == 1L)
    d1.sliding(2).foreach {
      case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 == s2)
      case _ =>
    }
    assert(d1.map(_._2).sum == text.length)
    // A doc shorter than k is one whole-document chunk; empty → none.
    assert(out((2L, 0L)) == ((1L, 5L, out((2L, 0L))._3)))
    assert(!out.keySet.exists(_._1 == 3L))

    // THE content-defined property: prepend a byte — fixed-size chunking
    // would shift every boundary; CDC boundaries re-align, so the chunk
    // md5 multiset changes by only O(1) chunks at the edit site.
    val edited = Seq((1L, "X " + text)).toDF("doc_id", "text")
    val beforeMd5 = d1.map(_._3)
    val afterMd5 = Chunking.contentDefined(edited, "text", "doc_id", 20, "0")
      .collect().sortBy(_.getLong(1)).map(_.getString(4)).toSeq
    val shared = beforeMd5.intersect(afterMd5)
    assert(shared.size >= beforeMd5.size - 2,
      s"only ${shared.size}/${beforeMd5.size} chunks survived a 2-char prefix edit")
  }

  test("TextAnalysis.noveltyProfile: shared phrases lower novelty; short docs null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),      // shingles: abcde, bcdef
      (2L, "a b c d e zz"),     // shares abcde with doc1
      (3L, "p q r s t"),        // unique single shingle
      (4L, "too short")         // < 5 tokens → no shingles
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyProfile(docs, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 2L && got(1L).getLong(2) == 1L)
    assert(math.abs(got(1L).getDouble(3) - 0.5) < 1e-9)
    assert(got(2L).getLong(2) == 1L)
    assert(got(3L).getLong(1) == 1L && got(3L).getLong(2) == 0L &&
      got(3L).getDouble(3) == 1.0)
    assert(got(4L).getLong(1) == 0L && got(4L).isNullAt(3))
  }

  test("TextAnalysis.bm25Search ranks matching docs, skips non-matching") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"), (2L, "x"), (3L, "z only")
    ).toDF("doc_id", "text")
    val hits = TextAnalysis.bm25Search(docs, "text", "doc_id",
        query = Seq("X", "y"), k = 10) // query terms lowercase-normalized
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(1)))
    assert(hits.map(_._1).toSeq == Seq(1L, 2L), "only matching docs, best first")
    assert(hits.head._2 == 2L && hits(1)._2 == 1L, "terms-hit counts")
    assert(hits.head._3 > hits(1)._3, "two-term match outranks one-term")
  }

  test("TextAnalysis.invertedIndex: sorted postings, per-doc distinct, df cap") {
    import spark.implicits._
    val docs = Seq(
      (3L, "apple banana apple"), // intra-doc repeat → one posting
      (1L, "banana cherry"),
      (2L, "apple")
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "text", "doc_id", maxDf = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // banana df=2 → postings "1,3" (sorted); cherry df=1 → "1";
    // apple df=2 → "2,3"; nothing exceeds the cap here
    assert(idx == Map("apple" -> (2L, "2,3"), "banana" -> (2L, "1,3"),
      "cherry" -> (1L, "1")))
    // cap drops hot tokens entirely
    val capped = TextAnalysis.invertedIndex(docs, "text", "doc_id", maxDf = 1)
      .collect().map(_.getString(0)).toSet
    assert(capped == Set("cherry"))
  }

  test("Dedup.keepRepresentativesBy elects by order, singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.9), // cluster {1,2,3}: best q=0.9, tie → id 2
      (4L, 0.1),                       // singleton — survives at any quality
      (5L, 0.5), (6L, 0.8)             // cluster {5,6}: id 6 wins
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val kept = Dedup.keepRepresentativesBy(docs, pairs, "doc_id", "a", "b",
        Seq(col("q").desc, col("doc_id")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("TextAnalysis.ngramRepetition: concentrations exact, short docs null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),  // bigrams: (a,b)x3 (b,a)x2 → top 3/5; trigrams: aba x2, bab x2 → dup 4/4
      (2L, "x y z"),        // bigrams xy, yz (top 1/2); trigram xyz once (dup 0/1)
      (3L, "solo"),         // 1 token → no windows
      (4L, "")              // no tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 5L)
    assert(math.abs(got(1L).getDouble(2) - 0.6) < 1e-12)
    assert(math.abs(got(1L).getDouble(3) - 1.0) < 1e-12)
    assert(got(2L).getLong(1) == 2L)
    assert(math.abs(got(2L).getDouble(2) - 0.5) < 1e-12)
    assert(got(2L).getDouble(3) == 0.0)
    assert(got(3L).getLong(1) == 0L && got(3L).isNullAt(2) && got(3L).isNullAt(3))
    assert(got(4L).getLong(1) == 0L && got(4L).isNullAt(2))
  }

  test("ChronoSplit.splitPerGroup keeps every user in both slices, time-ordered") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 50).flatMap { u =>
      (0 until 10 + rnd.nextInt(20)).map(i => (u.toLong, i.toLong * 100 + u, u * 1000L + i))
    }.toDF("user", "t", "id")
    val Seq(train, test) =
      ChronoSplit.splitPerGroup(df, "user", Seq(0.8, 0.2), "t", "id")
    assert(train.count() + test.count() == df.count(), "slices partition the rows")
    // every user appears in both slices (the point of the per-group cut)
    assert(train.select("user").distinct().count() == 50)
    assert(test.select("user").distinct().count() == 50)
    // within each user, max train time <= min test time
    val maxTrain = train.groupBy("user").agg(max("t").as("mt"))
    val minTest = test.groupBy("user").agg(min("t").as("nt"))
    assert(maxTrain.join(minTest, "user").filter(col("mt") > col("nt")).count() == 0)
  }

  test("Sketches.histogram: exact bin edges, top edge closed, constant group") {
    import spark.implicits._
    val df = ((0 to 10).map(i => ("a", i.toDouble)) ++
      Seq.fill(3)(("c", 5.0))).toDF("g", "value")
    val got = Sketches.histogram(df, "g", "value", bins = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a: values 0..10 over range [0,10] → one per bin, 10 lands in bin 9
    assert((0 to 8).forall(b => got(("a", b)) == 1L))
    assert(got(("a", 9)) == 2L, "top edge must close into the last bin")
    // constant group: zero-width range → everything in bin 0
    assert(got(("c", 0)) == 3L)
  }

  test("CorpusWriter: sized writes hit the file-count target; partitioned prunes") {
    import spark.implicits._
    import graft.sources.CorpusWriter
    val df = (0 until 1000).map(i => (i.toLong, s"lang${i % 3}", s"body $i"))
      .toDF("id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_writer")
    val files = CorpusWriter.writeSized(df, s"$dir/sized", rowsPerFile = 300)
    assert(files == 4)
    val parts = new java.io.File(s"$dir/sized").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 4, s"expected 4 part files, found $parts")
    assert(spark.read.parquet(s"$dir/sized").count() == 1000)

    CorpusWriter.writePartitioned(df, s"$dir/bylang", Seq("lang"))
    val dirs = new java.io.File(s"$dir/bylang").listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=lang0", "lang=lang1", "lang=lang2"))
    // partition pruning must reach the scan
    val one = spark.read.parquet(s"$dir/bylang").filter(col("lang") === "lang1")
    assert(one.count() == 333 || one.count() == 334)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(1500))
  }

  test("Numeric.winsorize clips to its own group's quantiles, keeps rows") {
    import spark.implicits._
    // group a: 1..100 → P5=5.95, P95=95.05 (linear interpolation);
    // group b constant → clip is the identity.
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(_ => ("b", 7.0))).toDF("g", "value")
    val out = Numeric.winsorize(df, Seq("g"), "value", 0.05, 0.95)
    assert(out.count() == 110, "winsorize must keep every row")
    val a = out.filter(col("g") === "a").select("value", "value_w")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(a(1.0) - 5.95) < 1e-9 && math.abs(a(100.0) - 95.05) < 1e-9)
    assert(a(50.0) == 50.0, "interior values pass through")
    val b = out.filter(col("g") === "b").select("value_w")
      .collect().map(_.getDouble(0)).distinct
    assert(b.toSeq == Seq(7.0))
  }

  test("Numeric.standardize z-scores per group; zero-variance groups go null") {
    import spark.implicits._
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)) ++
      Seq.fill(4)(("b", 9.0))).toDF("g", "value")
    val out = Numeric.standardize(df, Seq("g"), "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // group a: mean 2, sample sd 1 → z = v - 2
    assert(out(("a", 1.0)).exists(z => math.abs(z + 1.0) < 1e-12))
    assert(out(("a", 3.0)).exists(z => math.abs(z - 1.0) < 1e-12))
    // constant group: undefined z, surfaced as null (never a silent 0)
    assert(out(("b", 9.0)).isEmpty)
  }

  test("Upsert.latestWins keeps exactly the newest row per key") {
    import spark.implicits._
    val log = Seq(
      ("k1", 1L, 10L, "old"), ("k1", 3L, 11L, "new"), ("k1", 2L, 12L, "mid"),
      ("k2", 5L, 13L, "only"),
      ("k3", 7L, 14L, "tie-lo"), ("k3", 7L, 15L, "tie-hi") // version tie → id wins
    ).toDF("k", "version", "seq", "payload")
    val got = Upsert.latestWins(log, Seq("k"), "version", Seq("seq"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(got == Map("k1" -> (3L, "new"), "k2" -> (5L, "only"),
      "k3" -> (7L, "tie-hi")))
  }

  test("Upsert.applyChanges: delete removes, upsert replaces/inserts, base passes through") {
    import spark.implicits._
    val base = Seq(
      ("k1", 10L, "b1"), ("k2", 11L, "b2"), ("k3", 12L, "b3")
    ).toDF("k", "ver", "payload")
    val changes = Seq(
      ("k1", 20L, "c1-old", "upsert"),   // superseded by the k1@21 revision
      ("k1", 21L, "c1-new", "upsert"),   // update of existing key
      ("k2", 22L, "unused", "delete"),   // delete of existing key
      ("k4", 23L, "c4", "upsert"),       // insert of new key
      ("k5", 24L, "unused", "delete")    // delete of absent key → no-op
    ).toDF("k", "ver", "payload", "op")
    val got = Upsert.applyChanges(base, changes, Seq("k"), "op", "ver")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == Map(
      "k1" -> (21L, "c1-new"), "k3" -> (12L, "b3"), "k4" -> (23L, "c4")))
  }

  test("Upsert.applyChanges rejects a changes side missing base columns") {
    import spark.implicits._
    val base = Seq(("k1", 1L)).toDF("k", "v")
    val changes = Seq(("k1", "upsert")).toDF("k", "op") // lacks v
    intercept[IllegalArgumentException] {
      Upsert.applyChanges(base, changes, Seq("k"), "op", "v")
    }
  }

  test("ChronoSplit.rollingOrigin: expanding train, contiguous test, no leak") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i * 1000000L))
      .toDF("id", "us")
      .withColumn("t", timestamp_micros(col("us")))
    val folds = ChronoSplit.rollingOrigin(df, "t", folds = 3)
      .select("fold", "role", "us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    for (f <- 1L to 3L) {
      val train = folds.collect { case (`f`, "train", us) => us }
      val test = folds.collect { case (`f`, "test", us) => us }
      assert(train.nonEmpty && test.nonEmpty, s"fold $f empty side")
      assert(train.max < test.min, s"fold $f leaks: ${train.max} >= ${test.min}")
    }
    // Expanding window: each fold's train strictly extends the previous.
    val trainMax = (1L to 3L).map(f =>
      folds.collect { case (`f`, "train", us) => us }.max)
    assert(trainMax == trainMax.sorted && trainMax.distinct.length == 3)
    // Fold i's test range ends where fold i+1's train ends.
    for (f <- 1L to 2L)
      assert(folds.collect { case (`f`, "test", us) => us }.max ==
        folds.collect { case (x, "train", us) if x == f + 1 => us }.max)
  }

  test("Numeric.quantileBins fits breaks on the train slice only") {
    import spark.implicits._
    // Train rows 0..99; test rows carry huge values that MUST NOT move
    // the breaks (the leakage this operator exists to prevent).
    val df = ((0 until 100).map(i => (i.toLong, i.toDouble, true)) ++
      Seq((1000L, 1e9, false), (1001L, 2e9, false)))
      .toDF("id", "v", "is_train")
    val out = Numeric.quantileBins(df, "v", col("is_train"), Seq(0.25, 0.5, 0.75))
    val bins = out.select("id", "bin").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bins(0L) == 0 && bins(30L) == 1 && bins(60L) == 2 && bins(99L) == 3)
    assert(bins(1000L) == 3 && bins(1001L) == 3,
      "test outliers land in the top bin without widening it")
    val breaks = out.select("__breaks").head().getSeq[Double](0)
    assert(breaks.max < 100.0, s"breaks leaked test values: $breaks")
  }

  test("Decontaminate.semanticContaminated flags cosine hits, drops zero vectors") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos 1.0 vs eval[0] → hit
      (2L, Array(0.8f, 0.6f)),   // cos 0.8 vs eval[0] → hit at 0.75
      (3L, Array(0.0f, 1.0f)),   // cos 0 → no hit
      (4L, Array(0.0f, 0.0f))    // zero norm → dropped, never NaN-hit
    ).toDF("vec_id", "embedding")
    val eval = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("embedding")
    val got = Decontaminate.semanticContaminated(
        corpus, "vec_id", "embedding", eval, "embedding", 0.75)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 1L && math.abs(got(1L)._2 - 1.0) < 1e-12)
    assert(math.abs(got(2L)._2 - 0.8) < 1e-6)
  }

  test("Sampling.rankBand keeps the exact integer rank band per stratum") {
    import spark.implicits._
    // stratum a: 10 rows scores 1..10; stratum b: 5 rows scores 1..5
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 5).map(i => ("b", i)))
      .toDF("g", "score")
    val kept = Sampling.rankBand(df, Seq(col("g")),
        Seq(col("score")), loNumer = 1, hiNumer = 9, denom = 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // a: keep rn in (1, 9] → scores 2..9; b: rn*10 > 5 → rn >= 1? no:
    // rn*10 > 1*5 → rn > 0.5 → all; rn*10 <= 9*5=45 → rn <= 4 → scores 1..4
    assert(kept == ((2 to 9).map(("a", _)) ++ (1 to 4).map(("b", _))).toSet)
    // degenerate band keeps nothing
    assert(Sampling.rankBand(df, Seq(col("g")), Seq(col("score")), 0, 0, 10)
      .count() == 0)
  }

  test("Sampling.deterministicShuffle is a stable 1-based total order") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"row$i")).toDF("id", "payload")
    val hash = pmod(col("id") * 2654435761L + 42L, lit(1000003L))
    val out = Sampling.deterministicShuffle(df, hash, "id")
      .select("position", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 1000L), "positions are 1..n exactly")
    // position order must equal (hash, id) order computed independently
    val expect = (0L until 1000L)
      .sortBy(i => ((i * 2654435761L + 42L) % 1000003L + 1000003L) % 1000003L)
    assert(out.map(_._2).toSeq == expect, "order matches the hash sort")
    // reruns agree (stability)
    val again = Sampling.deterministicShuffle(df, hash, "id")
      .select("position", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2).toSeq
    assert(again == out.map(_._2).toSeq)
  }

  test("Sketches.heavyHitters is exact at ceil(phi*N) across partitionings") {
    // Skewed stream: hot1=3000, hot2=1500, warm=900 (just under the
    // phi=0.1 threshold of 1000), and 4600 singleton-ish rare items.
    val rows = Seq.fill(3000)("hot1") ++ Seq.fill(1500)("hot2") ++
      Seq.fill(900)("warm") ++ (0 until 4600).map(i => s"rare$i")
    // Adversarial spread: scrambled order, many partitions — the
    // per-partition MG summaries must still union to a no-false-negative
    // candidate set (weighted pigeonhole), and verification makes the
    // final answer exact regardless of the partitioning.
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.sortBy(x => scala.util.hashing.MurmurHash3.stringHash(x))
        .toDF("item").repartition(parts)
      val got = Sketches.heavyHitters(df, "item", phi = 0.1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("hot1" -> 3000L, "hot2" -> 1500L),
        s"exact heavy hitters at $parts partitions")
    }
    // Boundary: phi small enough that warm crosses ceil(phi*N)=900 — the
    // >= threshold must include it exactly at the boundary.
    val df = rows.toDF("item")
    val loose = Sketches.heavyHitters(df, "item", phi = 0.09)
      .collect().map(_.getString(0)).toSet
    assert(loose == Set("hot1", "hot2", "warm"))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, "item", 1.0))
  }

  test("LanguageModel.bpePairCounts weights pairs by word frequency") {
    // words: aaa x2, bb x1, ab x1 →
    //   (a,a)   2 per "aaa" x 2 occurrences = 4
    //   (a,</w>) 1 per "aaa" x 2            = 2
    //   (b,b)   1; (b,</w>) from bb and ab  = 2; (a,b) 1
    val df = Seq("aaa bb", "aaa ab").toDF("text")
    val got = LanguageModel.bpePairCounts(df, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("a", "a") -> 4L, ("a", "</w>") -> 2L, ("b", "b") -> 1L,
      ("b", "</w>") -> 2L, ("a", "b") -> 1L))
    // Non-letter chars never leak in: symbols come from [a-z]+ tokens only.
    val sym = LanguageModel.bpePairCounts(Seq("x9y z!").toDF("text"), "text")
      .collect().flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(sym == Set("x", "y", "z", "</w>"))
  }

  test("LanguageModel.perplexityBuckets bands per language, nulls to tail") {
    // lang A: three docs whose unigram fit strictly decreases (repeats
    // of common tokens score higher than rare-token docs); lang B gets
    // its own independent bands; an empty doc lands in A's tail.
    val docs = Seq(
      (1L, "A", "aa aa aa aa aa aa"),   // all common → best fit
      (2L, "A", "aa aa bb bb"),
      (3L, "A", "cc dd ee ff"),         // all rare → worst fit
      (4L, "A", ""),                    // null mean → tail, nulls last
      (5L, "B", "aa aa aa"),
      (6L, "B", "bb cc dd"),
      (7L, "B", "ee ff gg hh")
    ).toDF("doc_id", "lang", "text")
    val lm = LanguageModel.unigramTable(docs, "text", minCount = 1L)
    val got = LanguageModel
      .perplexityBuckets(docs, "text", "doc_id", "lang", lm, buckets = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(got(1L) == (("A", 1)) && got(2L) == (("A", 1)))
    assert(got(3L) == (("A", 2)))
    assert(got(4L) == (("A", 3)), "zero-token doc must band into the tail")
    assert(got(5L) == (("B", 1)) && got(6L) == (("B", 2)) && got(7L) == (("B", 3)))
  }

  test("TextAnalysis.tfidfSearch: hand-computed cosine, zero-idf dropped") {
    val docs = Seq(
      (1L, "apple banana apple common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry cherry common")
    ).toDF("doc_id", "text")
    val ln3 = math.log(3.0); val lnh = math.log(1.5)
    // weights: d1 {apple 2·ln3, banana ln1.5}, d2 {banana ln1.5,
    // cherry ln1.5}, d3 {cherry 3·ln1.5}; "common" has idf 0 everywhere.
    val qnorm = math.sqrt(ln3 * ln3 + lnh * lnh)
    val n1 = math.sqrt(4 * ln3 * ln3 + lnh * lnh)
    val n2 = math.sqrt(2 * lnh * lnh)
    val exp1 = (2 * ln3 * ln3 + lnh * lnh) / (n1 * qnorm)
    val exp2 = (lnh * lnh) / (n2 * qnorm)
    val got = TextAnalysis
      .tfidfSearch(docs, "text", "doc_id", Seq("apple", "banana"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L), "docs without query terms are absent")
    assert(math.abs(got(1L)._1 - exp1) < 1e-6 && got(1L)._2 == 2L)
    assert(math.abs(got(2L)._1 - exp2) < 1e-6 && got(2L)._2 == 1L)
    // a query of only zero-idf terms returns empty, not 0/0 scores
    assert(TextAnalysis.tfidfSearch(docs, "text", "doc_id",
      Seq("common"), k = 10).count() == 0)
  }

  test("Integrity checksums: order-invariant, change-sensitive, localizing") {
    val rows = (1L to 500L).map(i => (i, s"text$i", if (i % 7 == 0) null else "en"))
    val df = rows.toDF("id", "t", "lang")
    def sum1(d: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(d, Seq("id", "t", "lang")).head
    val base = sum1(df)
    // invariant under partitioning and order
    assert(sum1(df.repartition(17)) == base)
    assert(sum1(df.orderBy(desc("t"))) == base)
    // a single changed value flips it; a swapped pair of rows does not
    val mutated = rows.updated(250, (251L, "TEXT251", "en")).toDF("id", "t", "lang")
    assert(sum1(mutated).getLong(1) != base.getLong(1))
    assert(sum1(rows.reverse.toDF("id", "t", "lang")) == base)
    // group checksums localize the difference
    val g = Integrity.groupChecksum(df, Seq("lang"), Seq("id", "t", "lang"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    val g2 = Integrity.groupChecksum(mutated, Seq("lang"), Seq("id", "t", "lang"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(g(None) == g2(None) && g(Some("en")) != g2(Some("en")))
  }

  test("PageRank: mass conserved, regular graphs uniform, hubs rank higher") {
    // 6-ring (2-regular, symmetric): uniform is stationary → exactly 1/6
    val ring = (0L until 6L).flatMap(i =>
      Seq((i, (i + 1) % 6), ((i + 1) % 6, i))).toDF("s", "t")
    val rp = PageRank.run(ring, "s", "t", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rp.size == 6 && rp.values.forall(p => math.abs(p - 1.0 / 6) < 1e-12))
    // star (center 0, leaves 1..4, symmetrized): center outranks leaves,
    // total mass stays 1 (no dangling nodes in a symmetric graph)
    val star = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("s", "t")
    val sp = PageRank.run(star, "s", "t", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sp.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
    assert((1L to 4L).forall(i => sp(0L) > sp(i) * 2), "hub dominates leaves")
    intercept[IllegalArgumentException](
      PageRank.run(ring, "s", "t", iterations = 0))
  }

  test("Triangles: K4 complete, cycles/wedges empty, shared edge counts twice") {
    // K4 oriented s < t: every vertex sits on C(3,2) = 3 triangles.
    val k4 = (for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)).toDF("s", "t")
    val got = Triangles.perVertex(k4, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 3L).map(_ -> 3L).toMap, s"got $got")
    // A 4-cycle and a wedge have no triangles → empty result.
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("s", "t")
    assert(Triangles.perVertex(c4, "s", "t").count() == 0)
    val wedge = Seq((0L, 1L), (1L, 2L)).toDF("s", "t")
    assert(Triangles.perVertex(wedge, "s", "t").count() == 0)
    // Two triangles sharing edge (2,3): shared vertices count 2, outer 1.
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("s", "t")
    val bt = Triangles.perVertex(bowtie, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bt == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), s"got $bt")
  }

  test("Triangles.localClustering: cliques score 1, stars 0, bridges between") {
    val k4 = (for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)).toDF("s", "t")
    val cc = Triangles.localClustering(k4, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cc == (0L to 3L).map(_ -> 1.0).toMap, s"got $cc")
    // Star: center has degree 4 but no neighbor-neighbor edge → 0;
    // leaves have degree 1 → excluded.
    val star = (1L to 4L).map(i => (0L, i)).toDF("s", "t")
    val sc = Triangles.localClustering(star, "s", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(sc == Map(0L -> ((4L, 0.0))), s"got $sc")
    // Triangle + pendant at vertex 2: deg 3, one of C(3,2)=3 pairs closed.
    val pend = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("s", "t")
    val pc = Triangles.localClustering(pend, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(pc(2L) == math.rint(1.0 / 3 * 1e6) / 1e6 && pc(0L) == 1.0, s"got $pc")
  }

  test("Intervals.coalesce merges overlap and touch, splits gaps, isolates keys") {
    val iv = Seq(
      ("u", 0L, 10L), ("u", 5L, 20L),   // overlap → one island
      ("u", 20L, 30L),                  // touch (s == prev max) → merges
      ("u", 40L, 50L),                  // gap → new island
      ("v", 0L, 100L), ("v", 10L, 20L), // containment → one island
      ("w", 7L, 8L))                    // singleton key
      .toDF("k", "s", "e")
    val got = Intervals.coalesce(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("u", 0L, 30L, 3L), ("u", 40L, 50L, 1L),
      ("v", 0L, 100L, 2L), ("w", 7L, 8L, 1L)), s"got $got")
  }

  test("Upsert.scd2 chains validity intervals; exactly one current row per key") {
    val log = Seq(
      ("k1", 10L, 1L), ("k1", 20L, 2L), ("k1", 20L, 3L), // version tie → event order
      ("k2", 5L, 4L))
      .toDF("k", "ver", "seq")
    val got = Upsert.scd2(log, Seq("k"), "ver", Seq("seq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toSet
    assert(got == Set(
      ("k1", 1L, 10L, Some(20L), false),
      ("k1", 2L, 20L, Some(20L), false), // tie: interval is empty, not current
      ("k1", 3L, 20L, None, true),
      ("k2", 4L, 5L, None, true)), s"got $got")
  }

  test("Snapshot.diff classifies membership and content changes; unchanged absent") {
    val oldG = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "x", "y")
    val newG = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L)).toDF("id", "x", "y")
    val got = Snapshot.diff(oldG, newG, Seq("id"), Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"), s"got $got")
  }

  test("Cooccur.pairs computes lift; basket cap and minCount bound the pair space") {
    // 4 baskets: {A,B} twice, {A,B,C} once, {D} once → AB in 3, AC/BC in 1.
    val rows = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"), (4L, "D"), (4L, "D")) // dup row collapses
      .toDF("basket", "item")
    val got = Cooccur.pairs(rows, "basket", "item", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // lift(A,B) = 3 · 4 / (3 · 3) = 4/3, minCount drops AC/BC (n_ab = 1)
    assert(got.toSeq == Seq(("A", "B", 3L, math.rint(4.0 / 3 * 1e6) / 1e6)), s"got ${got.toSeq}")
    // A degenerate basket above the cap contributes no pairs at all.
    val degen = (1 to 50).map(i => (9L, s"i$i")) ++ Seq((10L, "i1"), (10L, "i2"))
    val capped = Cooccur.pairs(degen.toDF("basket", "item"), "basket", "item",
      minCount = 1, maxBasketSize = 10)
    assert(capped.count() == 1, "only the small basket's pair survives the cap")
  }

  test("Drift.ks: identical samples 0, disjoint 1, known mixed value exact") {
    // Identical samples: CDFs coincide at every point.
    val same = Seq(1.0, 2.0, 3.0).flatMap(v => Seq(("g", v, 0), ("g", v, 1)))
      .toDF("grp", "v", "side")
    assert(Drift.ks(same, "grp", "v", "side").collect().head.getDouble(3) == 0.0)
    // Disjoint supports: KS = 1 where a's support ends.
    val disj = (Seq(1.0, 2.0).map(("g", _, 0)) ++ Seq(5.0, 6.0).map(("g", _, 1)))
      .toDF("grp", "v", "side")
    assert(Drift.ks(disj, "grp", "v", "side").collect().head.getDouble(3) == 1.0)
    // a = {1, 3}, b = {2, 3, 4}: sup at v=1 → |1/2 − 0/3| = 0.5; and the
    // counts land in n_a/n_b.
    val mix = (Seq(1.0, 3.0).map(("g", _, 0)) ++ Seq(2.0, 3.0, 4.0).map(("g", _, 1)))
      .toDF("grp", "v", "side")
    val r = Drift.ks(mix, "grp", "v", "side").collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((2L, 3L, 0.5)), s"got $r")
  }

  test("Drift.psi: equal-n identical samples 0, shifted distribution positive") {
    val same = (1 to 100).flatMap(i => Seq(("g", i.toDouble, 0), ("g", i.toDouble, 1)))
      .toDF("grp", "v", "side")
    assert(Drift.psi(same, "grp", "v", "side").collect().head.getDouble(1) == 0.0)
    // b shifted hard right: most mass changes bins → psi well above the
    // conventional 0.25 "significant drift" bar. Empty-middle-bin grid
    // rows contribute their (finite, smoothed) terms on both sides.
    val shift = ((1 to 100).map(i => ("g", i / 100.0, 0)) ++
      (1 to 100).map(i => ("g", 9.0 + i / 100.0, 1))).toDF("grp", "v", "side")
    val p = Drift.psi(shift, "grp", "v", "side").collect().head.getDouble(1)
    assert(p > 2.0, s"psi $p")
    // A constant group degenerates to one bin and stays finite.
    val const = Seq(("g", 7.0, 0), ("g", 7.0, 1)).toDF("grp", "v", "side")
    assert(Drift.psi(const, "grp", "v", "side").collect().head.getDouble(1) == 0.0)
  }

  test("Cooccur.jaccardBySharedItems: exact Jaccard on capped space, hot items dropped") {
    // u1 = {a,b,c}, u2 = {b,c,d}, u3 = {x}; shared(u1,u2) = {b,c} → 2/4.
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "b"), (2L, "c"), (2L, "d"), (3L, "x"))
      .toDF("u", "i")
    val got = Cooccur.jaccardBySharedItems(rows, "u", "i", maxItemDf = 10, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 0.5)), s"got ${got.toSeq}")
    // An item held by everyone is capped out: pairs must re-qualify
    // through the remaining items, and sizes shrink with the cap.
    val hot = rows.unionAll(Seq((1L, "h"), (2L, "h"), (3L, "h")).toDF("u", "i"))
    val capped = Cooccur.jaccardBySharedItems(hot, "u", "i", maxItemDf = 2, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(capped.toSeq == Seq((1L, 2L, 2L, 0.5)), s"got ${capped.toSeq}")
  }

  test("Debounce.flag keeps firsts and slow repeats, drops bursts per key") {
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000)
    val rows = Seq(
      ("u1", "click", 1L, ts(0L)),
      ("u1", "click", 2L, ts(500000L)),      // 0.5 s after #1 → dropped
      ("u1", "click", 3L, ts(2000000L)),     // 1.5 s after #2 (raw-gap) → kept
      ("u1", "view", 4L, ts(600000L)),       // other key: first → kept
      ("u2", "click", 5L, ts(100000L)))      // other user: first → kept
      .toDF("user_id", "event_type", "event_id", "ts")
    val got = Debounce.flag(rows, Seq("user_id", "event_type"), "ts", "event_id",
        minGapUs = 1000000L)
      .collect().map(r => r.getLong(2) -> r.getBoolean(5)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> true),
      s"got $got")
  }

  test("Incremental.mergeAggSnapshots equals the direct aggregation") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0), ("b", 5.0))
    def snap(s: Seq[(String, Double)]) = s.toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val merged = Incremental
      .mergeAggSnapshots(Seq(snap(rows.take(2)), snap(rows.drop(2))), Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = snap(rows)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged == direct)
    // disjoint key sets merge too (a key absent from one snapshot)
    val disjoint = Incremental
      .mergeAggSnapshots(Seq(snap(Seq(("a", 1.0))), snap(Seq(("b", 2.0)))), Seq("k"))
    assert(disjoint.count() == 2)
    intercept[IllegalArgumentException] {
      Incremental.mergeAggSnapshots(
        Seq(snap(rows), snap(rows).withColumnRenamed("sv", "other")), Seq("k"))
    }
  }

  test("Layout: morton interleave, top-edge clamp, zero-width column") {
    // morton(x=3 (0b11), y=1 (0b01)) at 2 bits: x→bits 0,2; y→bit 1 = 7
    val m = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.morton(col("x"), col("y"), 2).as("z"))
      .head.getLong(0)
    assert(m == 7L)
    // cells: x spans [0,10] → x=10 clamps to the top cell, not cells
    val df = Seq((1L, 0.0, 5L), (2L, 10.0, 5L), (3L, 5.0, 5L))
      .toDF("id", "x", "y")
    val cells = Layout.zorderCells(df, "x", "y", bits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(cells(1L)._1 == 0L && cells(2L)._1 == 3L && cells(3L)._1 == 2L)
    // constant y column is zero-width → every ycell is 0
    assert(cells.values.forall(_._2 == 0L))
  }

  test("Layout.zorderSort prunes on the second column; a single sort can't") {
    // 16×16 grid in x-major id order: id-range chunks are x-stripes
    // spanning ALL of y, so a min/max skip on a y predicate prunes
    // nothing — every chunk's y-range contains the point. Curve-ordered
    // chunks cover quadrant-like boxes, so most are skippable.
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x * 16L + y, x.toDouble, y.toLong)).toDF("id", "x", "y")
    def chunksHit(part: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Long =
      part(grid)
        .withColumn("p", spark_partition_id())
        .groupBy("p").agg(min("y").as("ylo"), max("y").as("yhi"))
        .filter(col("ylo") <= 5 && col("yhi") >= 5) // predicate y = 5
        .count()
    val zHit = chunksHit(g => Layout.zorderSort(g, "x", "y", bits = 4, partitions = 8))
    val idHit = chunksHit(_.repartitionByRange(8, col("id")))
    assert(idHit == 8L, s"x-sorted layout must be unprunable on y, got $idHit")
    assert(zHit * 2 <= idHit, s"z-order hit $zHit of 8 vs natural $idHit")
  }

  test("TextAnalysis.pmiPairs: doc-level co-occurrence, min-count gate") {
    val docs = Seq(
      (1L, "a a b"),  // within-doc repeats count once
      (2L, "a b"), (3L, "a c"), (4L, "b")
    ).toDF("doc_id", "text")
    // N=4, df: a=3 b=3 c=1; pairs (a,b)=2, (a,c)=1
    val all = TextAnalysis.pmiPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(all.keySet == Set(("a", "b"), ("a", "c")))
    assert(all(("a", "b"))._1 == 2L)
    assert(math.abs(all(("a", "b"))._2 - math.log(8.0 / 9.0)) < 1e-6)
    assert(math.abs(all(("a", "c"))._2 - math.log(4.0 / 3.0)) < 1e-6)
    // the long-tail gate drops singleton pairs
    val gated = TextAnalysis.pmiPairs(docs, "text", "doc_id", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated == Set(("a", "b")))
  }

  test("Numeric.powerLawAlpha: hand-computed MLE, xmin filter") {
    // values xmin·e each → ln(x/xmin) = 1 each → alpha = 1 + n/n = 2
    val e = math.exp(1.0)
    val df = (Seq.fill(40)(100.0 * e) ++ Seq.fill(10)(50.0)).toDF("x")
    val r = Numeric.powerLawAlpha(df, "x", xmin = 100.0).head
    assert(r.getLong(0) == 40L, "below-xmin values are excluded")
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-9)
    // a genuine Pareto(alpha=3) sample recovers its exponent roughly
    val rng = new scala.util.Random(7)
    val pareto = Seq.fill(5000)(100.0 * math.pow(rng.nextDouble(), -1.0 / 3.0))
    val a = Numeric.powerLawAlpha(pareto.toDF("x"), "x", 100.0)
      .head.getDouble(1)
    assert(a > 3.6 && a < 4.4, s"MLE alpha-hat $a should be near 1+3")
  }

  test("Numeric.percentRankCalibrate: exact ranks per group, ties by tiebreak") {
    val df = Seq(
      ("g1", 10.0, 1L), ("g1", 20.0, 2L), ("g1", 30.0, 3L), ("g1", 40.0, 4L),
      ("g2", 7.0, 5L),                       // singleton group → 0.0
      ("g3", 1.0, 6L), ("g3", 1.0, 7L)       // tie split by id order
    ).toDF("g", "v", "id")
    val got = Numeric.percentRankCalibrate(df, Seq("g"), "v", "id")
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.0 && math.abs(got(2L) - 1.0 / 3) < 1e-12 &&
      math.abs(got(3L) - 2.0 / 3) < 1e-12 && got(4L) == 1.0)
    assert(got(5L) == 0.0)
    assert(got(6L) == 0.0 && got(7L) == 1.0)
  }

  test("TextAnalysis.lexicalDiversity: TTR, hapax share, empty docs kept") {
    val df = Seq(
      (1L, "the cat the dog"),   // 4 tokens, 3 types, hapax cat+dog
      (2L, "aa aa aa"),          // 3 tokens, 1 type, 0 hapax
      (3L, "")                   // empty: kept with null ratios
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
         Option(r.get(3)).map(_.asInstanceOf[Double]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == ((4L, 3L, Some(0.75), Some(0.5))))
    assert(got(2L) == ((3L, 1L, Some(0.333333), Some(0.0))))
    assert(got(3L) == ((0L, 0L, None, None)))
  }

  test("Sketches.skewProfile: exact shares, entropy, deterministic tiebreak") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k").repartition(5)
    val r = Sketches.skewProfile(df, "k").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L)
    assert(r.getString(2) == "a" && r.getDouble(3) == 0.6)
    val h = -(0.6 * math.log(0.6) + 0.3 * math.log(0.3) + 0.1 * math.log(0.1))
    assert(math.abs(r.getDouble(4) - h) < 1e-6)
    // count tie → largest key wins, on both engines' orderings
    val tie = Sketches.skewProfile(Seq("a", "b", "a", "b").toDF("k"), "k").head
    assert(tie.getString(2) == "b")
    // nulls are not keys
    val withNull = Sketches.skewProfile(
      Seq(Some("a"), None, Some("a")).toDF("k"), "k").head
    assert(withNull.getLong(0) == 2L && withNull.getLong(1) == 1L)
  }

  test("Sketches.equiDepthHistogram: near-equal depths, ordered ranges") {
    // 10 rows, 4 buckets → depths 3,3,2,2 over the value order.
    val df = (1 to 10).map(i => ("g", i.toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(3)
    val got = Sketches.equiDepthHistogram(df, "g", "v", "id", buckets = 4)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == Map(
      1 -> ((3L, 1.0, 3.0)), 2 -> ((3L, 4.0, 6.0)),
      3 -> ((2L, 7.0, 8.0)), 4 -> ((2L, 9.0, 10.0))))
  }

  test("Numeric.robustScale: median/MAD scaling, zero-MAD groups null") {
    val a = (1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 1000.0))
    val b = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)) // MAD = 0
    val out = Numeric.robustScale((a ++ b).toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // group a: median 5.5, MAD 2.5 → outlier scales to 994.5/(2.5*1.4826)
    val exp = 994.5 / (2.5 * 1.4826)
    assert(math.abs(out(("a", 1000.0)).get - exp) < 1e-9)
    assert(math.abs(out(("a", 5.0)).get - (-0.5 / (2.5 * 1.4826))) < 1e-9)
    assert(out(("b", 9.0)).isEmpty && out(("b", 5.0)).isEmpty,
      "zero-MAD group must scale to null, not blow up")
  }

  test("Incremental.maintainJoin equals the direct join under inserts + dim updates") {
    val facts0 = Seq((1L, 10L, 5.0), (2L, 20L, 7.0), (3L, 10L, 9.0)).toDF("fid", "k", "v")
    val delta = Seq((4L, 30L, 2.0), (5L, 10L, 1.0)).toDF("fid", "k", "v")
    val dim0 = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "seg")
    // Key 10 changes a→A between generations.
    val dim1 = Seq((10L, "A"), (20L, "b"), (30L, "c")).toDF("k", "seg")
    val changed = Seq(Tuple1(10L)).toDF("k")
    val matview = facts0.join(dim0, "k")
    val got = Incremental.maintainJoin(matview, delta, dim1, changed, "k", Seq("seg"))
      .select("fid", "k", "v", "seg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val want = facts0.unionByName(delta).join(dim1, "k")
      .select("fid", "k", "v", "seg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == want)
    // Untouched keys must survive from the matview (no stale loss), and
    // every changed-key row must carry the NEW dim value.
    assert(got.filter(_._2 == 10L).forall(_._4 == "A"))
  }

  test("TextAnalysis.skipGramPairs: exact windowed pairs, gate, no cross-doc pairs") {
    val df = Seq("a b c d", "a b x", "").toDF("text")
    val got = TextAnalysis.skipGramPairs(df, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 window-2 pairs: ab ac bc bd cd; doc2: ab ax bx. No (d,a) etc.
    assert(got == Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("a", "x") -> 1L,
      ("b", "c") -> 1L, ("b", "d") -> 1L, ("b", "x") -> 1L,
      ("c", "d") -> 1L))
    // minCount gates the tail; pairs are ordered (left precedes right).
    val gated = TextAnalysis.skipGramPairs(df, "text", window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gated == Set(("a", "b")))
  }
}
