package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination contracts on planted leaks. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten eleven"),
    (3L, "red orange yellow green blue indigo violet ultra infra deep"),
    (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")
  ).toDF("doc_id", "text")

  test("contaminatedBloom returns exactly contaminated's result") {
    // No false negatives (Bloom) + exact FP verify ⇒ set equality, row
    // for row — checked on real data where the prefilter actually drops
    // most of the corpus shingle stream.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSet = docs.filter(col("doc_id") % 25 === 0)
      .select(expr("substring(text, 10, 120)").as("text"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = key(Decontaminate.contaminated(docs, "text", "doc_id",
      evalSet, "text", n = 5))
    val bloom = key(Decontaminate.contaminatedBloom(docs, "text", "doc_id",
      evalSet, "text", n = 5))
    assert(exact.nonEmpty && bloom == exact,
      s"bloom-only=${bloom.diff(exact)} exact-only=${exact.diff(bloom)}")
    // An aggressive fpp still changes nothing — FPs die in the verify.
    val sloppy = key(Decontaminate.contaminatedBloom(docs, "text", "doc_id",
      evalSet, "text", n = 5, fpp = 0.5))
    assert(sloppy == exact)
  }

  test("contaminated flags exactly the docs sharing eval n-grams") {
    // The eval set leaks a 6-token span of doc 2 and nothing else.
    val evalSet = Seq("three four five six seven eight").toDF("text")
    val hits = Decontaminate.contaminated(corpus, "text", "doc_id", evalSet, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 6 tokens -> three 4-gram shingles, all present in doc 2.
    assert(hits == Map(2L -> 3L), s"got $hits")
  }

  test("an unrelated eval set flags nothing; removal keeps the corpus") {
    val evalSet = Seq("completely unrelated benchmark prompt text here").toDF("text")
    assert(Decontaminate.contaminated(corpus, "text", "doc_id", evalSet, "text", n = 4)
      .count() == 0)
    assert(Decontaminate.removeContaminated(
      corpus, "text", "doc_id", evalSet, "text", n = 4).count() == 4)
  }

  test("removeContaminated drops leaked docs and honors minHits") {
    val evalSet = Seq(
      "alpha beta gamma delta epsilon zeta",
      "lorem ipsum dolor sit").toDF("text")
    val kept = Decontaminate.removeContaminated(
      corpus, "text", "doc_id", evalSet, "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"kept $kept")
    // minHits = 2: doc 4 shares only one 4-gram ("lorem ipsum dolor sit")
    // and survives; doc 1 shares three and is still dropped.
    val keptMin2 = Decontaminate.removeContaminated(
      corpus, "text", "doc_id", evalSet, "text", n = 4, minHits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptMin2 == Set(2L, 3L, 4L), s"kept $keptMin2")
  }
}
