package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Recall/precision bounds for the hash-based near-dup detectors against
  * exact ground truth, on the sf0.001 documents with planted mutations. */
class NearDupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val corpus = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.unionAll(docs.select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 40, 1))").as("text")))
  }

  /** Exact Jaccard ≥ 0.6 pairs — the ground truth. */
  private lazy val truth: Set[(Long, Long)] =
    Dedup.ngramJaccard(corpus, "text", "doc_id", 3, 0.6)
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted mutations produce ground-truth near-dup pairs") {
    // Most of the 500 planted (id, id+1000000) pairs must clear the 0.6
    // Jaccard bar (a few very short docs lose too much to the truncation);
    // the word-salad corpus also contributes some natural near-dups.
    val planted = truth.count { case (a, b) => b - a == 1000000 }
    assert(planted >= 400, s"only $planted planted pairs in truth")
  }

  test("minhash LSH recall >= 0.9 at its design point, no false positives") {
    val found = Dedup.minHashLsh(corpus, "text", "doc_id", 3, 32, 8, 0.6)
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Verification is exact, so found ⊆ truth (no false positives)...
    assert(found.subsetOf(truth))
    // ...and the band structure (r=4, b=8) surfaces j >= 0.6 pairs with
    // probability 1-(1-j^4)^8 >= 0.72, in practice near-total here.
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (${found.size}/${truth.size})")
  }

  test("simhash hamming<=6 recovers lightly mutated pairs") {
    // SimHash flips bits in proportion to the fraction of shingles
    // changed, so its planted corpus uses a light (~2-token) truncation.
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val light = docs.unionAll(docs.select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text")))
    val found = Dedup.simHash(light, "text", "doc_id", 3, 6)
      .select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val recall = found.intersect(planted).size.toDouble / planted.size
    assert(recall >= 0.4, s"simhash recall $recall (${found.size} found)")
  }

  test("exact dedup on mutated corpus keeps all 2n docs distinct") {
    val n = corpus.count()
    assert(Dedup.exact(corpus, "text", "doc_id").count() == n)
  }
}
