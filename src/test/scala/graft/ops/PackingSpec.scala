package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Packing contracts: complete assignment, contiguous bins, and the
  * overflow-by-at-most-one-document budget bound. */
class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("packByBudget assigns every doc once into contiguous bounded bins") {
    val docs = Tables.documents(spark, dir)
    val budget = 500L
    val out = Packing.packByBudget(docs, "doc_id",
      TextAnalysis.wsTokenCount(col("text")), budget,
      xxhash64(col("doc_id"), lit(11L)), 4)
      .collect()
    assert(out.length == docs.count(), "every document assigned exactly once")
    val byBin = out.groupBy(r => (r.getLong(1), r.getLong(2)))
    byBin.foreach { case ((bucket, bin), rows) =>
      val total = rows.map(_.getLong(3)).sum
      val maxDoc = rows.map(_.getLong(3)).max
      // Greedy first-fit: a bin exceeds the budget by at most the one
      // document that straddles its boundary.
      assert(total <= budget + maxDoc, s"bin ($bucket,$bin) holds $total tokens")
    }
    // Bins are contiguous per bucket: 0..max with no gaps.
    out.groupBy(_.getLong(1)).foreach { case (bucket, rows) =>
      val bins = rows.map(_.getLong(2)).toSet
      assert(bins == (0L to bins.max).toSet, s"bucket $bucket bins not contiguous: $bins")
    }
    // No wasted capacity: every non-last bin holds at least
    // budget − (largest doc in the bucket) tokens — the slack a
    // boundary-straddling predecessor can steal, never more.
    out.groupBy(_.getLong(1)).foreach { case (bucket, rows) =>
      val lastBin = rows.map(_.getLong(2)).max
      val maxDoc = rows.map(_.getLong(3)).max
      rows.groupBy(_.getLong(2)).foreach { case (bin, rs) =>
        if (bin < lastBin) {
          val total = rs.map(_.getLong(3)).sum
          assert(total >= budget - maxDoc,
            s"bucket $bucket bin $bin underfilled: $total")
        }
      }
    }
  }

  test("packByBudget is deterministic and rejects bad args") {
    val docs = Tables.documents(spark, dir)
    def run() = Packing.packByBudget(docs, "doc_id",
      TextAnalysis.wsTokenCount(col("text")), 1000L,
      xxhash64(col("doc_id")), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
    intercept[IllegalArgumentException] {
      Packing.packByBudget(docs, "doc_id", lit(1), 0L, col("doc_id"), 4)
    }
  }
}
