package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.bloom_might_contain

/** Bloom-pruned shuffled equi-join: before a fact ⋈ dim join where the
  * dim side is selective but NOT broadcast-small, build a Bloom filter
  * over the dim's join keys and drop non-joining fact rows at the scan,
  * BEFORE the fact side's exchange.
  *
  * Why this matters at 100 TB: a shuffled join exchanges the ENTIRE fact
  * table even when only 1% of its rows have a partner. The Bloom bits
  * compress the dim key set to ~9.6 bits/key at 1% fpp — megabytes where
  * the exact key set would be gigabytes — so the filter rides to every
  * task as a plan constant and the exchange carries only true partners
  * plus the fpp sliver. Spark's own `InjectRuntimeFilter` does exactly
  * this rewrite when stats justify it; this operator is the explicit,
  * deterministic form a pipeline author can pin (and the codegen'd
  * [[graft.functions.BloomMightContain]] probe keeps the scan inside
  * whole-stage codegen — no UDF boxing).
  *
  * Since Bloom filters have no false negatives, the subsequent exact join
  * removes the false positives and the result EQUALS the plain join —
  * which is what the driver oracle checks.
  */
object BloomJoin {

  /** Max dim-side distinct keys the filter is sized for; beyond this the
    * bits stop paying for themselves vs just shuffling (and the plan
    * constant stops being small). ~24 MB of bits at 1% fpp. */
  val MaxDimKeys: Long = 20L * 1000 * 1000

  /** Inner equi-join `fact ⋈ dim` on long key `key`, Bloom-pruning the
    * fact side first. The dim side is scanned twice (key-distinct for the
    * filter build, then the join) — cache the dim upstream if it is
    * itself expensive to produce.
    *
    * @param fpp false-positive rate of the prefilter (result-neutral;
    *            only tunes how many doomed rows survive to the shuffle)
    */
  def inner(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val dimKeys = dim.select(col(key).cast("long").as(key)).na.drop().distinct()
    val nKeys = dimKeys.count()
    // Empty dim: stat.bloomFilter has no rows to aggregate (null buffer);
    // the join result is empty regardless, so prune everything directly.
    if (nKeys == 0) return fact.filter(lit(false)).join(dim, Seq(key), "inner")
    require(nKeys <= MaxDimKeys,
      s"BloomJoin dim side has $nKeys distinct keys (> $MaxDimKeys) — at that " +
        "size the filter bits stop being a cheap plan constant; shuffle-join " +
        "directly or bucket both sides instead")
    val bloom = dimKeys.stat.bloomFilter(key, math.max(nKeys, 1L), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val pruned = fact.filter(
      bloom_might_contain(col(key).cast("long"), lit(out.toByteArray)))
    pruned.join(dim, Seq(key), "inner")
  }
}
