package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2 #18–22).
  *
  * Scale discipline: no operator here ever forms the O(n²) global pair
  * space. Exact dedup groups by a 128-bit content hash (so the shuffle
  * carries 16-byte keys, not document bodies); near-dup detection always
  * blocks candidate pairs by a bucket key (minhash band, simhash prefix,
  * hyperplane signature) and verifies only within buckets.
  */
object Dedup {

  /** Exact deduplication by content hash.
    *
    * Groups on `md5(normalized text)` — the shuffle key is 32 hex chars
    * regardless of document size, so at 100 TB the exchange volume is
    * O(#docs · 16 B), not O(corpus). A 128-bit hash makes accidental
    * collisions (~n²/2¹²⁸) irrelevant at any achievable corpus size.
    *
    * Returns one row per distinct content: the representative (minimum)
    * id, the copy count, and the content hash.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("content_md5"), col(idCol))
      .groupBy("content_md5")
      .agg(min(idCol).as(idCol), count(lit(1)).as("n_copies"))

  /** Rows of `df` surviving exact dedup (first-id-wins), full schema. */
  def exactKeep(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exact(df, textCol, idCol).select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Distinct lowercase word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          j => concat_ws(" ", slice(toks, j, lit(n)))))
        .otherwise(array()))
  }

  /** N-gram Jaccard near-duplicate pairs via an inverted shingle index.
    *
    * Pair generation is blocked by shared shingle (the classic inverted
    * index): only documents sharing at least one n-gram ever meet, so the
    * candidate space is Σ_shingle df(shingle)² — never the O(n²) global
    * cross product. Intersection sizes fall out of a count aggregation;
    * Jaccard = |∩| / (|A|+|B|−|∩|) is exact integer arithmetic, so the
    * result is engine-reproducible (SQL-oracle-able).
    *
    * Returns (idCol_a, idCol_b, jaccard) with idCol_a < idCol_b.
    */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      minJaccard: Double = 0.1): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a").as(idCol + "_a"), col("id_b").as(idCol + "_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * numHashes seeded xxhash64 min-hashes per document → `bands` band
    * keys (each hashing `numHashes / bands` consecutive signature rows) →
    * self-join on (band index, band key) → exact Jaccard verification via
    * `array_intersect` on the *candidate pairs only*. Probability of a
    * pair with Jaccard j surfacing: 1 − (1 − j^r)^bands. All pair work is
    * bucket-blocked; signatures are native expressions (no UDF).
    *
    * Returns (idCol_a, idCol_b, jaccard) for verified pairs ≥ minJaccard.
    */
  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val mh = transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(col("sh"), s => xxhash64(s, i))))
    val sigs = withSh
      .withColumn("mh", mh)
      .select(col("id"), col("sh"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("mh"), b * r + lit(1), lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val cand = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.sh").as("sh_a"),
        col("b.id").as("id_b"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a").as(idCol + "_a"), col("id_b").as(idCol + "_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash near-duplicate pairs.
    *
    * The signature is folded per document inside one native `aggregate`
    * over the shingle hashes (no explode — a single projection pass at
    * any scale). Candidate pairs are blocked by the pigeonhole principle:
    * the 64 bits split into `maxHamming + 1` chunks, and any pair within
    * `maxHamming` must agree on at least one chunk, so the self-join runs
    * on (chunk index, chunk value) buckets and exact Hamming distance is
    * checked on candidates only.
    *
    * Returns (idCol_a, idCol_b, hamming).
    */
  def simHash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sim", simHashBits(col("sh")))
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val chunkArr = array((0 until chunks).map { c =>
      shiftrightunsigned(col("sim"), c * bitsPerChunk)
        .bitwiseAND(lit((1L << bitsPerChunk) - 1))
    }: _*)
    val keyed = sigs.select(col("id"), col("sim"), posexplode(chunkArr))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a").as(idCol + "_a"), col("id_b").as(idCol + "_b"), col("hamming"))
  }

  /** 64-bit SimHash of a shingle array as a single folded expression. */
  def simHashBits(sh: Column): Column = {
    val hashes = transform(sh, s => xxhash64(s))
    val counts = aggregate(
      hashes,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(j =>
          when(shiftrightunsigned(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)): _*),
        (x, y) => x + y))
    (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc + when(element_at(counts, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` — exact
    * (brute-force within `a.id < b.id`), double-precision arithmetic so
    * the result is engine-reproducible. For the sub-quadratic path at
    * scale use [[Similarity.lshTopK]]. */
  def embeddingCosine(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as(idCol + "_a"), col("b.id").as(idCol + "_b"),
        round(col("cosine"), 6).as("cosine"))
  }
}
