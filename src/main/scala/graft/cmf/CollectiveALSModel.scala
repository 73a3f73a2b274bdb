package graft.cmf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fitted collective-ALS model: one (id, features) factor DataFrame per
  * entity.
  *
  * `predict` mirrors the reference model
  * (`/root/reference/src/main/scala/com/github/jongwook/cmf/CollectiveALSModel.scala:43-67`):
  * left-join both entities' factor tables onto the input and emit the
  * factor dot product as a float `prediction`, NaN for cold-start ids —
  * but the dot product is a native codegen'd `aggregate(zip_with(...))`
  * expression rather than a UDF, and ids are Long (no checked Int cast
  * needed).
  */
class CollectiveALSModel(
    val rank: Int,
    val factors: Seq[DataFrame],
    entityCols: Seq[String],
    var predictionCol: String = "prediction") extends Serializable {

  private val cols: Array[String] = entityCols.toArray
  require(cols.length == factors.length, "one entity column per factor table")

  def userCol: String = cols(0)
  def itemCol: String = cols(1)
  def entityCol(index: Int): String = cols(index)
  def setPredictionCol(value: String): this.type = { predictionCol = value; this }
  def setUserCol(value: String): this.type = { cols(0) = value; this }
  def setItemCol(value: String): this.type = { cols(1) = value; this }
  def setEntityCol(index: Int, value: String): this.type = { cols(index) = value; this }
  def setEntityCols(values: Seq[String]): this.type = {
    require(values.length == cols.length, s"expected ${cols.length} entity columns")
    values.zipWithIndex.foreach { case (v, i) => cols(i) = v }
    this
  }

  def factorsFor(entity: String): DataFrame = cols.indexOf(entity) match {
    case -1 => throw new IllegalArgumentException(s"Unknown entity: $entity")
    case i  => factors(i)
  }

  /** Factor-table row counts, cached per entity *index* (stable under
    * column renames): adaptive block sizing reads these on every
    * `recommendTopK` call, and a count job per serving call would be a
    * full extra pass over the factor table. */
  private val countCache = scala.collection.concurrent.TrieMap.empty[Int, Long]
  private def entityCount(entity: String): Long = {
    val i = cols.indexOf(entity)
    require(i >= 0, s"Unknown entity: $entity")
    countCache.getOrElseUpdate(i, factors(i).count())
  }

  /** Native fused dot ([[graft.functions.ArrayDot]]); registered by
    * GraftSession — [[graft.functions.register]] re-registers idempotently
    * for sessions built elsewhere. */
  private def dot(l: Column, r: Column): Column = {
    graft.functions.register(factors.head.sparkSession)
    graft.functions.array_dot(l, r)
  }

  /** Input rows + float `predictionCol`; NaN where either id is unseen. */
  def predict(
      ds: DataFrame,
      leftEntity: String,
      rightEntity: String): DataFrame = {
    val lf = factorsFor(leftEntity)
      .select(col("id").as("__graft_lid"), col("features").as("__graft_lf"))
    val rf = factorsFor(rightEntity)
      .select(col("id").as("__graft_rid"), col("features").as("__graft_rf"))
    ds.join(lf, ds(leftEntity).cast("long") === col("__graft_lid"), "left")
      .join(rf, ds(rightEntity).cast("long") === col("__graft_rid"), "left")
      .withColumn(predictionCol,
        coalesce(dot(col("__graft_lf"), col("__graft_rf")).cast("float"), lit(Float.NaN)))
      .drop("__graft_lid", "__graft_lf", "__graft_rid", "__graft_rf")
  }

  def predict(ds: DataFrame): DataFrame = predict(ds, cols(0), cols(1))

  /** Top-k right-entity recommendations per left-entity id, as rows
    * (leftEntity, rightEntity, score, rank).
    *
    * Blocked on BOTH sides (MLlib `recommendForAll` shape) — never
    * materializes the |left|×|right| cross product, and never replicates
    * individual left *rows* per right block: both factor tables group
    * into hash blocks (arrays), the cross join runs over block×block
    * pairs (|leftBlocks|·|rightBlocks| rows — at 1B×1B ids that is ~10⁹
    * block rows, where one-sided blocking would push 10¹³ replicated
    * left rows through the shuffle), a per-partition primitive loop
    * selects each left id's block-local top-k (the dot-product hot loop
    * is the one place where native array expressions lose an order of
    * magnitude to scratch arithmetic), and only k·numBlocks candidate
    * rows per left id survive to the final per-id window.
    *
    * `numBlocks`/`numLeftBlocks` <= 0 (default) size blocks adaptively
    * to ~100k right / ~10k left ids per block — each block row stays a
    * few MB regardless of table size (a fixed block count would overflow
    * Spark's single-record limits at billion-id scale). */
  def recommendTopK(
      k: Int,
      leftEntity: String,
      rightEntity: String,
      numBlocks: Int = 0,
      numLeftBlocks: Int = 0): DataFrame = {
    require(k > 0)
    require(cols.contains(leftEntity), s"Unknown entity: $leftEntity")
    val spark = factors.head.sparkSession
    import spark.implicits._
    val rn =
      if (numBlocks > 0) numBlocks
      else math.min(65536L,
        math.max(32L, entityCount(rightEntity) / 100000L + 1)).toInt
    val ln =
      if (numLeftBlocks > 0) numLeftBlocks
      else math.min(1048576L,
        math.max(32L, entityCount(leftEntity) / 10000L + 1)).toInt
    val userBlocks = factorsFor(leftEntity)
      .groupBy(pmod(xxhash64(col("id")), lit(ln)).as("ublk"))
      .agg(collect_list(struct(col("id").as("_1"), col("features").as("_2"))).as("us"))
      .select("us")
    val itemBlocks = factorsFor(rightEntity)
      .groupBy(pmod(xxhash64(col("id")), lit(rn)).as("blk"))
      .agg(collect_list(struct(col("id").as("_1"), col("features").as("_2"))).as("items"))
      .select("items")
    val kk = k
    val cand = userBlocks.crossJoin(itemBlocks)
      .as[(Seq[(Long, Array[Float])], Seq[(Long, Array[Float])])]
      .mapPartitions { it =>
        it.flatMap { case (us, items) =>
          us.iterator.flatMap { case (uid, uf) =>
            // Block-local top-k by (score desc, id asc): insertion into
            // fixed k-slots — O(|block|·k) comparisons, no allocation.
            val ids = new Array[Long](kk)
            val scores = new Array[Double](kk)
            var filled = 0
            items.foreach { case (iid, ifeat) =>
              var s = 0.0
              var j = 0
              while (j < uf.length) { s += uf(j) * ifeat(j); j += 1 }
              var p = filled
              while (p > 0 && (scores(p - 1) < s ||
                  (scores(p - 1) == s && ids(p - 1) > iid))) p -= 1
              if (p < kk) {
                val last = math.min(filled, kk - 1)
                var m = last
                while (m > p) { ids(m) = ids(m - 1); scores(m) = scores(m - 1); m -= 1 }
                ids(p) = iid
                scores(p) = s
                if (filled < kk) filled += 1
              }
            }
            (0 until filled).map(x => (uid, ids(x), scores(x).toFloat))
          }
        }
      }.toDF(leftEntity, rightEntity, "score")
    val w = Window.partitionBy(leftEntity).orderBy(col("score").desc, col(rightEntity))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def recommendTopK(k: Int): DataFrame = recommendTopK(k, cols(0), cols(1))

  /** Persist the model: one parquet factor table per entity plus a JSON
    * meta row (rank, entity columns, prediction column). Factor tables
    * write with their natural partitioning — no coalesce, so a
    * billion-user model writes in parallel. */
  def save(path: String): Unit = {
    val spark = factors.head.sparkSession
    import spark.implicits._
    factors.zipWithIndex.foreach { case (f, i) =>
      f.write.mode("overwrite").parquet(s"$path/factors_$i")
    }
    Seq((rank, cols.toSeq, predictionCol))
      .toDF("rank", "entityCols", "predictionCol")
      .coalesce(1).write.mode("overwrite").json(s"$path/meta")
  }
}

object CollectiveALSModel {

  /** Load a model written by [[CollectiveALSModel.save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): CollectiveALSModel = {
    val meta = spark.read.json(s"$path/meta").head()
    val entityCols = meta.getSeq[String](meta.fieldIndex("entityCols")).toList
    val rank = meta.getAs[Long]("rank").toInt
    val factors = entityCols.indices.map(i => spark.read.parquet(s"$path/factors_$i"))
    new CollectiveALSModel(rank, factors, entityCols,
      meta.getAs[String]("predictionCol"))
  }
}
