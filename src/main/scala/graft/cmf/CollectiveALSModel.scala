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

  def factorsFor(entity: String): DataFrame = cols.indexOf(entity) match {
    case -1 => throw new IllegalArgumentException(s"Unknown entity: $entity")
    case i  => factors(i)
  }

  private def dot(l: Column, r: Column): Column =
    aggregate(zip_with(l, r, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

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
    * Blocked evaluation — never materializes the |left|×|right| cross
    * product: right factors are grouped into `numBlocks` hash blocks
    * (arrays), each left id meets each block once (shuffle volume =
    * |left|·numBlocks·k floats), per-block top-k is selected inside a
    * native array expression, and only k·numBlocks candidate rows per
    * left id survive to the final per-id window. */
  def recommendTopK(
      k: Int,
      leftEntity: String,
      rightEntity: String,
      numBlocks: Int = 32): DataFrame = {
    require(k > 0 && numBlocks > 0)
    val lCol = cols.indexOf(leftEntity) match {
      case -1 => throw new IllegalArgumentException(s"Unknown entity: $leftEntity"); case _ => leftEntity }
    val users = factorsFor(leftEntity)
      .select(col("id").as(lCol), col("features").as("__graft_uf"))
    val items = factorsFor(rightEntity)
      .select(col("id").as("__graft_item"), col("features").as("__graft_if"))
    val blocks = items
      .groupBy(pmod(xxhash64(col("__graft_item")), lit(numBlocks)).as("__graft_blk"))
      .agg(collect_list(struct(
        col("__graft_item").as("item"), col("__graft_if").as("feat"))).as("__graft_items"))
      .drop("__graft_blk")
    // Per (left id, block): score every item natively, keep the block-local
    // top-k via struct sort on (-score, item) — deterministic ties.
    val scored = transform(col("__graft_items"), it =>
      struct(
        (-dot(col("__graft_uf"), it.getField("feat"))).as("negScore"),
        it.getField("item").as("item")))
    val topPerBlock = slice(array_sort(scored), 1, k)
    val cand = users.crossJoin(blocks)
      .select(col(lCol), explode(topPerBlock).as("__graft_c"))
      .select(col(lCol),
        col("__graft_c.item").as(rightEntity),
        (-col("__graft_c.negScore")).cast("float").as("score"))
    val w = Window.partitionBy(lCol).orderBy(col("score").desc, col(rightEntity))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def recommendTopK(k: Int): DataFrame = recommendTopK(k, cols(0), cols(1))
}
