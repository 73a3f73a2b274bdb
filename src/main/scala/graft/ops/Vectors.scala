package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-column aggregation for embedding pipelines. */
object Vectors {

  /** Element-wise mean of a vector column per group — chunk embeddings
    * pooled to a document embedding, or per-class centroids. Returns
    * (groupCol, mean_vec).
    *
    * Scale shape: posexplode → one (group, dim)-keyed average with
    * map-side partial aggregation — the exchange carries (group, dim,
    * partial sum) rows, never whole vectors — then a per-group
    * reassembly whose state is one dim-length array per group. No
    * driver participation, no UDAF buffers of unbounded width. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg("col").as("v"))
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("mean_vec"))
}
