package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression evaluation: RMSE / MAE / MSE / R² in a single aggregation
  * (SURVEY §2 #15).
  *
  * Mirrors the reference's post-fit evaluation
  * (`/root/reference/src/test/scala/com/github/jongwook/cmf/MovieLensALS.scala:39-45`,
  * which feeds (prediction, label) pairs to RegressionMetrics after
  * dropping NaNs) — re-expressed as one partial-aggregable `agg` over
  * sufficient statistics, so at 100 TB it is a single map-side-combined
  * shuffle of five doubles per partition, no RDD, no second pass.
  */
object RegressionEvaluation {

  /** One-row DataFrame: n, mse, rmse, mae, r2. NaN pairs are excluded
    * (cold-start predictions evaluate like the reference's filtered RDD). */
  def evaluate(df: DataFrame, labelCol: String, predictionCol: String): DataFrame = {
    val l = col(labelCol).cast("double")
    val p = col(predictionCol).cast("double")
    val err = p - l
    df.filter(!isnan(l) && !isnan(p) && l.isNotNull && p.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(err * err).as("sse"),
        sum(abs(err)).as("sae"),
        sum(l).as("sl"),
        sum(l * l).as("sll"))
      .select(
        col("n"),
        // Empty or constant-label inputs: null metrics, never a
        // divide-by-zero crash (n = 0 or zero label variance).
        when(col("n") > 0, col("sse") / col("n")).as("mse"),
        when(col("n") > 0, sqrt(col("sse") / col("n"))).as("rmse"),
        when(col("n") > 0, col("sae") / col("n")).as("mae"),
        when(col("n") > 0 &&
            col("sll") - col("sl") * col("sl") / col("n") =!= 0.0,
          lit(1.0) - col("sse") /
            (col("sll") - col("sl") * col("sl") / col("n"))).as("r2"))
  }
}
