package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual information between two categorical columns — the
  * model-free dependence screen next to the χ² audit (χ² asks "is
  * there dependence"; MI measures HOW MUCH, in nats, and normalizes
  * comparably across pairs). I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))),
  * with NMI = I/√(H(X)H(Y)) as the [0,1] readout.
  *
  * Exactness discipline: every probability is a ratio of exact counts;
  * each cell's contribution (and each marginal entropy term) is
  * computed as one pinned double expression and rounded to integer
  * nano-nats BEFORE the sum (round-then-sum), so float summation order
  * never reaches the totals. Scale: one cell aggregation (the only
  * full-data pass), margins derived from the cells, everything after
  * is |X|·|Y|-scale broadcast arithmetic.
  */
object InfoTheory {

  /** One-row MI profile of (xCol, yCol): `pair, n, mi, h_x, h_y, nmi`
    * (nats, rounded to 6; nmi null when a margin entropy is zero). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String, pairName: String): DataFrame = {
    val cells = df.groupBy(col(xCol).cast("string").as("xv"),
        col(yCol).cast("string").as("yv"))
      .agg(count(lit(1)).as("nxy"))
    val mx = cells.groupBy("xv").agg(sum("nxy").as("nx"))
    val my = cells.groupBy("yv").agg(sum("nxy").as("ny"))
    val tot = cells.agg(sum("nxy").as("n"))
    val mi = cells.join(broadcast(mx), "xv").join(broadcast(my), "yv")
      .crossJoin(broadcast(tot))
      .withColumn("t_nn",
        round((col("nxy").cast("double") / col("n"))
          * log((col("nxy").cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(19, 0)) * col("n")).cast("double")
            / (col("nx").cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(19, 0)) * col("ny")).cast("double"))
          * 1000000000L, 0)
          .cast("long"))
      .agg(sum("t_nn").as("mi_nn"))
    def margEntropy(m: DataFrame, c: String, out: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .withColumn("h_nn",
          round(-(col(c).cast("double") / col("n"))
            * log(col(c).cast("double") / col("n")) * 1000000000L, 0)
            .cast("long"))
        .agg(sum("h_nn").as(out))
    val hx = margEntropy(mx, "nx", "hx_nn")
    val hy = margEntropy(my, "ny", "hy_nn")
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .crossJoin(broadcast(tot))
      .select(lit(pairName).as("pair"), col("n"),
        round(col("mi_nn") / 1000000000.0, 6).as("mi"),
        round(col("hx_nn") / 1000000000.0, 6).as("h_x"),
        round(col("hy_nn") / 1000000000.0, 6).as("h_y"),
        when(col("hx_nn") === 0 || col("hy_nn") === 0, lit(null).cast("double"))
          .otherwise(round(col("mi_nn")
            / sqrt(col("hx_nn").cast("double") * col("hy_nn").cast("double")), 6))
          .as("nmi"))
  }
}
