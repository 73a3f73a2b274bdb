package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Shared tiny-fixture writers for the golden-value suites
  * ([[EdgeBranchSpec]], [[EdgeBranchSpec2]]): every constant asserted
  * over these fixtures is derived independently by
  * `tools/golden_stats.py` — see the EdgeBranchSpec scaladoc for the
  * method. */
trait GoldenFixtures extends SparkSpec {

  protected val Hour = 3600000000L
  protected val Day = 86400000000L

  /** Fresh fixture dir per test. */
  protected def tmp(): String =
    Files.createTempDirectory("edgebranch").toString

  /** (event_id, ts_us, user_id, event_type, value) -> events.parquet */
  protected def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("p").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** One event per (type, value): ts collapses to a single hour. */
  protected def valueEvents(dir: String,
      groups: Map[String, Seq[Double]]): Unit = {
    var id = 0L
    val rows = for {
      (tpe, vs) <- groups.toSeq.sortBy(_._1)
      v <- vs
    } yield { id += 1; (id, Hour + id, id, tpe, v) }
    writeEvents(dir, rows)
  }

  /** counts(tpe)(i) events in hour base+i — controlled hourly series. */
  protected def countEvents(dir: String, base: Long,
      counts: Map[String, Seq[Int]]): Unit = {
    var id = 0L
    val rows = for {
      (tpe, cs) <- counts.toSeq.sortBy(_._1)
      (c, i) <- cs.zipWithIndex
      j <- 0 until c
    } yield { id += 1; (id, (base + i) * Hour + j * 1000L, id, tpe, 1.0) }
    writeEvents(dir, rows)
  }

  protected def one(df: DataFrame): Row = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.toSeq}")
    rows.head
  }
}
