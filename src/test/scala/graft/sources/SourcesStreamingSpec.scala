package graft.sources

import graft.{SparkSpec, Tables}
import graft.streaming.EventStream
import java.nio.file.Files

case class Rating(userId: Int, movieId: Int, rating: Float, timestamp: Long)

/** TypedCsv round-trip + streaming/batch equivalence. */
class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("TypedCsv reads a MovieLens-style CSV into a typed Dataset") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("ratings.csv")
    Files.writeString(f,
      """userId,movieId,rating,timestamp
        |1,31,2.5,1260759144
        |1,1029,3.0,1260759179
        |7,50,4.5,851866703
        |""".stripMargin)
    val ds = TypedCsv.read[Rating](spark, f.toString)
    val rows = ds.collect().sortBy(r => (r.userId, r.movieId))
    assert(rows.length == 3)
    assert(rows(0) == Rating(1, 31, 2.5f, 1260759144L))
    assert(rows(2) == Rating(7, 50, 4.5f, 851866703L))
    // Typed filter works through the encoder.
    assert(ds.filter(_.rating >= 3.0f).count() == 2)
  }

  test("streaming windowed agg equals the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.runBatchEquivalent(spark, dir)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventStream.windowedAgg(Tables.events(spark, dir))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
