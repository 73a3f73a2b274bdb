package graft.sources

import graft.SparkSpec
import graft.sources.FixedWidth.Field

class FixedWidthSpec extends SparkSpec {

  private def del(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val all = java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
    all.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private val layout =
    Seq(Field("id", 6, "long"), Field("name", 8, "string"), Field("qty", 4, "long"))

  test("write-read roundtrips values exactly through the fixed slices") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fw_spec")
    try {
      val df = Seq((42L, "widget", 7L), (100000L, "a b", 9999L))
        .toDF("id", "name", "qty")
      FixedWidth.write(df, layout, tmp.toString)
      val back = FixedWidth.read(spark, tmp.toString, layout)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(back.toSeq === Seq((42L, "widget", 7L), (100000L, "a b", 9999L)))
    } finally del(tmp)
  }

  test("a torn record surfaces as nulls, not an exception") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fw_torn")
    try {
      Seq("   ab...junk").toDF("line")
        .write.mode("overwrite").text(tmp.toString)
      val r = FixedWidth.read(spark, tmp.toString, layout).head()
      assert(r.isNullAt(0)) // "   abc" is not a long
    } finally del(tmp)
  }

  test("a value wider than its field is rejected at write") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fw_wide")
    try {
      val bad = Seq((1L, "name-way-too-long", 1L)).toDF("id", "name", "qty")
      intercept[IllegalArgumentException] {
        FixedWidth.write(bad, layout, tmp.toString)
      }
    } finally del(tmp)
  }
}
