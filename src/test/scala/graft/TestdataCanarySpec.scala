package graft

import org.apache.spark.sql.types._

/** Schema-drift canary: the driver regenerates /root/testdata between (and
  * occasionally mid-) rounds, and an encoding change there surfaces as mass
  * query failures with no single test naming the cause — round 9 lost 36
  * queries when `events.ts` flipped from TIMESTAMP(NANOS) to
  * TIMESTAMP_MICROS/NTZ and only the normalization layer's absence showed.
  * This spec pins the POST-NORMALIZATION schema every operator assumes, so
  * the next silent regeneration fails one named assertion instead.
  */
class TestdataCanarySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def fieldTypes(name: String): Map[String, DataType] =
    Tables(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("Tables.events normalizes ts to TimestampType whatever the parquet encoding") {
    val sch = Tables.events(spark, dir).schema
    assert(sch("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${sch("ts").dataType} — " +
        "the testdata encoding drifted; extend Tables.events (and Drain.events)")
    assert(sch("event_id").dataType == LongType)
    assert(sch("user_id").dataType == LongType)
    assert(sch("event_type").dataType == StringType)
    assert(sch("value").dataType == DoubleType)
    assert(sch("props").dataType == StringType)
  }

  test("streaming Drain.events schema matches the batch side") {
    val stream = graft.streaming.Drain.events(spark, dir).schema
    val batch = Tables.events(spark, dir).schema
    assert(stream == batch,
      s"stream/batch events schema diverged:\n  stream=$stream\n  batch =$batch")
  }

  test("core table columns the query surface keys on are present and typed") {
    val li = fieldTypes("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType
      && li("l_suppkey") == LongType)
    assert(li("l_quantity").isInstanceOf[NumericType]
      && li("l_extendedprice").isInstanceOf[NumericType]
      && li("l_discount").isInstanceOf[NumericType])
    // l_shipdate/o_orderdate ship as naive micros today; queries handle
    // either timestamp flavor, so pin only "some timestamp", not which.
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
      .contains(li("l_shipdate")), s"l_shipdate drifted: ${li("l_shipdate")}")
    val ord = fieldTypes("orders")
    assert(ord("o_orderkey") == LongType && ord("o_custkey") == LongType)
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
      .contains(ord("o_orderdate")), s"o_orderdate drifted: ${ord("o_orderdate")}")
    val docs = fieldTypes("documents")
    assert(docs("doc_id") == LongType && docs("text") == StringType)
    val emb = fieldTypes("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") match {
      case ArrayType(t: NumericType, _) => true
      case _ => false
    }, s"embeddings.embedding drifted: ${emb("embedding")}")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      assert(Tables(spark, dir, t).columns.nonEmpty, s"$t unreadable")
  }
}
