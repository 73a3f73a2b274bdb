package graft

import org.apache.spark.sql.functions._

/** The conditional fan-out gate (round-17 optimization): repartition
  * fires only when the input arrives under-partitioned, so the sf dirs'
  * single-split scans spread cluster-wide while a wide at-scale input is
  * left alone (an unconditional repartition would cap its stage width at
  * defaultParallelism AND pay a full round-robin shuffle). */
class FanOutSpec extends SparkSpec {

  test("fanOut widens an under-partitioned input to defaultParallelism") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(1000).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    assert(Tables.fanOut(narrow).rdd.getNumPartitions === target)
  }

  test("fanOut is a plan-level no-op on an already-wide input") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("id").repartition(target + 3)
    val out = Tables.fanOut(wide)
    // Same object, not merely same width: no repartition node was added.
    assert(out eq wide)
    assert(out.rdd.getNumPartitions === target + 3)
  }

  test("fanOut(df, probe) gates on the probe, not on df") {
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(100).toDF("id")
    val wideProbe = spark.range(10).toDF("id").repartition(target)
    assert(Tables.fanOut(df, wideProbe) eq df)
    val narrowProbe = spark.range(10).toDF("id").coalesce(1)
    assert(Tables.fanOut(df, narrowProbe).rdd.getNumPartitions === target)
  }

  test("fanOut preserves the row multiset") {
    val df = spark.range(100).toDF("id")
      .withColumn("v", col("id") * 7 % 13).coalesce(1)
    val before = df.collect().map(_.toSeq).sortBy(_.toString)
    val after = Tables.fanOut(df).collect().map(_.toSeq).sortBy(_.toString)
    assert(after === before)
  }
}
