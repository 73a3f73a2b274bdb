package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session-environment contract the whole query surface assumes —
  * a silent config drift (AQE off, wrong timezone, legacy-nanos reset,
  * shuffle partitions back to 200) would change plans or timestamp
  * semantics without failing any operator test directly. */
class SessionContractSpec extends AnyFunSuite {

  test("GraftSession pins AQE, UTC, nanos-as-long, and core-sized shuffles") {
    val s = GraftSession.builder("4").getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "4",
      "shuffle partitions must track the requested core count, not Spark's 200 default")
    // the custom expression must be SQL-registered by the factory path
    graft.functions.register(s)
    val r = s.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head()
    assert(r.getDouble(0) == 11.0)
  }
}
