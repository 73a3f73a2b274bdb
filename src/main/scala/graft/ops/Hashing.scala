package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** JVM-side xxHash64 helpers for per-partition signature loops — the same
  * hash family Spark's `xxhash64` expression uses (catalyst XXH64), so
  * JVM-computed signatures and expression-computed ones share quality and
  * determinism guarantees. */
object Hashing {
  /** xxh64 of a string's UTF-8 bytes. */
  def xxh64(s: String, seed: Long): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  /** xxh64 of a long (used to derive seeded hash families cheaply from a
    * single byte-level pass). */
  def xxh64(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)
}
