package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Counter-based deterministic RNG.
  *
  * The reference generates walks with an unseeded, order-dependent global
  * RNG (`math/rand/v2`, /root/reference/pkg/walks/walks.go:150,164), which
  * makes its crawl order irreproducible even by itself. We replace it with
  * a *counter-based* generator: every draw is a pure function of
  * `(seed, key1, key2, key3)`, so the result is independent of partitioning,
  * scheduling, and evaluation order — the property that lets the distributed
  * engine match the sequential executable spec byte-for-byte (SURVEY.md §7.4).
  *
  * Hash backbone is Spark's own XXH64 (the `xxhash64` SQL expression), so
  * column-side and driver-side draws agree exactly.
  */
object Rng extends Serializable {
  @inline def hash(seed: Long, a: Long, b: Long, c: Long): Long = {
    var h = XXH64.hashLong(a, seed)
    h = XXH64.hashLong(b, h)
    XXH64.hashLong(c, h)
  }

  /** Uniform double in [0, 1). 53 high bits of the hash. */
  @inline def u01(seed: Long, a: Long, b: Long, c: Long): Double =
    (hash(seed, a, b, c) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform int in [0, n). Requires n > 0. */
  @inline def uniformIndex(seed: Long, a: Long, b: Long, c: Long, n: Int): Int = {
    val d = u01(seed, a, b, c)
    val i = (d * n).toInt
    if (i >= n) n - 1 else i // guard the d ~ 1.0 edge
  }

  /** Driver-side twin of the `xxhash64(string)` SQL expression (seed 42) —
    * lets the driver maintain a bloom filter of url hashes that the native
    * codegen'd `might_contain(bloom, xxhash64(url))` predicate then probes.
    */
  def sparkXxhash64String(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s), org.apache.spark.sql.types.StringType, 42L)
}
