package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hash functions shared by shard routing,
  * minhash/LSH dedup, and fingerprinting.
  *
  * Spark's native `hash()`/`xxhash64()` are Murmur3/xxHash with Spark's
  * seeds — DuckDB cannot reproduce them, so every oracle-checked operator
  * that hashes uses md5 (identical bytes in any engine) truncated to 32
  * bits. 32 bits of entropy is plenty for shard routing and LSH banding
  * (we never key more than ~2^16 buckets); where 64 bits are needed we
  * compose two independent 32-bit lanes.
  *
  * All of these are built-in Catalyst expressions — codegen'd, no UDFs.
  */
object PortableHash {

  /** First 32 bits of md5(s) as a non-negative BIGINT in [0, 2^32).
    * DuckDB twin: CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT).
    * Implemented as a native codegen'd Expression (PortableHash32Expr);
    * `hash32Builtin` is the equivalent built-in composition kept for
    * equivalence testing. */
  def hash32(s: Column): Column =
    org.apache.spark.sql.graft.PortableHash32Expr(s)

  def hash32Builtin(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** A keyed/seeded hash family for minhash: lane `i` hashes `i:s`.
    * Independent across lanes because md5 mixes the prefix fully. */
  def hash32Seeded(seed: Int, s: Column): Column =
    hash32(concat(lit(s"$seed:"), s))

  /** Bits 33..64 of md5(s) — an independent second 32-bit lane. */
  def hash32b(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 9, 8), 16, 10).cast("long")

  /** SQL twins (DuckDB) of the above, for OracleFragments. */
  def sqlHash32(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 8)) AS BIGINT)"
  def sqlHash32Seeded(seed: Int, expr: String): String =
    sqlHash32(s"'$seed:' || $expr")
  def sqlHash32b(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 9, 8)) AS BIGINT)"
}
