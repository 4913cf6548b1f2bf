package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import org.apache.spark.sql.graft.PortableHash32Expr

/** The native codegen'd hash expression must agree bit-for-bit with the
  * built-in composition it replaced (and therefore with the DuckDB
  * oracle twin). */
class PortableHashSpec extends SparkTestBase {
  import spark.implicits._

  test("native expression == built-in composition on varied inputs") {
    val rows = Seq("", "a", "hello world", "ünïcode 東京", "0:x y z",
      "he said \"hi\" \\ bye", "x" * 10000).toDF("s")
    val diff = rows.filter(
      PortableHash.hash32(col("s")) =!= PortableHash.hash32Builtin(col("s")))
    assert(diff.count() == 0L)
  }

  test("values are unsigned 32-bit and match a locally computed md5") {
    // md5("abc") = 900150983cd24fb0... -> 0x90015098
    assert(PortableHash32Expr.hash("abc".getBytes("UTF-8")) == 0x90015098L)
    val r = Seq("abc").toDF("s")
      .select(PortableHash.hash32(col("s"))).as[Long].head()
    assert(r == 0x90015098L)
  }

  test("codegen path survives whole-stage compilation (no fallback)") {
    // 100k hashes through the expression in a single codegen'd stage
    val n = spark.range(100000)
      .select(PortableHash.hash32(concat(lit("k"), col("id"))).as("h"))
      .filter(col("h") >= 0L && col("h") < (1L << 32)).count()
    assert(n == 100000L)
  }
}
