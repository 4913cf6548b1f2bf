package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, PortableHash32Expr}

import graft.functions.PortableHash

/** The custom-Catalyst registration story: SQL function registration,
  * and the optimizer rule that rewrites the built-in md5-prefix chain
  * into the native expression. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("portable_hash32 is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT portable_hash32('abc') AS h").as[Long].head()
    assert(r == 0x90015098L)
  }

  test("the full native-function surface is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT dot_f64(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS dot,
             dist2_f64(array(0d, 0d), array(3d, 4d)) AS d2,
             rolling_hash31('abc') AS rh,
             word_tokens('The  quick   fox') AS toks,
             word_shingles('a b c d', 3) AS sh3,
             word_shingles('a b c d') AS shDefault
    """).collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getLong(2) > 0)
    assert(r.getSeq[String](3) == Seq("the", "quick", "fox"))
    assert(r.getSeq[String](4).toSet == Set("a b c", "b c d"))
    assert(r.getSeq[String](5) == r.getSeq[String](4))
    // cms_estimate probes the built-in aggregate's sketch end-to-end
    val est = spark.sql("""
      SELECT cms_estimate(sk, 'a') AS ea, cms_estimate(sk, 'b') AS eb
      FROM (SELECT count_min_sketch(t, CAST(0.01 AS DOUBLE),
                     CAST(0.99 AS DOUBLE), 42) AS sk
            FROM (SELECT explode(array('a','a','a','b')) AS t))
    """).collect()(0)
    assert(est.getLong(0) >= 3L && est.getLong(1) >= 1L)
    // and they agree with the Column-API forms the operators use
    val viaSql = spark.sql("SELECT word_shingles('x y z w', 2) AS s")
      .collect()(0).getSeq[String](0).toSet
    val viaCol = Seq("x y z w").toDF("t")
      .select(graft.operators.Dedup.shingles(col("t"), 2).as("s"))
      .collect()(0).getSeq[String](0).toSet
    assert(viaSql == viaCol)
  }

  test("optimizer rule rewrites the built-in chain to the native expression") {
    GraftFunctions.installOptimization(spark)
    // non-foldable input: literal strings would be constant-folded into
    // a LocalRelation before the rule could show its work
    val df = spark.range(2)
      .select(concat(lit("k"), col("id").cast("string")).as("s"))
      .select(PortableHash.hash32Builtin(col("s")).as("h"))
    val optimized = df.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists {
      case _: PortableHash32Expr => true
      case _ => false
    })
    assert(rewritten, s"expected PortableHash32Expr in:\n$optimized")
    // and the rewritten plan still computes the same values
    assert(df.as[Long].collect().toSeq ==
      Seq("k0", "k1").map(s => PortableHash32Expr.hash(s.getBytes("UTF-8"))))
  }

  test("GraftExtensions wires a fresh session via Builder.withExtensions") {
    // (the spark.sql.extensions CONFIG route is static — it only takes
    // effect when the SparkContext is first created, i.e. at cluster
    // launch; in-JVM tests use the equivalent Builder.withExtensions)
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql("SELECT portable_hash32('abc') AS h")
        .collect()(0).getLong(0)
      assert(r == 0x90015098L)
      // the injected optimizer rule is active in the new session
      val df = s2.range(1)
        .select(concat(lit("k"), col("id").cast("string")).as("s"))
        .select(PortableHash.hash32Builtin(col("s")).as("h"))
      assert(df.queryExecution.optimizedPlan.expressions.exists(_.exists {
        case _: PortableHash32Expr => true
        case _ => false
      }))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
