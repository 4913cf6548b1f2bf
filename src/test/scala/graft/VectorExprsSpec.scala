package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Dist2F64Expr, DotF64Expr}

/** Differential contract: the native dot_f64 / dist2_f64 expressions
  * must be BIT-identical to the interpreted higher-order forms they
  * replace (which the DuckDB oracle's list_dot_product mirrors) —
  * including null/length-mismatch semantics. */
class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def composedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  private def composedDist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)

  /** Deterministic pseudo-random vectors, including denormals-adjacent
    * magnitudes where fold order matters most. */
  private def vecs(n: Int, dim: Int): Seq[Seq[Double]] =
    (0 until n).map { i =>
      (0 until dim).map { j =>
        val h = (i * 7919 + j * 104729) % 10007
        (h - 5003).toDouble / 97d * math.pow(10, (h % 7) - 3)
      }
    }

  test("dot_f64 / dist2_f64 bit-equal the composed fold on random vectors") {
    val pairs = vecs(40, 64).grouped(2).map(p => (p(0), p(1))).toSeq
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      DotF64Expr(col("a"), col("b")).as("nd"),
      composedDot(col("a"), col("b")).as("cd"),
      Dist2F64Expr(col("a"), col("b")).as("n2"),
      composedDist2(col("a"), col("b")).as("c2")).collect()
    rows.foreach { r =>
      // bit-level equality, not approximate: same IEEE ops in same order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("null semantics mirror the composed form") {
    val df = Seq(
      (Some(Seq(1d, 2d)), Some(Seq(3d, 4d))),     // plain
      (Some(Seq(1d, 2d)), Some(Seq(3d))),          // length mismatch
      (None: Option[Seq[Double]], Some(Seq(1d))),  // null array
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))) // empty → 0.0
      .toDF("a", "b")
    val rows = df.select(
      DotF64Expr(col("a"), col("b")).as("nd"),
      composedDot(col("a"), col("b")).as("cd"),
      Dist2F64Expr(col("a"), col("b")).as("n2"),
      composedDist2(col("a"), col("b")).as("c2")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null mismatch: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"dist2 null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3))
    }
    // null ELEMENT inside an array → null result, like the fold
    val withNullElem = spark.sql(
      "SELECT array(1.0d, cast(null as double)) a, array(2.0d, 3.0d) b")
    val r2 = withNullElem.select(
      DotF64Expr(col("a"), col("b")).as("nd"),
      composedDot(col("a"), col("b")).as("cd")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("codegen and interpreted paths agree") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Any](1.5d, -2d, 3d))
    val b = new GenericArrayData(Array[Any](4d, 0.5d, 2d))
    assert(DotF64Expr.compute(a, b) == 1.5 * 4 + -2 * 0.5 + 3 * 2)
    assert(Dist2F64Expr.compute(a, b) ==
      2.5 * 2.5 + 2.5 * 2.5 + 1d)
    // and through a full codegen'd projection
    val got = Seq((Seq(1.5, -2.0, 3.0), Seq(4.0, 0.5, 2.0)))
      .toDF("a", "b")
      .select(DotF64Expr(col("a"), col("b"))).as[Double].collect()(0)
    assert(got == 11.0)
  }
}
