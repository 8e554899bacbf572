package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Multi-probe cell expansion for hyperplane-quantized IVF search: the
  * vector's own cell plus the cell with the LEAST-CONFIDENT bit flipped
  * (the hyperplane whose projection margin |Σ emb·plane| is smallest —
  * the standard multi-probe LSH perturbation order, probing the
  * neighboring Voronoi cell the vector most nearly fell into).
  *
  * Returns array(cell, cell ^ (1 << weakestBit)). Projections use the
  * same `sinPlanes` family and ascending-index double accumulation as
  * [[HyperplaneBuckets]], so cell 0 here == probe-1's cell and the
  * DuckDB oracle reproduces both bit-for-bit. Ties on |margin| keep the
  * lowest bit index (strict `<` while scanning ascending bits) — the
  * oracle orders by (abs(proj), bit) for the same determinism.
  *
  * One codegen'd pass over the vector (bits × dim multiply-adds), like
  * its sibling; short vectors project over their prefix.
  */
case class HyperplaneProbes(
    child: Expression,
    bits: Int,
    dim: Int)
    extends UnaryExpression {

  // Derived, not a constructor field — see [[HyperplaneBuckets]]: value-
  // based equality keeps Catalyst CSE working, and the memoized table
  // is shared across expression instances.
  @transient private lazy val planes: Array[Double] =
    HyperplaneBuckets.sinPlanes(bits, dim)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Analysis-time type validation — a wrong-typed SQL argument must be
    * an AnalysisException, not a codegen-time failure. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_probes needs an array<float|double> argument, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_probes needs array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = math.min(dim, arr.numElements())
    var cell = 0
    var weakBit = 0
    var weakAbs = Double.MaxValue
    var b = 0
    while (b < bits) {
      val base = b * dim
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * planes(base + i)
        i += 1
      }
      if (proj >= 0) cell |= 1 << b
      val a = math.abs(proj)
      if (a < weakAbs) { weakAbs = a; weakBit = b }
      b += 1
    }
    new GenericArrayData(Array(cell, cell ^ (1 << weakBit)))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val castD = if (elemIsFloat) "(double) " else ""
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cell = ctx.freshName("cell")
      val weakBit = ctx.freshName("weakBit")
      val weakAbs = ctx.freshName("weakAbs")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val base = ctx.freshName("base")
      val a = ctx.freshName("a")
      s"""
         |int $n = java.lang.Math.min($dim, $c.numElements());
         |int $cell = 0;
         |int $weakBit = 0;
         |double $weakAbs = Double.MAX_VALUE;
         |for (int $b = 0; $b < $bits; $b++) {
         |  int $base = $b * $dim;
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += $castD$c.$getter($i) * $planesRef[$base + $i];
         |  }
         |  if ($proj >= 0) $cell |= 1 << $b;
         |  double $a = java.lang.Math.abs($proj);
         |  if ($a < $weakAbs) { $weakAbs = $a; $weakBit = $b; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new int[] { $cell, $cell ^ (1 << $weakBit) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_probes"
}

object HyperplaneProbes {
  /** Probe-2 cells using the same plane family as
    * [[HyperplaneBuckets.sinPlanes]] with tables = 1. */
  def hyperplaneProbes(e: Column, bits: Int, dim: Int): Column =
    bridge.column(HyperplaneProbes(bridge.expression(e), bits, dim))
}
