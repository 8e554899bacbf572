package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Multi-table random-hyperplane LSH signature as a native codegen'd
  * Catalyst expression.
  *
  * For each table t ∈ [0, tables): bucket_t = Σ_b (proj(t·bits+b) ≥ 0)
  * ? 2^b : 0, where proj(p) = Σ_i emb[i]·planes[p·dim+i], accumulated in
  * ascending i order (bit-compatible with the `aggregate(zip_with(...))`
  * formulation and with the DuckDB oracle's sum).
  *
  * Exists because Catalyst neither constant-folds nor codegens
  * higher-order functions: the HOF formulation evaluates tables·bits·dim
  * interpreted lambdas per row (~10M calls at sf0.1). This expression is
  * one tight generated loop over the vector — the preference order of
  * SURVEY.md §7.3 (compose built-ins → custom Expression) applied to the
  * first genuinely hot scalar kernel.
  */
case class HyperplaneBuckets(
    child: Expression,
    tables: Int,
    bits: Int,
    dim: Int)
    extends UnaryExpression {

  // Derived, not a constructor field: an Array field would make the
  // case-class equals/hashCode reference-based, so two identically-
  // parameterized expressions would never be semantically equal and
  // Catalyst could not dedup them (CSE/canonicalization). Memoized per
  // (numPlanes, dim) in the companion; @transient so tasks rebuild the
  // deterministic table instead of shipping 512 doubles per closure.
  @transient private lazy val planes: Array[Double] =
    HyperplaneBuckets.sinPlanes(tables * bits, dim)

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
          s"hyperplane_buckets needs an array<float|double> argument, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_buckets needs array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    // Malformed rows (vector shorter than `dim`) project over the prefix
    // instead of killing the stage with an out-of-bounds read; matches
    // the JVM-side twin `IncrementalIndexes.cellOf`.
    val n = math.min(dim, arr.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var proj = 0.0
        var i = 0
        while (i < n) {
          val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
          proj += x * planes(base + i)
          i += 1
        }
        if (proj >= 0) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    val castD = if (elemIsFloat) "(double) " else ""
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($dim, $c.numElements());
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $proj += $castD$c.$getter($i) * $planesRef[$base + $i];
         |    }
         |    if ($proj >= 0) $bucket |= 1 << $b;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {
  private val planeCache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int), Array[Double]]

  /** Plane p component i = sin((i + p·dim)·9973) — `Math.sin`, identical
    * to Spark's `sin` expression and empirically to DuckDB's. Memoized:
    * every expression instance with the same geometry shares one table. */
  def sinPlanes(numPlanes: Int, dim: Int): Array[Double] =
    planeCache.getOrElseUpdate((numPlanes, dim),
      Array.tabulate(numPlanes * dim) { k =>
        val p = k / dim; val i = k % dim
        math.sin((i + p * dim) * 9973.0)
      })

  def hyperplaneBuckets(e: Column, tables: Int, bits: Int, dim: Int): Column =
    bridge.column(HyperplaneBuckets(bridge.expression(e), tables, bits, dim))
}
