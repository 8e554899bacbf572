package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Stable, case-insensitive string hash → bucket id, as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantics follow the reference's bucket assignment
  * (`MapReduce/Executer.cs:295-303`): fold a multiplicative hash over the
  * upper-cased characters of the document id, take the absolute value,
  * and mod into a fixed bucket space (65,536 = 256² by default). The
  * exact bit pattern of the C# hash is NOT reproduced (capability parity
  * only needs *a* stable culture-invariant case-insensitive hash); what
  * is preserved: stability across runs/JVMs, case-insensitivity, and the
  * bucket-space shape that bounds incremental re-reduce cost.
  */
object StableBucketHash {
  val DefaultBuckets: Int = 256 * 256

  /** Scalar implementation — single source of truth for tests; the
    * codegen below mirrors it exactly. */
  def hash(s: String, buckets: Int): Int = {
    var h = 17
    var i = 0
    while (i < s.length) {
      h = (h * 397) ^ Character.toUpperCase(s.charAt(i)).toInt
      i += 1
    }
    val a = if (h == Int.MinValue) 0 else math.abs(h)
    a % buckets
  }

  def stableBucket(c: Column, buckets: Int = DefaultBuckets): Column =
    bridge.column(StableBucket(bridge.expression(c), buckets))
}

case class StableBucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 1, s"stable_bucket: numBuckets must be >= 1, got $buckets")

  override def dataType: DataType = IntegerType

  /** Analysis-time type validation — a wrong-typed SQL argument must be
    * an AnalysisException, not a per-row ClassCastException. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"stable_bucket needs a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    StableBucketHash.hash(input.asInstanceOf[UTF8String].toString, buckets)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val str = ctx.freshName("str")
      val a = ctx.freshName("a")
      s"""
         |String $str = $c.toString();
         |int $h = 17;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h = ($h * 397) ^ (int) Character.toUpperCase($str.charAt($i));
         |}
         |int $a = ($h == Integer.MIN_VALUE) ? 0 : java.lang.Math.abs($h);
         |${ev.value} = $a % $buckets;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "stable_bucket"
}
