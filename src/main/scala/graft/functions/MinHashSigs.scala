package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` MinHash signature slots in ONE pass over the shingle
  * array: slot k = min over shingles of md5("k:" ++ shingle), as
  * lowercase hex — element-wise identical to the
  * `array_min(transform(sh, x => md5(concat(k, ':', x))))` formulation
  * and to DuckDB `list_min(list_transform(sh, x -> md5(k || ':' || x)))`.
  *
  * Exists because the HOF formulation re-walks the shingle array once per
  * seed with per-element interpreted lambdas and intermediate arrays
  * (numHashes·|sh| lambda calls + allocations per row); here one loop
  * digests each shingle for all seeds with a reused MessageDigest.
  * CodegenFallback: the body is already a tight loop; the md5 work
  * dominates, not the eval dispatch.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      if (sh != null) {
        val shBytes = sh.getBytes
        var k = 0
        while (k < numHashes) {
          md.reset()
          md.update(s"$k:".getBytes("UTF-8"))
          md.update(shBytes)
          val hex = MinHashSigs.toHex(md.digest())
          if (mins(k) == null || hex.compareTo(mins(k)) < 0) mins(k) = hex
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  private val HexChars = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def minhashSigs(sh: Column, numHashes: Int): Column =
    bridge.column(MinHashSigs(bridge.expression(sh), numHashes))
}
