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

  // Seed prefixes ("0:", "1:", …) computed once per task, not per shingle.
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(k => s"$k:".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    // Track minima as raw digest bytes (unsigned-lexicographic order ==
    // lowercase-hex string order); hex-encode only the final winners —
    // avoids one 32-char String per (shingle, seed).
    val mins = Array.fill[Array[Byte]](numHashes)(null)
    val scratch = new Array[Byte](16)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      if (sh != null) {
        val shBytes = sh.getBytes
        var k = 0
        while (k < numHashes) {
          md.reset()
          md.update(seedPrefixes(k))
          md.update(shBytes)
          md.digest(scratch, 0, 16)
          if (mins(k) == null || MinHashSigs.unsignedLt(scratch, mins(k))) {
            if (mins(k) == null) mins(k) = new Array[Byte](16)
            System.arraycopy(scratch, 0, mins(k), 0, 16)
          }
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(MinHashSigs.toHex(m))))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  private val HexChars = "0123456789abcdef".toCharArray

  def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

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
