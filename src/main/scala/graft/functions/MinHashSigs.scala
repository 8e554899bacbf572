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
  * array, with ONE digest per shingle (not one per shingle×seed).
  *
  * Per shingle x: md5(x) once; h1 = big-endian uint64 of digest bytes
  * 0-7, h2 = big-endian uint64 of bytes 8-15. Slot k's hash of x is the
  * classic double-hashing family (Kirsch–Mitzenmacher, "Less Hashing,
  * Same Performance"): g_k(x) = h1 + k·h2 (mod 2^64). Slot k of the
  * signature = min over shingles of g_k(x), emitted as 16-char lowercase
  * hex (unsigned numeric order == fixed-width hex string order, so
  * downstream string `min`/banding semantics are unchanged).
  *
  * Element-wise identical to the DuckDB oracle formulation
  * {{{
  *   list_min(list_transform(sh, x -> lower(lpad(to_hex(
  *     ((('0x'||substr(md5(x),1,16))::UBIGINT::HUGEINT
  *       + k * ('0x'||substr(md5(x),17,16))::UBIGINT::HUGEINT)
  *      % 18446744073709551616::HUGEINT)::UBIGINT), 16, '0'))))
  * }}}
  * (see `ops/Dedup.mhSql`).
  *
  * Exists because per-seed digesting made md5 the suite's dominant CPU
  * cost: the r4 form ran numHashes digests per shingle and was the
  * single most throttle-amplified computation in the bench (q26 at 416s
  * vs ~1.7s normal under the driver's CPU quota, VERDICT r4 #2). Now a
  * shingle costs one digest plus numHashes adds/compares — the per-perm
  * work is integer arithmetic, not hashing. CodegenFallback: the body is
  * already a tight loop; the remaining md5-per-shingle dominates, not
  * the eval dispatch.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  /** Analysis-time type validation — a wrong-typed SQL argument must be
    * an AnalysisException, not a per-row ClassCastException. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs needs an array<string> argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MinHashSigs.md5.get(); md.reset()
    val mins = new Array[Long](numHashes)
    var any = false
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i)
      if (sh != null) {
        md.reset()
        val digest = md.digest(sh.getBytes)
        var h1 = 0L
        var h2 = 0L
        var j = 0
        while (j < 8) {
          h1 = (h1 << 8) | (digest(j) & 0xffL)
          h2 = (h2 << 8) | (digest(j + 8) & 0xffL)
          j += 1
        }
        // v walks h1 + k·h2 incrementally; Java long addition IS the
        // mod-2^64 wrap the contract specifies.
        var v = h1
        var k = 0
        if (!any) {
          while (k < numHashes) { mins(k) = v; v += h2; k += 1 }
          any = true
        } else {
          while (k < numHashes) {
            if (java.lang.Long.compareUnsigned(v, mins(k)) < 0) mins(k) = v
            v += h2
            k += 1
          }
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes))
    else new GenericArrayData(
      mins.map(m => UTF8String.fromString(MinHashSigs.toHex64(m)): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  private val HexChars = "0123456789abcdef".toCharArray

  /** One MD5 instance per thread, shared by the three digest kernels
    * (this, [[KgramMd5Set]], [[WinnowFingerprints]]): `getInstance`
    * does a JCA provider lookup + allocation, a measurable per-ROW tax
    * on the suite's hottest stages. Callers must `reset()` before
    * first use (digest() leaves the instance reset, but a prior
    * caller may have aborted mid-update). */
  private[graft] val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

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

  /** 16-char zero-padded lowercase hex of an unsigned 64-bit value. */
  def toHex64(v: Long): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 16) {
      out(15 - i) = HexChars(((v >>> (4 * i)) & 0xfL).toInt)
      i += 1
    }
    new String(out)
  }

  def minhashSigs(sh: Column, numHashes: Int): Column =
    bridge.column(MinHashSigs(bridge.expression(sh), numHashes))
}
