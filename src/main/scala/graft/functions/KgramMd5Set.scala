package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT md5-hex word k-gram shingles of a document, in first-
  * occurrence order — element-wise identical to the declarative
  * `array_distinct(transform(sequence(0, n-k), i => md5(concat_ws(" ",
  * words[i+1..i+k]))))` and to the DuckDB spelling
  * `list_distinct(list_transform(generate_series(1, len(w)-k+1),
  * i -> md5(w[i] || ' ' || ... || w[i+k-1])))`.
  *
  * Exists for the same reason as [[WinnowFingerprints]]: the HOF
  * formulation evaluates an interpreted lambda per k-gram, allocates a
  * fresh concat string and a fresh MessageDigest per element, and then
  * array_distinct re-compares the results pairwise. The shingle
  * queries (decontamination q66/q70, duplicate-shingle rate q69) spend
  * most of their time there — this kernel is one digest per k-gram
  * with zero intermediate strings (spaces fed to the digest directly)
  * and a hash-set distinct. CodegenFallback: md5 dominates, not eval
  * dispatch.
  *
  * Callers keep the `size(words) >= k` guard OUT of the kernel for
  * plan-level symmetry with the declarative form (where it protects
  * `sequence`'s downward-run hazard); the kernel itself just returns
  * empty when there is no complete k-gram.
  */
case class KgramMd5Set(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "kgram_md5_set(words, k): k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Analysis-time type validation — a wrong-typed SQL argument must be
    * an AnalysisException, not a per-row ClassCastException. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kgram_md5_set needs an array<string> argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val m = n - k + 1 // number of k-grams
    if (m <= 0) return new GenericArrayData(Array.empty[Any])

    // null elements are SKIPPED along with their separator, exactly like
    // concat_ws — `concat_ws(" ", "a", NULL)` is "a", not "a " — so the
    // kernel stays element-wise identical to the declarative form for
    // any array<string> input, not just never-null split() output.
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      wb(i) = if (s == null) null else s.getBytes
      i += 1
    }

    val md = MinHashSigs.md5.get(); md.reset()
    val seen = if (distinct) new java.util.HashSet[String]() else null
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < m) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < k) {
        val w = wb(i + j)
        if (w != null) {
          if (wrote) md.update(' '.toByte)
          md.update(w)
          wrote = true
        }
        j += 1
      }
      val hex = MinHashSigs.toHex(md.digest())
      if (seen == null || seen.add(hex)) out.add(UTF8String.fromString(hex))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String =
    if (distinct) "kgram_md5_set" else "kgram_md5_list"
}

object KgramMd5Set {
  /** Distinct md5-hex k-gram shingles of a word array. */
  def kgramMd5Set(words: Column, k: Int): Column =
    bridge.column(KgramMd5Set(bridge.expression(words), k))

  /** ALL md5-hex k-grams in order, duplicates kept — for frequency
    * analyses (q67) where the multiset matters and the 32-char hex is a
    * cheaper shuffle key than the raw gram text. */
  def kgramMd5List(words: Column, k: Int): Column =
    bridge.column(KgramMd5Set(bridge.expression(words), k, distinct = false))
}
