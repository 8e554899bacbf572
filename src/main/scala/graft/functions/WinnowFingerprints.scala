package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
  * algorithm) as ONE pass over a document's word array: hash every
  * k-gram with md5, slide a w-window over the hash sequence keeping a
  * monotonic deque, emit the DISTINCT window minima as lowercase hex.
  *
  * Element-wise identical to the declarative formulation
  * `array_distinct(transform(sequence(1, m-w+1), i =>
  * array_min(slice(md5_kgrams, i, w))))` and to the DuckDB oracle
  * (`list_distinct(list_transform(generate_series(...), i ->
  * list_min(hs[i:i+w-1])))`): md5-hex strings compare lexicographically
  * exactly as their digest bytes compare unsigned, so minima agree
  * bit-for-bit.
  *
  * Exists because the HOF formulation runs ~w interpreted lambda evals
  * and allocates a fresh w-element array per window — O(n·w) work and
  * ~5M allocations at sf0.1 (97s recorded). This kernel is O(n) total:
  * one digest per k-gram, amortized O(1) deque work per window, zero
  * per-window allocation. CodegenFallback for the same reason as
  * [[MinHashSigs]]: the md5 work dominates, not eval dispatch.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "winnow_fps(words, k, w): k and w must be >= 1")

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
          s"winnow_fps needs an array<string> argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val m = n - k + 1 // number of k-grams
    if (m < w) return new GenericArrayData(Array.empty[Any])

    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      wb(i) = if (s == null) null else s.getBytes
      i += 1
    }

    // One md5 per k-gram, digesting the words and separating spaces
    // directly (no intermediate k-gram string). Null words are skipped
    // WITH their separator — concat_ws semantics, byte-identical to
    // KgramMd5Set on the same input (split() output is never-null, but
    // any array<string> must hash the same in both kernels).
    val md = MinHashSigs.md5.get(); md.reset()
    val digests = new Array[Array[Byte]](m)
    i = 0
    while (i < m) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < k) {
        val wj = wb(i + j)
        if (wj != null) {
          if (wrote) md.update(' '.toByte)
          md.update(wj)
          wrote = true
        }
        j += 1
      }
      digests(i) = md.digest()
      i += 1
    }

    // Monotonic-deque sliding minimum: deque holds indices with strictly
    // increasing digests; front is the window minimum. Each index is
    // pushed and popped at most once — O(m) total.
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[Any]()
    var lastMin = -1
    i = 0
    while (i < m) {
      while (tail > head &&
          !MinHashSigs.unsignedLt(digests(deque(tail - 1)), digests(i))) {
        tail -= 1
      }
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1 && deque(head) != lastMin) {
        lastMin = deque(head)
        val hex = MinHashSigs.toHex(digests(lastMin))
        if (seen.add(hex)) out.add(UTF8String.fromString(hex))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFingerprints {
  /** Distinct winnowing fingerprints of a word array: md5-hex minima of
    * every w-window over the doc's k-gram hash sequence. */
  def winnowFps(words: Column, k: Int, w: Int): Column =
    bridge.column(WinnowFingerprints(bridge.expression(words), k, w))
}
