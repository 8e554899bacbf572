package graft.ops

/** Deterministic BPE merge-table learning (Sennrich, Haddow & Birch,
  * ACL 2016 — the `learn_bpe` half of subword-nmt, same scoping as the
  * encode in [[Bpe]]: no end-of-word marker, symbols are characters).
  *
  * The learner is a PURE function of a word-count map so the baked
  * table's provenance is testable: `BpeLearnSpec` re-runs it over the
  * same corpus and asserts the generated source file
  * ([[graft.functions.BpeMergesLearned]]) matches byte-for-byte. The
  * `graft.tools.LearnBpe` main regenerates that file.
  *
  * Determinism: pair counts are exact longs; the argmax tie-break is
  * lexicographic on (left, right). Iteration order of the underlying
  * hash maps never reaches the result.
  *
  * Two exclusions, both deterministic and documented at the call site:
  *   - the sentinel `~` is stripped from words BEFORE learning, exactly
  *     as [[Bpe.spelled]] strips it before encoding — the learner must
  *     see the same symbol streams the encoder will;
  *   - candidate pairs whose symbols contain `'` or `\` are skipped, so
  *     every learned symbol can be rendered as a single-quoted SQL
  *     literal identically in Spark SQL and DuckDB without entering the
  *     two dialects' (different) escape rules. On natural-language
  *     corpora the top pairs are letter sequences and the exclusion is
  *     almost always vacuous.
  *
  * By construction the learned table is HIERARCHY-VALID — each merge's
  * operands are single characters or outputs of strictly earlier merges
  * (the vocabulary state only ever contains those) — which is exactly
  * the precondition under which [[Bpe]]'s in-order exhaustive
  * replace-chain rendering and the min-rank loop in
  * [[graft.functions.BpeKernel]] agree (see the notes on
  * [[Bpe.Merges]]).
  */
object BpeLearn {

  private def bad(sym: String): Boolean =
    sym.exists(c => c == '\'' || c == '\\')

  /** Greedy left-to-right application of one merge to a symbol
    * sequence — the same non-overlapping semantics as a literal
    * `replace` over the sentinel spelling. */
  private[ops] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn merges until the corpus-weighted FERTILITY (BPE tokens per
    * whitespace word) first reaches `targetFertility`, up to `maxN`.
    *
    * Why a fertility target and not a fixed n: real tokenizers are
    * sized so that common words are single tokens and rarer ones split
    * (fertility ~1.1–1.4 on their training corpus). This corpus's
    * vocabulary is small enough that unbounded learning SATURATES —
    * every word becomes one symbol and token counts degenerate to word
    * counts, erasing exactly the tokenizer-vs-whitespace distinction
    * the q102 family exists to exercise. The fertility stop is the
    * deterministic, principled cut: measured on sf0.01, saturation is
    * 89 merges (fertility 1.0); the 1.30 target stops at the merge
    * count that keeps the subword structure real. */
  def learnToFertility(wordCounts: Map[String, Long],
      targetFertility: Double, maxN: Int): Vector[(String, String)] = {
    val all = learnTrace(wordCounts, maxN)
    val cut = all.indexWhere(_._2 <= targetFertility)
    (if (cut < 0) all else all.take(cut + 1)).map(_._1)
  }

  /** Learn up to `n` merges; returns each merge with the corpus
    * fertility AFTER applying it. Stops early when no countable pair
    * remains (saturation). */
  def learnTrace(wordCounts: Map[String, Long],
      n: Int): Vector[((String, String), Double)] = {
    val words = wordCounts.valuesIterator.sum.toDouble
    var trace = Vector.empty[((String, String), Double)]
    learnImpl(wordCounts, n, (m, totalSyms) =>
      trace :+= (m, totalSyms / words))
    trace
  }

  /** Learn up to `n` merges from `wordCounts`. Stops early if no
    * countable pair remains (tiny corpora). */
  def learn(wordCounts: Map[String, Long], n: Int): Vector[(String, String)] =
    learnTrace(wordCounts, n).map(_._1)

  private def learnImpl(wordCounts: Map[String, Long], n: Int,
      emit: ((String, String), Long) => Unit): Unit = {
    var vocab: Array[(Array[String], Long)] = wordCounts.iterator
      .map { case (w, c) => (w.replace("~", ""), c) }
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .toArray
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          if (!bad(p._1) && !bad(p._2))
            counts.merge(p, c, (x, y) => x + y)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && pairOrdering.compare(p, best._1) < 0))
            best = (p, c)
        }
        val (a, b) = best._1
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, a, b), c) }
        emit((a, b), vocab.iterator
          .map { case (syms, c) => syms.length * c }.sum)
        k += 1
      }
    }
  }

  private val pairOrdering: Ordering[(String, String)] =
    Ordering.Tuple2(Ordering.String, Ordering.String)

  /** Render the learned table as the generated Scala source file. The
    * header records the exact inputs so a reader can reproduce it with
    * the `graft.tools.LearnBpe` main. */
  def renderScala(merges: Seq[(String, String)], corpus: String,
      note: String = ""): String = {
    def lit(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""
    val rows = merges.grouped(4).map(g =>
      "    " + g.map { case (a, b) => s"${lit(a)} -> ${lit(b)}" }
        .mkString(", ")).mkString(",\n")
    s"""package graft.functions
       |
       |// GENERATED by `graft.tools.LearnBpe` — do not edit by hand.
       |// Learned from $corpus by graft.ops.BpeLearn.learn
       |// (n = ${merges.size}, words = `[^ \\t\\n\\f\\r]+` over `text`,
       |// sentinel `~` stripped, tie-break lexicographic).${
         if (note.isEmpty) "" else s"\n// $note"}
       |// BpeLearnSpec re-learns from the same corpus and asserts the
       |// baked table below equals the learner's output.
       |object BpeMergesLearned {
       |  val Merges: Vector[(String, String)] = Vector(
       |$rows)
       |}
       |""".stripMargin
  }
}
