package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables._

/** Byte-pair-encoding token accounting over a FIXED, public merge
  * table (Sennrich, Haddow & Birch, "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016): encoding applies the
  * learned merge operations to each word in learned order, exactly as
  * the original subword-nmt reference does. Real pipelines budget,
  * pack, and split by TOKENIZER tokens, not whitespace words — this
  * module re-expresses the packing/budget family over subword counts
  * (VERDICT r6 "What's missing #3").
  *
  * Engine/oracle lockstep by construction: the whole per-word encode
  * is rendered as ONE nested scalar-function chain from the single
  * [[Merges]] list — a literal `replace` per merge over a
  * sentinel-delimited spelling — emitted in both Spark SQL and DuckDB
  * dialects by the same generator, so the two engines cannot drift.
  *
  * The spelling scheme makes literal replace a CORRECT symbol-pair
  * merge: a word is spelled `~c~c~…~c~` (every symbol bounded by the
  * sentinel on both sides), and merge (a,b) is the literal
  * replacement `~a~b~` → `~ab~`. Both boundary sentinels are part of
  * the pattern, so a match witnesses exactly the symbol pair (a,b) —
  * a symbol merely ending in `a` or starting with `b` cannot match —
  * and left-to-right non-overlapping replacement (the shared
  * semantics of JVM, Spark SQL, and DuckDB `replace`) applies the
  * merge greedily along the word, the reference behavior for repeated
  * pairs. The sentinel is stripped from input first, so hostile text
  * cannot forge symbol boundaries. Token count needs no re-split:
  * `sentinel occurrences - 1`, by construction of the spelling.
  *
  * Scale shape: the encode is per-row scalar work (no shuffle, no
  * UDF, no dictionary broadcast), so it streams through the scan stage
  * at any corpus size; the aggregations on top are ordinary
  * partial-agg'd hash aggregates. Since r8 the ENGINE side runs
  * [[graft.functions.BpeKernel]] — a codegen'd custom Expression
  * applying the learned table with the reference min-rank loop,
  * O(symbols × merges applied) per row instead of the replace chain's
  * 2 whole-string scans per merge — while the ORACLE side keeps the
  * literal replace-chain rendering below, generated from the same
  * [[Merges]] table; `BpeLearnSpec` pins the two spellings equal on
  * every corpus document.
  */
object Bpe {
  private type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  /** The merge table, in application order — LEARNED from the corpus
    * (r7's 32-merge hand-written toy replaced per VERDICT r7 #7): 79
    * operations produced by [[BpeLearn]] over `documents.text` at
    * sf0.01, stopped at the first merge where corpus fertility (BPE
    * tokens per whitespace word) reaches 1.30 — real tokenizer sizing;
    * unbounded learning saturates this small-vocabulary corpus at 89
    * merges, where every word becomes ONE token and the token/word
    * distinction the q102 family exists to exercise would vanish (the
    * saturation numbers are recorded in the generated file's header,
    * and `BpeLearnSpec` re-learns the table from the corpus and asserts
    * the baked file matches byte-for-byte). Later merges operate on the
    * symbols earlier merges produced (`jo`+`in` → `join`), the defining
    * property of a BPE merge list — GUARANTEED here by construction of
    * the learner, whose vocabulary state only ever contains single
    * characters and earlier-merge outputs.
    *
    * Two scoping notes on fidelity (ADVICE r7): (1) the encode carries
    * NO end-of-word marker — subword-nmt's `</w>` symbol is omitted,
    * so word-final and word-internal occurrences of a pair merge
    * identically; token COUNTS are what this module budgets by, and
    * they are well-defined without the marker. (2) The in-order
    * exhaustive application below is equivalent to the reference's
    * min-rank loop only for HIERARCHY-VALID merge tables (see above —
    * any learned table qualifies); an arbitrary hand-written table
    * violating that order could merge differently. The same hierarchy
    * validity is what lets the hot path run
    * [[graft.functions.BpeKernel]]'s min-rank loop while the oracles
    * keep the replace-chain rendering — `BpeLearnSpec` proves the two
    * agree on every corpus document and on a synthetic 300-merge
    * table. */
  val Merges: Seq[(String, String)] = graft.functions.BpeMergesLearned.Merges

  /** `~c~c~…~c~` spelling of `wordExpr` (sentinel-stripped first). The
    * capture class is `[\s\S]` — the union is EVERY character in both
    * dialects, unlike `.`, which matches no line terminators in Java
    * and excludes `\n` in RE2 too: with a dot, a `\n` in the text
    * would glue its neighbor characters into one unspelled symbol and
    * (worse) Java and RE2 would disagree on `\r` (code-review r7).
    * The only dialect split in the module: Spark backrefs are `$1`
    * and replace-all is the default; DuckDB backrefs are `\1` and
    * need the `'g'` flag. */
  private def spelled(wordExpr: String, duck: Boolean): String =
    if (duck)
      s"'~' || regexp_replace(replace($wordExpr, '~', ''), '([\\s\\S])', '\\1~', 'g')"
    else
      s"concat('~', regexp_replace(replace($wordExpr, '~', ''), '([\\\\s\\\\S])', '$$1~'))"

  /** One merge applied TWICE, as a literal replace over the spelling.
    * Twice because left-to-right non-overlapping replacement consumes
    * the trailing sentinel of each match — which is also the leading
    * sentinel of an immediately adjacent candidate (`t h t h`: the
    * second pair's `~` is gone), so one pass skips alternating pairs
    * of a run. A skipped candidate is always ISOLATED (it directly
    * follows a match; the pair after it kept its sentinel and
    * matched), and merging (a,b)→ab can never create a new (a,b) pair
    * (ab is strictly longer than a), so the second pass catches every
    * skip and the merge is exhausted — matching the reference's
    * apply-until-none-left semantics for token COUNTS. */
  private def mergePair(acc: String, a: String, b: String): String = {
    val once = s"replace($acc, '~$a~$b~', '~$a$b~')"
    s"replace($once, '~$a~$b~', '~$a$b~')"
  }

  /** The full encode as ONE nested scalar chain — Spark dialect only:
    * Catalyst has no small fixed expression-nesting limit, but
    * DuckDB's binder recursion caps at 128 and a learned-size table
    * (79 merges = 158 nested `replace`s) exceeds it, so the DuckDB
    * oracles apply the same merges as a LAYERED CTE chain instead
    * ([[duckMergeCtes]]) — same generator template ([[mergePair]]),
    * different shape. */
  private def encoded(wordExpr: String,
      table: Seq[(String, String)] = Merges): String =
    table.foldLeft(spelled(wordExpr, duck = false)) {
      case (acc, (a, b)) => mergePair(acc, a, b)
    }

  /** Subword token count of one word, Spark dialect (spec use; the
    * engine's hot path is [[graft.functions.BpeKernel]]). The `table`
    * override exists for `BpeLearnSpec`'s synthetic-table identity
    * proofs. */
  def tokenCountSql(wordExpr: String,
      table: Seq[(String, String)] = Merges): String = {
    val e = encoded(wordExpr, table)
    s"(length($e) - length(replace($e, '~', '')) - 1)"
  }

  /** DuckDB spelling of `expr` for the start of a CTE chain. */
  def duckSpelled(expr: String): String = spelled(expr, duck = true)

  /** DuckDB merge application as a LAYERED CTE chain: `from` must
    * provide the spelled text as column `s` plus the `carry` columns;
    * returns (cteBlock, lastCteName) with every merge applied to `s`.
    * 25 merges (50 nested `replace`s) per layer keeps each layer's
    * expression depth far below DuckDB's 128 binder-recursion cap —
    * the chain grows by LAYERS as the learned table grows, never by
    * nesting depth, so any table size renders. */
  def duckMergeCtes(tag: String, from: String,
      carry: Seq[String]): (String, String) = {
    val chunks = Merges.grouped(25).toVector
    val ctes = chunks.zipWithIndex.map { case (ms, i) =>
      val prev = if (i == 0) from else s"$tag${i - 1}"
      val e = ms.foldLeft("s") { case (acc, (a, b)) => mergePair(acc, a, b) }
      s"$tag$i AS (SELECT ${(carry :+ s"$e AS s").mkString(", ")} FROM $prev)"
    }
    (ctes.mkString(",\n"), s"$tag${chunks.size - 1}")
  }

  /** Token count of a fully-merged spelled column: sentinels − 1. */
  def duckTokensOfSpelled(s: String): String =
    s"(length($s) - length(replace($s, '~', '')) - 1)"

  /** Per-document subword total as ONE whole-text encode — no word
    * explode, no higher-order function (Spark HOFs are
    * CodegenFallback): the entire text is spelled `~c~c~…~c~` with
    * whitespace characters becoming ordinary symbols, and since no
    * merge pair contains whitespace, a merge can never cross a word
    * boundary — the whole-text encode is provably equivalent to
    * encoding each word separately (BpeHtmlSpec re-proves the identity
    * against the word-exploded q102 on real data). Token count =
    * total symbols − whitespace symbols, where whitespace symbols
    * survive the merges untouched and equal the original whitespace
    * char count. Pure codegen'd scalar string functions end to end —
    * the shape that streams a 100 TB corpus through the scan stage.
    * Exposed to sibling modules (q102c joins it onto Dedup's
    * leakage-safe split). */
  // Whitespace chars are counted over the raw text: stripping the
  // sentinel cannot change a whitespace count, so the former
  // stripped-text spelling was two dead whole-text passes (code-review
  // r7). Whitespace is the repo-wide EXPLICIT class `[ \t\n\f\r]`
  // (VERDICT r7 #4): the former bare `\s` meant different sets in Java
  // (includes \x0B) and RE2 (does not) — the explicit class is the
  // RE2-safe intersection, identical in both engines on any input.
  private[graft] def docTokensSpark: String = {
    val e = encoded("text")
    val wsStripped = s"regexp_replace(text, '[ \\\\t\\\\n\\\\f\\\\r]', '')"
    s"(length($e) - length(replace($e, '~', '')) - 1" +
      s" - (length(text) - length($wsStripped)))"
  }

  /** DuckDB whole-text token CTE block: emits CTEs ending in one named
    * `last` (returned) with columns (carry..., wsc, s) where `s` is the
    * fully-merged spelled text and `wsc` the whitespace char count;
    * per-doc tokens = [[duckTokensOfSpelled]]`("s") - wsc` (whitespace
    * symbols survive the merges untouched — no learned symbol contains
    * whitespace — so subtracting them leaves exactly the word
    * subwords). */
  private[graft] def duckDocTokenCtes(tag: String,
      carry: Seq[String]): (String, String) = {
    val sp =
      s"""${tag}sp AS (
         |  SELECT ${(carry :+
          ("(length(text) - length(regexp_replace(text, " +
            "'[ \\t\\n\\f\\r]', '', 'g'))) AS wsc") :+
          s"${duckSpelled("text")} AS s").mkString(", ")}
         |  FROM documents)""".stripMargin
    val (chain, last) = duckMergeCtes(tag, s"${tag}sp", carry :+ "wsc")
    (s"$sp,\n$chain", last)
  }

  /** q113's chunk budget in BPE tokens: a 32-word window at the
    * corpus's learned fertility (1.30 tokens/word at the stop point)
    * averages ~42 subwords, so 40 splits the full-width windows into a
    * real over/under mix instead of flagging all or none. */
  private val ChunkBpeBudget = 40

  val queries: Map[String, Q] = Map(
    // Corpus token accounting in TOKENIZER units: per language, word
    // count, subword token count, and characters — the number a
    // training run actually budgets by (a "1T token" corpus is BPE
    // tokens, not whitespace words). One explode + one partial-agg'd
    // hash aggregation; the encode itself is a codegen-friendly
    // scalar chain on the exploded words.
    "q102_bpe_token_count" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang",
          explode(expr("regexp_extract_all(text, '[^ \\\\t\\\\n\\\\f\\\\r]+', 0)")) as "w")
        .select($"lang",
          graft.functions.BpeKernel.bpeTokens($"w") as "toks",
          length($"w") as "wlen")
        .groupBy($"lang")
        .agg(count(lit(1)) as "words",
          sum($"toks") as "bpe_tokens",
          sum($"wlen") as "chars")
    },

    // q68's greedy sequence packing re-expressed over BPE tokens —
    // the production spelling: context windows are budgeted in
    // tokenizer tokens, so the pack boundaries move relative to the
    // whitespace variant. Same scale argument as q68: the running
    // total is windowed per `source` stratum, never a global ordered
    // cumsum, and the per-doc token total is a no-shuffle scalar.
    "q102b_bpe_pack" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select($"source", $"doc_id",
          graft.functions.BpeKernel.bpeTokens($"text") as "toks")
        .withColumn("cum", sum($"toks").over(w))
        .withColumn("seq_bin", expr("(cum - toks) div 512"))
        .groupBy($"source", $"seq_bin")
        .agg(count(lit(1)) as "docs",
          sum($"toks") as "bpe_tokens",
          min($"doc_id") as "first_doc")
    },

    // q109's sliding-window chunks re-measured in TOKENIZER units
    // (VERDICT r13 #8) — the shape RAG/packing pipelines actually run:
    // an embedding model's context limit is BPE tokens, not whitespace
    // words, so a word-budgeted window can silently overflow it. Each
    // chunk (the SAME window definition as q109, TextOps.chunkTextTable)
    // carries its subword count plus an over-budget flag. Scale shape:
    // chunking is a zero-shuffle scan pipeline and the encode is the
    // codegen'd per-row kernel — the whole query never shuffles.
    "q113_chunk_bpe_budget" -> { (s, dir) =>
      import s.implicits._
      TextOps.chunkTextTable(s, dir)
        .select($"doc_id", $"chunk_idx",
          graft.functions.BpeKernel.bpeTokens($"ctext") as "bpe_toks")
        .withColumn("over_budget",
          ($"bpe_toks" > lit(ChunkBpeBudget)).cast("int"))
    })

  val oracles: Map[String, String] = {
    val (wordChain, wordLast) = duckMergeCtes("b", "sp", Seq("lang", "wlen"))
    val (docChain, docLast) = duckDocTokenCtes("p", Seq("source", "doc_id"))
    Map(
      "q102_bpe_token_count" ->
        s"""WITH w AS (
           |  SELECT lang, unnest(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')) AS w
           |  FROM documents),
           |sp AS (
           |  SELECT lang, length(w) AS wlen, ${duckSpelled("w")} AS s FROM w),
           |$wordChain
           |SELECT lang, count(*) AS words,
           |  CAST(sum(${duckTokensOfSpelled("s")}) AS BIGINT) AS bpe_tokens,
           |  CAST(sum(wlen) AS BIGINT) AS chars
           |FROM $wordLast GROUP BY lang""".stripMargin,
      "q102b_bpe_pack" ->
        s"""WITH $docChain,
           |d AS (
           |  SELECT source, doc_id,
           |    (${duckTokensOfSpelled("s")} - wsc) AS toks
           |  FROM $docLast),
           |c AS (
           |  SELECT source, doc_id, toks,
           |    sum(toks) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM d)
           |SELECT source, CAST((cum - toks) // 512 AS BIGINT) AS seq_bin,
           |  count(*) AS docs,
           |  CAST(sum(toks) AS BIGINT) AS bpe_tokens,
           |  CAST(min(doc_id) AS BIGINT) AS first_doc
           |FROM c GROUP BY 1, 2""".stripMargin,
      "q113_chunk_bpe_budget" -> {
        // The chunk text is whole-text-encoded like q102b's documents:
        // whitespace symbols survive the merges untouched, so chunk
        // tokens = merged symbols − whitespace chars (same identity
        // BpeHtmlSpec pins). The window CTE is TextOps.ChunkTextCte —
        // the ONE chunk definition, shared with the q109/q110 oracles.
        val (chain, last) =
          duckMergeCtes("cb", "cbsp", Seq("doc_id", "chunk_idx", "wsc"))
        s"""WITH ${TextOps.ChunkTextCte},
           |cbsp AS (
           |  SELECT doc_id, chunk_idx,
           |    (length(ctext) - length(regexp_replace(ctext,
           |      '[ \\t\\n\\f\\r]', '', 'g'))) AS wsc,
           |    ${duckSpelled("ctext")} AS s
           |  FROM chunkt),
           |$chain
           |SELECT doc_id, chunk_idx,
           |  CAST(${duckTokensOfSpelled("s")} - wsc AS INT) AS bpe_toks,
           |  CAST((${duckTokensOfSpelled("s")} - wsc) > $ChunkBpeBudget AS INT)
           |    AS over_budget
           |FROM $last""".stripMargin
      })
  }
}
