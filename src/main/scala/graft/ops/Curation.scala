package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Tables._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization: benchmark decontamination,
  * repetition gating (Gopher-style), sequence packing, and cross-corpus
  * duplicate-shingle measurement. North-star extensions beyond the
  * reference surface (BASELINE.json), same ground rules as
  * [[TextOps]]: codegen'd built-ins only, exact integer arithmetic (the
  * only doubles are single divisions of exact ints), and a DuckDB
  * oracle per query.
  */
object Curation {

  private[ops] def words(c: Column): Column = split(c, "[ \\t\\n\\f\\r]+")

  /** Distinct md5'd word k-grams of a document — the codegen-era kernel
    * [[graft.functions.KgramMd5Set]], element-wise identical to the
    * declarative `array_distinct(transform(sequence(0, n-k), i =>
    * md5(concat_ws(" ", ...))))` it replaced (which ran an interpreted
    * lambda + fresh digest per k-gram and dominated q66/q69/q70).
    * Callers must still guard `size(words) >= k`, mirroring the oracle's
    * `len(w) >= k` filter. */
  private def kgramSet(ws: Column, k: Int): Column =
    graft.functions.KgramMd5Set.kgramMd5Set(ws, k)

  /** `(doc_id, sh)` — every document exploded into its distinct word
    * k-gram shingles. The SINGLE definition of "shingle" shared by q66
    * and the bloom-prefiltered q70 (`Sketches`): both queries promise
    * bit-identical results, so the shingle spelling must not be able to
    * drift between them. */
  private[ops] def shingleStream(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ws = words($"text")
    t(s, dir, "documents")
      .where(size(ws) >= k)
      .select($"doc_id", explode(kgramSet(ws, k)) as "sh")
  }

  /** Memoized (3-gram shingle stream with source, corpus frequency
    * table) per (session, dir), both barriered — q69, q84, and the
    * funnel's dup gate (q87) consume the same two tables; without the
    * cache each re-ran the explode AND the frequency aggregation.
    * Read-only reuse, same pattern as `Dedup.sigTables`. */
  private val freq3Cache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  // Shared-build surface (VERDICT r8 #1): membership checks for the
  // bench's warm section.
  private[ops] def freq3Built(
      s: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    freq3Cache.contains((s, dir))
  private[ops] def fluencyBuilt(
      s: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    fluencyCache.contains((s, dir))

  /** Drop this session's memoized tables (see [[SessionCaches.evict]]).
    * Their persisted blocks are released by Dedup's barrier registry —
    * every persist in this module goes through `Dedup.barrier`. */
  private[ops] def evictSession(
      s: org.apache.spark.sql.SparkSession): Unit = {
    Memo.evictOwner(freq3Cache, s)(_ => ())
    Memo.evictOwner(fluencyCache, s)(_ => ())
  }

  /** Memoized cross-query artifacts to keep persisted between queries
    * (see [[Dedup.pinnedArtifacts]]). */
  private[ops] def pinnedArtifacts(s: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.DataFrame] =
    freq3Cache.collect { case ((o, _), v) if o eq s => Seq(v._1, v._2) }
      .flatten.toSeq ++
      fluencyCache.collect { case ((o, _), v) if o eq s => v }

  private[ops] def shingleFreq3(s: org.apache.spark.sql.SparkSession,
      dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    // Staleness checks BOTH members (ADVICE r6): a targeted unpersist
    // of only the freq table must not keep serving a half-cold pair.
    Memo.memoFresh(freq3Cache, (s, dir))(v =>
        v._1.storageLevel == org.apache.spark.storage.StorageLevel.NONE ||
        v._2.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      import s.implicits._
      val ws = words($"text")
      val sh = Dedup.barrier(t(s, dir, "documents")
        .where(size(ws) >= 3)
        .select($"doc_id", $"source", explode(kgramSet(ws, 3)) as "sh"))
      val freq = Dedup.barrier(
        sh.groupBy($"sh").agg(count(lit(1)) as "ndocs"))
      (sh, freq)
    }

  private val fluencyCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]

  /** q83's pipeline body, shared with q96's composite rank — memoized
    * and barriered like [[shingleFreq3]]: the gram table feeds both the
    * frequency aggregation and the join-back (two scans of the 2-gram
    * md5 explode without the barrier), and q96 reuses the whole result
    * after q83 computed it. */
  private[ops] def bigramFluency(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.memoFresh(fluencyCache, (s, dir))(
        _.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      import s.implicits._
      val ws = words($"text")
      val grams = Dedup.barrier(t(s, dir, "documents")
        .where(size(ws) >= 2)
        .select($"doc_id",
          explode(graft.functions.KgramMd5Set.kgramMd5List(ws, 2)) as "gram"))
      val freq = grams.groupBy($"gram").agg(count(lit(1)) as "cf")
      Dedup.barrier(grams.join(freq, "gram")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "n_bigrams",
          sum($"cf") as "freq_sum",
          min($"cf") as "rarest")
        .select($"doc_id", $"n_bigrams", $"freq_sum", $"rarest",
          ($"freq_sum".cast("double") / $"n_bigrams") as "avg_bigram_freq"))
    }

  /** The decontamination oracle — shared verbatim by q66 and q70 (the
    * bloom stage only prunes; the exact join decides, so both queries
    * have the same answer by construction). */
  private[ops] val decontaminationOracle: String =
    """WITH ws AS (
      |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 3),
      |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |             w[i+3])))) AS sh
      |  FROM ws WHERE len(w) >= 4),
      |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0)
      |SELECT train.doc_id, count(*) AS contaminated_shingles
      |FROM train JOIN ev USING (sh)
      |GROUP BY train.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    // Benchmark decontamination: find training documents that share any
    // word 4-gram with a held-out evaluation slice (here: doc_id % 97 —
    // a stand-in for "the benchmark's questions"). Both sides shingle
    // identically; the eval side is DISTINCT + broadcast — an eval set
    // is thousands of documents while the training corpus is the 100 TB
    // side, so the probe never shuffles the big side and the scan
    // streams once. Output: every contaminated training doc with its
    // overlapping-shingle count (the evidence a filter step acts on).
    "q66_decontaminate" -> { (s, dir) =>
      import s.implicits._
      val sh = shingleStream(s, dir, 4)
      val eval5 = sh.where($"doc_id" % 97 === 0).select($"sh").distinct()
      sh.where($"doc_id" % 97 =!= 0)
        .join(broadcast(eval5), "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "contaminated_shingles")
    },

    // Repetition gate (Gopher-style, Rae et al. 2021 table A1): a doc
    // whose single most common bigram covers too much of the text is
    // boilerplate/spam. Per doc: the top bigram's count, distinct and
    // total bigrams, the top-bigram fraction, and the gate verdict. The
    // gate compares integers (top*5 <= total ⇔ fraction ≤ 0.2) so the
    // verdict never rides on float rounding. Two hash aggregations on
    // (doc_id, gram) then doc_id — both partial-agg'd map-side.
    "q67_repetition_gate" -> { (s, dir) =>
      import s.implicits._
      val ws = words($"text")
      // Bigrams as md5 hashes, not strings: only counts survive to the
      // output, and count-by-md5 ≡ count-by-gram (the kernel keeps
      // duplicates; the 32-char key shuffles cheaper than raw text).
      val grams = t(s, dir, "documents")
        .where(size(ws) >= 2)
        .select($"doc_id",
          explode(graft.functions.KgramMd5Set.kgramMd5List(ws, 2)) as "gram")
      grams.groupBy($"doc_id", $"gram").agg(count(lit(1)) as "cnt")
        .groupBy($"doc_id")
        .agg(max($"cnt") as "top_bigram",
          count(lit(1)) as "distinct_bigrams",
          sum($"cnt") as "total_bigrams")
        .select($"doc_id", $"top_bigram", $"distinct_bigrams", $"total_bigrams",
          ($"top_bigram".cast("double") / $"total_bigrams") as "top_fraction",
          ($"top_bigram" * 5 <= $"total_bigrams") as "passes")
    },

    // Sequence packing: assign documents to fixed-token-budget training
    // sequences (512 tokens) in deterministic doc_id order WITHIN each
    // source shard, then report per-bin fill. The cumulative sum is a
    // window per `source` — strata count scales with the number of
    // ingest shards, so the sort is per-stratum, never global (a global
    // ordered cumsum would serialize 100 TB through one partition).
    // bin = tokens-before-this-doc div 512: the greedy "start a new
    // sequence when the budget is crossed" rule, integer-exact.
    "q68_pack_sequences" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select($"source", $"doc_id",
          size(regexp_extract_all($"text", lit("[^ \\t\\n\\f\\r]+"), lit(0))) as "toks")
        .withColumn("cum", sum($"toks").over(w))
        .withColumn("seq_bin", expr("(cum - toks) div 512"))
        .groupBy($"source", $"seq_bin")
        .agg(count(lit(1)) as "docs",
          sum($"toks") as "tokens",
          min($"doc_id") as "first_doc")
    },

    // PII scrubbing: regex detection + masking of emails/phone tokens,
    // the pre-training redaction pass. The synthetic corpus has no
    // organic PII, so the query INJECTS it deterministically first
    // (doc_id-derived — same honest-synthesis pattern as the multimodal
    // payloads); everything after injection is the production path:
    // codegen'd regexp_count/regexp_replace per row, zero shuffles, the
    // shape that streams a 100 TB corpus through the scan stage. Output
    // pins both the counts and the md5 of the scrubbed text, so a
    // masking regression cannot hide behind matching counts.
    "q79_pii_scrub" -> { (s, dir) =>
      import s.implicits._
      val withEmail = when($"doc_id" % 5 === 0,
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@example.com now"))).otherwise($"text")
      val injected = when($"doc_id" % 11 === 0,
        concat(withEmail, lit(" call 555-"), $"doc_id", lit(" today")))
        .otherwise(withEmail)
      val emailPat = "[a-z0-9]+@[a-z]+\\.com"
      val phonePat = "555-[0-9]+"
      t(s, dir, "documents")
        .select($"doc_id", injected as "t")
        .select($"doc_id",
          regexp_count($"t", lit(emailPat)) as "emails",
          regexp_count($"t", lit(phonePat)) as "phones",
          md5(regexp_replace(regexp_replace($"t", emailPat, "[EMAIL]"),
            phonePat, "[PHONE]")) as "clean_md5")
    },

    // Exact repeated-span scrubbing (the span-level cousin of Lee et
    // al. 2022's substring dedup): chunk every document into fixed
    // 10-word spans, drop each span whose content hash occurs in MORE
    // THAN ONE document, and reconstruct the scrubbed text from the
    // surviving spans in order. Two shuffles at any corpus size: the
    // span-frequency aggregation on the 32-char span hash and the
    // per-doc regroup for reconstruction — the frequency table is the
    // same updatable-index shape as q77, so a production run maintains
    // it incrementally instead of recomputing. Output pins kept/total
    // span counts AND the md5 of the reconstruction, so a span dropped
    // out of order (or a wrong survivor) cannot hide behind counts.
    "q82_span_scrub" -> { (s, dir) =>
      import s.implicits._
      val ws = words($"text")
      val nSpans = floor((size(ws) - lit(1)) / lit(10)).cast("int")
      val segs = t(s, dir, "documents")
        .select($"doc_id",
          posexplode(transform(sequence(lit(0), nSpans),
            i => concat_ws(" ", slice(ws, (i * 10 + 1).cast("int"), lit(10))))))
        .toDF("doc_id", "pos", "seg")
        .withColumn("h", md5($"seg"))
      val freq = segs.select($"doc_id", $"h").distinct()
        .groupBy($"h").agg(count(lit(1)) as "ndocs")
      segs.join(freq, "h")
        .groupBy($"doc_id")
        .agg(
          count(lit(1)) as "n_spans",
          sum(when($"ndocs" === 1, 1L).otherwise(0L)) as "kept_spans",
          // collect_list skips nulls, so only surviving spans are
          // gathered; array_sort on (pos, seg) structs restores order.
          md5(concat_ws(" ", transform(
            array_sort(collect_list(
              when($"ndocs" === 1, struct($"pos" as "p", $"seg" as "sg")))),
            x => x.getField("sg")))) as "scrub_md5")
    },

    // Bigram-LM fluency proxy (the CCNet/quality-filter shape without
    // float logs): score each document by the corpus-wide frequency of
    // its bigrams — a doc of common word pairs is "fluent", a doc whose
    // rarest bigram is unique is an outlier. Integer sums + one final
    // division keep it bit-identical cross-engine where a log-perplexity
    // would ride on libm rounding. Same two-aggregation shape as q67
    // plus the q69 frequency join-back — all partial-agg'd, all on
    // fixed-width md5 keys.
    "q83_bigram_fluency" -> { (s, dir) => bigramFluency(s, dir) },

    // Composite quality RANK — the inclusion ranking a FineWeb-style
    // curation run sorts by: fluent documents (high corpus bigram
    // frequency) that are NOT corpus-duplicated, score = fluency ×
    // (1 − dup_ratio). Each factor is a single exact-integer division,
    // the product is one fixed-order double expression (bit-identical
    // cross-engine), ties broken by doc_id. Top-50 plans as
    // TakeOrderedAndProject — per-partition heaps, never a global sort
    // of the corpus.
    "q96_quality_rank" -> { (s, dir) =>
      import s.implicits._
      val (sh3, freq3) = shingleFreq3(s, dir)
      val dup = sh3.join(freq3, "sh")
        .groupBy($"doc_id")
        .agg((sum(when($"ndocs" >= 2, 1L).otherwise(0L)).cast("double") /
          count(lit(1))) as "dup_ratio")
      bigramFluency(s, dir).join(dup, "doc_id")
        .select($"doc_id", $"avg_bigram_freq", $"dup_ratio",
          ($"avg_bigram_freq" * (lit(1.0) - $"dup_ratio")) as "score")
        .orderBy($"score".desc, $"doc_id".asc)
        .limit(50)
    },

    // Source-level quality filter (the RefinedWeb/FineWeb "bad domain"
    // rule): roll q69's duplicate-shingle measurement up to the SOURCE
    // and block any source whose corpus-duplicated shingle share
    // crosses 60% — curation drops whole spammy domains, not just
    // documents. The verdict compares integers (shared*100 >= total*60)
    // so it never rides on float rounding; the output verdict table is
    // tiny (one row per source) and is what a 100 TB run broadcasts
    // back as an anti-join filter on the ingest path.
    "q84_source_quality_filter" -> { (s, dir) =>
      import s.implicits._
      val (sh, freq) = shingleFreq3(s, dir)
      sh.join(freq, "sh")
        .groupBy($"source")
        .agg(countDistinct($"doc_id") as "docs",
          count(lit(1)) as "shingles",
          sum(when($"ndocs" >= 2, 1L).otherwise(0L)) as "shared")
        .select($"source", $"docs", $"shingles", $"shared",
          ($"shared".cast("double") / $"shingles") as "dup_pct",
          ($"shared" * 100 >= $"shingles" * 60) as "blocked")
    },

    // Out-of-vocabulary rate against a frequency-truncated vocabulary —
    // the tokenizer-prep measurement: build the top-10 token vocabulary
    // by corpus frequency (deterministic (tf DESC, token ASC) total
    // order), then score every document by the share of its tokens
    // falling outside it. The vocabulary is bounded by construction, so
    // the scoring join BROADCASTS and the corpus side streams through
    // the scan once — the 100 TB shape. Integer counts + one division.
    "q85_oov_rate" -> { (s, dir) =>
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"doc_id", explode(
          regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))) as "token")
      val vocab = toks.groupBy($"token").agg(count(lit(1)) as "tf")
        .orderBy($"tf".desc, $"token".asc).limit(10)
        .select($"token", lit(1) as "in_vocab")
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "tokens",
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)) as "oov")
        .select($"doc_id", $"tokens", $"oov",
          ($"oov".cast("double") / $"tokens") as "oov_rate")
    },

    // The curation FUNNEL: the whole pipeline's gates composed in
    // production order — hold out the eval slice, then drop short docs,
    // boilerplate (q67's repetition gate), heavily-duplicated docs
    // (q69's corpus dup-shingle share ≥ 50%), and contaminated docs
    // (q66's exact 4-gram probe) — reporting docs_in/docs_out per
    // stage. One row per doc computes its FIRST failing stage (each
    // gate an integer-exact predicate joined from the same aggregations
    // the standalone queries pin), then a single global aggregation
    // folds the funnel; the 6-row output is the report a 100 TB run
    // publishes per snapshot. Measures are corpus-wide (computed once
    // at ingest), gates apply in sequence; per-stage joins are on
    // doc_id, all partial-agg'd, nothing quadratic anywhere.
    "q87_curation_funnel" -> { (s, dir) =>
      import s.implicits._
      val ws = words($"text")
      val base = t(s, dir, "documents")
        .select($"doc_id", size(ws) as "toks")
      // q67's verdict: top bigram covers ≤ 20% of the text.
      val grams = t(s, dir, "documents")
        .where(size(ws) >= 2)
        .select($"doc_id",
          explode(graft.functions.KgramMd5Set.kgramMd5List(ws, 2)) as "gram")
      val rep = grams.groupBy($"doc_id", $"gram").agg(count(lit(1)) as "cnt")
        .groupBy($"doc_id")
        .agg((max($"cnt") * 5 <= sum($"cnt")) as "rep_ok")
      // q69's measure: share of distinct 3-gram shingles seen in ≥2 docs.
      val (sh3, freq3) = shingleFreq3(s, dir)
      val dup = sh3.join(freq3, "sh")
        .groupBy($"doc_id")
        .agg((sum(when($"ndocs" >= 2, 1L).otherwise(0L)) * 2 <
          count(lit(1))) as "dup_ok")
      // q66's probe: any 4-gram shared with the eval slice (%97).
      val sh4 = shingleStream(s, dir, 4)
      val eval4 = sh4.where($"doc_id" % 97 === 0).select($"sh").distinct()
      val contaminated = sh4.where($"doc_id" % 97 =!= 0)
        .join(broadcast(eval4), "sh")
        .select($"doc_id").distinct()
        .withColumn("contam", lit(true))
      val fail = base
        .join(rep, Seq("doc_id"), "left")
        .join(dup, Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .select(
          when($"doc_id" % 97 === 0, 1)
            .when($"toks" < 20, 2)
            .when(!coalesce($"rep_ok", lit(true)), 3)
            .when(!coalesce($"dup_ok", lit(true)), 4)
            .when(coalesce($"contam", lit(false)), 5)
            .otherwise(99) as "fs")
      val stages = Seq("ingest", "eval_holdout", "min_length",
        "repetition", "dup_shingle", "decontaminate")
      fail.agg(count(lit(1)) as "c0",
          (1 to 5).map(k => sum(when($"fs" > k, 1L).otherwise(0L)) as s"c$k"): _*)
        .select(explode(array((0 to 5).map(k =>
          struct(lit(k) as "stage_no", lit(stages(k)) as "stage",
            (if (k == 0) col("c0") else col(s"c${k - 1}")) as "docs_in",
            col(s"c$k") as "docs_out")): _*)) as "r")
        .select($"r.stage_no", $"r.stage", $"r.docs_in", $"r.docs_out")
    },

    // Cross-corpus duplicate-shingle rate (the C4 measurement): for
    // each doc, how many of its distinct 3-gram shingles also occur in
    // at least one OTHER doc. Shingle-frequency table (one shuffle on
    // the shingle hash, partial-agg'd), joined back to the per-doc
    // shingle set on the same key — both sides arrive hash-partitioned
    // by `sh`, and AQE plans the second side's join locally. The ratio
    // ranks docs for near-dup removal where MinHash would be overkill.
    "q69_dup_shingle_rate" -> { (s, dir) =>
      import s.implicits._
      val (sh, freq) = shingleFreq3(s, dir)
      sh.join(freq, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "distinct_shingles",
          sum(when($"ndocs" >= 2, 1L).otherwise(0L)) as "shared_shingles")
        .select($"doc_id", $"distinct_shingles", $"shared_shingles",
          ($"shared_shingles".cast("double") / $"distinct_shingles") as "dup_ratio")
    })

  val oracles: Map[String, String] = Map(
    "q66_decontaminate" -> decontaminationOracle,
    "q79_pii_scrub" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' contact user' || doc_id || '@example.com now'
        |      ELSE text END AS t0
        |  FROM documents),
        |inj2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN t0 || ' call 555-' || doc_id || ' today' ELSE t0 END AS t
        |  FROM inj)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.com')) AS INT)
        |    AS emails,
        |  CAST(len(regexp_extract_all(t, '555-[0-9]+')) AS INT) AS phones,
        |  md5(regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.com',
        |    '[EMAIL]', 'g'), '555-[0-9]+', '[PHONE]', 'g')) AS clean_md5
        |FROM inj2""".stripMargin,
    "q67_repetition_gate" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents
        |  WHERE len(string_split_regex(text, '[ \t\n\f\r]+')) >= 2),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])) AS gram
        |  FROM ws),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(max(cnt) AS BIGINT) AS top_bigram,
        |  count(*) AS distinct_bigrams,
        |  CAST(sum(cnt) AS BIGINT) AS total_bigrams,
        |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS top_fraction,
        |  (max(cnt) * 5 <= sum(cnt)) AS passes
        |FROM c GROUP BY doc_id""".stripMargin,
    "q68_pack_sequences" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    len(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, CAST((cum - toks) // 512 AS BIGINT) AS seq_bin,
        |  count(*) AS docs,
        |  CAST(sum(toks) AS BIGINT) AS tokens,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q87_curation_funnel" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
        |base AS (SELECT doc_id, len(w) AS toks FROM ws),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 1), i -> md5(w[i] || ' ' || w[i+1])))
        |    AS gram
        |  FROM ws WHERE len(w) >= 2),
        |rep AS (
        |  SELECT doc_id, (max(cnt) * 5 <= sum(cnt)) AS rep_ok FROM (
        |    SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
        |  GROUP BY doc_id),
        |sh3 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM ws WHERE len(w) >= 3),
        |freq3 AS (SELECT sh, count(*) AS ndocs FROM sh3 GROUP BY sh),
        |dup AS (
        |  SELECT sh3.doc_id,
        |    (sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 2 < count(*))
        |      AS dup_ok
        |  FROM sh3 JOIN freq3 USING (sh) GROUP BY sh3.doc_id),
        |sh4 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 3),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3])))) AS sh
        |  FROM ws WHERE len(w) >= 4),
        |ev AS (SELECT DISTINCT sh FROM sh4 WHERE doc_id % 97 = 0),
        |contam AS (
        |  SELECT DISTINCT sh4.doc_id FROM sh4 JOIN ev USING (sh)
        |  WHERE doc_id % 97 <> 0),
        |fail AS (
        |  SELECT CASE WHEN base.doc_id % 97 = 0 THEN 1
        |    WHEN toks < 20 THEN 2
        |    WHEN NOT coalesce(rep_ok, TRUE) THEN 3
        |    WHEN NOT coalesce(dup_ok, TRUE) THEN 4
        |    WHEN contam.doc_id IS NOT NULL THEN 5
        |    ELSE 99 END AS fs
        |  FROM base LEFT JOIN rep USING (doc_id) LEFT JOIN dup USING (doc_id)
        |    LEFT JOIN contam ON base.doc_id = contam.doc_id),
        |c AS (SELECT
        |  count(*) AS c0,
        |  CAST(sum(CASE WHEN fs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN fs > 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |  CAST(sum(CASE WHEN fs > 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |  CAST(sum(CASE WHEN fs > 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |  CAST(sum(CASE WHEN fs > 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |  FROM fail)
        |SELECT CAST(0 AS INT) AS stage_no, 'ingest' AS stage,
        |  c0 AS docs_in, c0 AS docs_out FROM c
        |UNION ALL SELECT 1, 'eval_holdout', c0, c1 FROM c
        |UNION ALL SELECT 2, 'min_length', c1, c2 FROM c
        |UNION ALL SELECT 3, 'repetition', c2, c3 FROM c
        |UNION ALL SELECT 4, 'dup_shingle', c3, c4 FROM c
        |UNION ALL SELECT 5, 'decontaminate', c4, c5 FROM c""".stripMargin,
    "q82_span_scrub" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
        |seg0 AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(0, (len(w) - 1) // 10),
        |    i -> struct_pack(pos := i,
        |      seg := array_to_string(
        |        w[i * 10 + 1 : least((i + 1) * 10, len(w))], ' ')))) AS s
        |  FROM ws),
        |seg AS (
        |  SELECT doc_id, s.pos AS pos, s.seg AS seg, md5(s.seg) AS h
        |  FROM seg0),
        |freq AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM seg GROUP BY h)
        |SELECT seg.doc_id,
        |  count(*) AS n_spans,
        |  CAST(sum(CASE WHEN ndocs = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS kept_spans,
        |  md5(coalesce(string_agg(CASE WHEN ndocs = 1 THEN seg END,
        |    ' ' ORDER BY pos), '')) AS scrub_md5
        |FROM seg JOIN freq USING (h)
        |GROUP BY seg.doc_id""".stripMargin,
    "q96_quality_rank" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 1), i -> md5(w[i] || ' ' || w[i+1])))
        |    AS gram
        |  FROM ws WHERE len(w) >= 2),
        |bfreq AS (SELECT gram, count(*) AS cf FROM g GROUP BY gram),
        |flu AS (
        |  SELECT g.doc_id, CAST(sum(cf) AS DOUBLE) / count(*) AS avg_bigram_freq
        |  FROM g JOIN bfreq USING (gram) GROUP BY g.doc_id),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM ws WHERE len(w) >= 3),
        |sfreq AS (SELECT sh, count(*) AS ndocs FROM sh GROUP BY sh),
        |dup AS (
        |  SELECT sh.doc_id,
        |    CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*) AS dup_ratio
        |  FROM sh JOIN sfreq USING (sh) GROUP BY sh.doc_id)
        |SELECT flu.doc_id, avg_bigram_freq, dup_ratio,
        |  avg_bigram_freq * (1 - dup_ratio) AS score
        |FROM flu JOIN dup ON flu.doc_id = dup.doc_id
        |ORDER BY score DESC, flu.doc_id ASC
        |LIMIT 50""".stripMargin,
    "q83_bigram_fluency" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents
        |  WHERE len(string_split_regex(text, '[ \t\n\f\r]+')) >= 2),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(w) - 1), i -> md5(w[i] || ' ' || w[i+1])))
        |    AS gram
        |  FROM ws),
        |freq AS (SELECT gram, count(*) AS cf FROM g GROUP BY gram)
        |SELECT g.doc_id,
        |  count(*) AS n_bigrams,
        |  CAST(sum(cf) AS BIGINT) AS freq_sum,
        |  CAST(min(cf) AS BIGINT) AS rarest,
        |  CAST(sum(cf) AS DOUBLE) / count(*) AS avg_bigram_freq
        |FROM g JOIN freq USING (gram)
        |GROUP BY g.doc_id""".stripMargin,
    "q84_source_quality_filter" ->
      """WITH ws AS (
        |  SELECT doc_id, source, string_split_regex(text, '[ \t\n\f\r]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM ws WHERE len(w) >= 3),
        |freq AS (SELECT sh, count(*) AS ndocs FROM sh GROUP BY sh)
        |SELECT source,
        |  count(DISTINCT sh.doc_id) AS docs,
        |  count(*) AS shingles,
        |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS shared,
        |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_pct,
        |  (sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 100
        |    >= count(*) * 60) AS blocked
        |FROM sh JOIN freq USING (sh)
        |GROUP BY source""".stripMargin,
    "q85_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |    AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token, 1 AS in_vocab FROM (
        |    SELECT token, count(*) AS tf FROM tok GROUP BY token
        |    ORDER BY tf DESC, token ASC LIMIT 10))
        |SELECT tok.doc_id,
        |  count(*) AS tokens,
        |  CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS oov,
        |  CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS oov_rate
        |FROM tok LEFT JOIN vocab USING (token)
        |GROUP BY tok.doc_id""".stripMargin,
    "q69_dup_shingle_rate" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS sh
        |  FROM ws WHERE len(w) >= 3),
        |freq AS (SELECT sh, count(*) AS ndocs FROM sh GROUP BY sh)
        |SELECT sh.doc_id,
        |  count(*) AS distinct_shingles,
        |  CAST(sum(CASE WHEN freq.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS shared_shingles,
        |  CAST(sum(CASE WHEN freq.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_ratio
        |FROM sh JOIN freq USING (sh)
        |GROUP BY sh.doc_id""".stripMargin
  )
}
