package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.BinaryType

import Tables._

/** Sketch-accelerated operators — the "sketch → prune → exact-verify"
  * shapes a 100 TB pipeline leans on when the exact operator's shuffle
  * would dominate. Three families:
  *
  *   - Bloom-prefiltered decontamination (q70): the exact q66 result
  *     computed the way a 1000-executor job would — an O(128 KiB)
  *     filter broadcast prunes the corpus-side shingle stream BEFORE
  *     the join, so only true hits + the false-positive trickle reach
  *     the exact verify step.
  *   - Corpus profile (q71): the exact fields (counts, vocabulary,
  *     length extremes) are hash-oracled; the mergeable
  *     cardinality/frequency/quantile sketches (HLL, CMS, GK) live in
  *     [[sketchProfile]], spec-only — DuckDB's sketches are different
  *     algorithms, so equality is meaningless; `SketchSpec` pins error
  *     bounds against exact counts and the merge law instead.
  *   - Salted skew join (q72): exact result under a deliberately
  *     skewed join key, with the hot keys spread across S salt
  *     shards. The plain-join DuckDB oracle proves salting is
  *     result-invariant.
  *
  * All sketch state is bounded and driver-safe: the only collect is the
  * one aggregated Bloom filter (numBits/8 = 128 KiB by construction —
  * the same shape as Spark's own injected runtime filters, which
  * materialize the bloom on the driver before re-broadcasting it).
  */
object Sketches {

  // One tokenizer spelling repo-wide (the split-limit semantics are
  // parity-critical): reuse Curation's.
  private def words(c: Column): Column = Curation.words(c)

  /** Aggregate a LongType column into one Bloom filter with `numBits`
    * bits, returning the serialized filter bytes. One driver-side value
    * of numBits/8 bytes — bounded by construction, independent of row
    * count. */
  private def bloomOf(df: org.apache.spark.sql.DataFrame, col: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = bridge.column(new BloomFilterAggregate(
      bridge.expression(col),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    df.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloomBytes, hash)` as a codegen'd predicate; the
    * filter bytes ride along as a foldable binary literal (the form
    * `BloomFilterMightContain` requires — it rejects non-constant,
    * non-subquery filter expressions). */
  private def mightContain(bloomBytes: Array[Byte], hash: Column): Column =
    bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), bridge.expression(hash)))

  /** SpaceSaving heavy-hitters summary (Metwally, Agrawal & El Abbadi,
    * "Efficient Computation of Frequent and Top-k Elements in Data
    * Streams", ICDT 2005), with the mergeable-summaries combine
    * (Agarwal et al., PODS 2012): k counters, eviction inherits the
    * evicted count as the newcomer's overestimate (`err`), and merging
    * charges each summary's FLOOR (its min count, 0 unless it evicted)
    * to tokens the other side tracked. Invariants the spec pins:
    * `true ≤ est ≤ true + err` for every surviving entry, and when the
    * stream's vocabulary fits k counters on every partition, no
    * eviction ever happens and the summary is EXACT — which is what
    * lets q105 be oracle-checked against a plain GROUP BY (this
    * corpus: 31 distinct tokens, k = 64). Spark has HLL/GK/CMS
    * built-ins but no SpaceSaving, so this is the documented
    * per-partition-imperative case: one summary per partition
    * (`mapPartitions`), a bounded `numPartitions × k` collect, driver
    * merge — the treeAggregate shape every mergeable sketch runs at
    * any scale. */
  final class SpaceSaving(val k: Int) extends Serializable {
    // token -> (count, err); size ≤ k.
    val entries = new java.util.HashMap[String, (Long, Long)]()
    // Whether an eviction ever happened; the merge floor is 0 otherwise.
    var evicted = false

    def floor: Long =
      if (!evicted || entries.isEmpty) 0L
      else {
        var m = Long.MaxValue
        entries.forEach((_, ce) => if (ce._1 < m) m = ce._1)
        m
      }

    def add(t: String): Unit = {
      val cur = entries.get(t)
      if (cur != null) entries.put(t, (cur._1 + 1L, cur._2))
      else if (entries.size < k) entries.put(t, (1L, 0L))
      else {
        // Evict the min-count entry; the newcomer inherits its count as
        // an overestimate and records it as err.
        var minT: String = null; var minC = Long.MaxValue
        entries.forEach((tok, ce) =>
          if (ce._1 < minC || (ce._1 == minC && (minT == null || tok < minT))) {
            minT = tok; minC = ce._1
          })
        entries.remove(minT)
        entries.put(t, (minC + 1L, minC))
        evicted = true
      }
    }

    /** Merge `other` in (both sides' floors charged to absent tokens),
      * then cut back to the k largest counts. */
    def merge(other: SpaceSaving): SpaceSaving = {
      val fa = floor; val fb = other.floor
      val all = new java.util.HashMap[String, (Long, Long)]()
      entries.forEach { (t, ce) =>
        val o = other.entries.get(t)
        val (oc, oe) = if (o != null) o else (fb, fb)
        all.put(t, (ce._1 + oc, ce._2 + oe))
      }
      other.entries.forEach { (t, ce) =>
        if (!all.containsKey(t)) all.put(t, (ce._1 + fa, ce._2 + fa))
      }
      val out = new SpaceSaving(k)
      out.evicted = evicted || other.evicted
      if (all.size <= k) out.entries.putAll(all)
      else {
        out.evicted = true
        val top = new java.util.ArrayList(all.entrySet())
        top.sort { (a, b) =>
          val c = java.lang.Long.compare(b.getValue._1, a.getValue._1)
          if (c != 0) c else a.getKey.compareTo(b.getKey)
        }
        (0 until k).foreach { i =>
          val e = top.get(i); out.entries.put(e.getKey, e.getValue)
        }
      }
      out
    }
  }

  object SpaceSaving {
    def of(k: Int, it: Iterator[String]): SpaceSaving = {
      val s = new SpaceSaving(k)
      it.foreach(s.add)
      s
    }
  }

  val queries: Map[String, Q] = Map(
    // q66's decontamination result, produced the 100 TB way: aggregate
    // the (small) eval side's shingle hashes into ONE 128 KiB Bloom
    // filter, broadcast it as a literal, and prune the (huge) training
    // side's shingle stream in the scan stage — only bloom survivors
    // pay the exact broadcast-join verify. The bloom pass is a pure
    // row-local predicate: no shuffle of the big side, ever; the exact
    // join removes the false positives so the result is bit-identical
    // to the unpruned join (same oracle as q66, modulo the shared
    // shingle definition).
    "q70_bloom_decontaminate" -> { (s, dir) =>
      import s.implicits._
      // One shingle definition shared with q66 (Curation.shingleStream):
      // the two queries promise bit-identical results.
      val sh = Curation.shingleStream(s, dir, 4)
      // Barriered: the Bloom aggregation consumes it eagerly and the
      // exact-verify join consumes it again at materialization — without
      // the persist the eval scan+explode+distinct runs twice.
      val eval5 = Dedup.barrier(
        sh.where($"doc_id" % 97 === 0).select($"sh").distinct())
      // 2^20 bits / ~64k expected shingles ⇒ false-positive rate well
      // under 1%; at a real eval-set scale you'd size numBits to
      // ~10 bits/item and still broadcast only megabytes.
      val bloom = bloomOf(eval5, xxhash64($"sh"), 1L << 16, 1L << 20)
      sh.where($"doc_id" % 97 =!= 0)
        .where(mightContain(bloom, xxhash64($"sh")))
        .join(broadcast(eval5), "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "contaminated_shingles")
    },

    // The corpus profile's EXACT fields, per source shard — doc/token
    // counts, exact vocabulary cardinality, token-length extremes —
    // hash-oracled against DuckDB (VERDICT r14 #4: the sketch fields
    // moved to [[sketchProfile]], spec-only, because DuckDB's approx
    // aggregates are different algorithms and can never hash-match).
    // Scale shape: one shuffle for the distinct-token count (two-phase
    // distinct aggregation), one for the per-doc rollup; output is a
    // few rows at any corpus size.
    "q71_corpus_profile_exact" -> { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"source", $"doc_id", words($"text") as "ws")
      val tokLevel = docs
        .select($"source", explode($"ws") as "tok")
        .groupBy($"source")
        .agg(
          count(lit(1)) as "tokens",
          count_distinct($"tok") as "vocab")
      val docLevel = docs
        .select($"source", size($"ws") as "ntoks")
        .groupBy($"source")
        .agg(
          count(lit(1)) as "docs",
          max($"ntoks").cast("long") as "max_toks",
          min($"ntoks").cast("long") as "min_toks")
      docLevel.join(tokLevel, "source")
    },

    // SpaceSaving heavy hitters over the corpus token stream (r8): one
    // k=64 summary per partition, a bounded numPartitions × k collect,
    // one driver merge — the mergeable-summary shape whose cost is
    // O(k) per partition at ANY corpus size (a 100 TB run moves a few
    // KB per task where the exact GROUP BY shuffles the full token
    // stream). Unlike q71's HLL/GK this one IS oracle-checked: the
    // corpus vocabulary (31) fits the k=64 counters on every
    // partition, so no eviction happens, merge floors are 0, and the
    // summary is provably EXACT — equal to the plain GROUP BY. The
    // approximate regime (vocab > k: eviction, floors, ε-bounds,
    // merge law) is SketchSpec's property territory.
    "q105_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(words($"text")) as "tok").as[String]
      val partials = toks.mapPartitions(it =>
          Iterator.single(SpaceSaving.of(64, it)))(
          org.apache.spark.sql.Encoders.kryo[SpaceSaving])
        .collect()
      val merged = partials.reduceLeft((a, b) => a.merge(b))
      val rows = {
        val b = Vector.newBuilder[(String, Long)]
        merged.entries.forEach((t, ce) => b += ((t, ce._1)))
        b.result()
      }
      s.createDataset(rows).toDF("token", "cnt")
    },

    // Exact revenue by a deliberately skewed derived key (5 hot keys
    // over all of lineitem), joined to a per-key dimension WITHOUT
    // broadcasting: the dim is replicated across 8 salt shards and the
    // fact side routes by a hash-salt, so no single reducer owns a hot
    // key. SHUFFLE_HASH hints keep Catalyst from quietly broadcasting
    // the dim (which would defeat the demonstration); the DuckDB
    // oracle is the plain unsalted join — salting must be invisible in
    // the result.
    "q72_salted_skew_join" -> { (s, dir) =>
      import s.implicits._
      val salts = 8
      val fact = t(s, dir, "lineitem")
        .select(($"l_suppkey" % 5) as "hot", dec($"l_extendedprice") as "price",
          pmod(hash($"l_orderkey", $"l_linenumber"), lit(salts)) as "salt")
      val dim = t(s, dir, "supplier")
        .groupBy(($"s_suppkey" % 5) as "hot")
        .agg(count(lit(1)) as "nsupp")
        .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
      fact.hint("SHUFFLE_HASH")
        .join(dim.hint("SHUFFLE_HASH"), Seq("hot", "salt"))
        .groupBy($"hot")
        .agg(count(lit(1)) as "cnt", toDouble(sum($"price")) as "revenue",
          first($"nsupp") as "nsupp")
    })

  /** Mergeable-sketch corpus profile, per source shard: vocabulary
    * cardinality two ways (Spark's HLL++ `approx_count_distinct` and
    * the DataSketches HLL whose binary form unions across shards /
    * days / reruns), and token-count quantiles (GK sketch). Exact
    * row/token counts ride along so any consumer can see the sketch
    * error in place. One shuffle (the explode feeds a partial-agg'd
    * hash aggregate); every sketch is O(KB) per group regardless of
    * corpus size — this query's output for 100 TB is a few rows.
    *
    * SPEC-ONLY by design (SketchSpec pins error bounds + the merge
    * law): DuckDB's approx aggregates are different algorithms, so a
    * hash oracle can never match. The exact fields live in the gated
    * `q71_corpus_profile_exact`. */
  def sketchProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"source", $"doc_id", words($"text") as "ws")
    val tokLevel = docs
      .select($"source", explode($"ws") as "tok")
      .groupBy($"source")
      .agg(
        count(lit(1)) as "tokens",
        approx_count_distinct($"tok", 0.01) as "vocab_hllpp",
        hll_sketch_estimate(hll_sketch_agg($"tok", 12)) as "vocab_hll")
    val docLevel = docs
      .select($"source", size($"ws") as "ntoks")
      .groupBy($"source")
      .agg(
        count(lit(1)) as "docs",
        percentile_approx($"ntoks", lit(0.5), lit(10000)) as "p50_toks",
        max($"ntoks") as "max_toks")
    docLevel.join(tokLevel, "source")
  }

  val oracles: Map[String, String] = Map(
    // Bit-identical to the unpruned exact decontamination join: the
    // bloom stage only prunes, the exact join decides — one shared
    // oracle with q66.
    "q70_bloom_decontaminate" -> Curation.decontaminationOracle,
    // Same tokenizer spelling as the Spark side (Curation.words); the
    // sketch fields are spec-only in [[sketchProfile]].
    "q71_corpus_profile_exact" ->
      """WITH t AS (
        |  SELECT source,
        |    unnest(string_split_regex(text, '[ \t\n\f\r]+')) AS tok
        |  FROM documents),
        |tok AS (
        |  SELECT source, count(*) AS tokens, count(DISTINCT tok) AS vocab
        |  FROM t GROUP BY 1),
        |d AS (
        |  SELECT source, count(*) AS docs,
        |    CAST(max(len(string_split_regex(text, '[ \t\n\f\r]+'))) AS BIGINT) AS max_toks,
        |    CAST(min(len(string_split_regex(text, '[ \t\n\f\r]+'))) AS BIGINT) AS min_toks
        |  FROM documents GROUP BY 1)
        |SELECT d.source, docs, max_toks, min_toks, tokens, vocab
        |FROM d JOIN tok USING (source)""".stripMargin,
    // q105 IS oracle-checked: vocabulary < k ⇒ the summary is exactly
    // the GROUP BY (see the query's derivation); same tokenizer
    // spelling as the Spark side (Curation.words).
    "q105_heavy_hitters" ->
      """SELECT w AS token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '[ \t\n\f\r]+')) AS w
        |  FROM documents)
        |GROUP BY 1""".stripMargin,
    "q72_salted_skew_join" ->
      """WITH dim AS (
        |  SELECT s_suppkey % 5 AS hot, count(*) AS nsupp
        |  FROM supplier GROUP BY 1)
        |SELECT l_suppkey % 5 AS hot, count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  nsupp
        |FROM lineitem JOIN dim ON l_suppkey % 5 = dim.hot
        |GROUP BY 1, nsupp""".stripMargin
  )
}
