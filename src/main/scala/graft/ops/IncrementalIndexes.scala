package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Executer, ExecuterConfig, MapReduceTask}
import graft.functions.HyperplaneBuckets
import Tables._

/** The LLM-pipeline artifacts expressed as UPDATABLE PERSISTENT INDEXES
  * through the core engine ([[graft.core.Executer]]) — closing the loop
  * between the reference's model (every `Execute` call is an update,
  * `MapReduce/Executer.cs:31-45`) and the dedup/ANN operators:
  *
  *   - q29: the per-document MinHash signature table (q26's artifact) as
  *     a maintained index — new/changed documents re-shingle and re-hash
  *     ONLY themselves; every other signature row is untouched state.
  *   - q37: the IVF cell-assignment table (q36's coarse quantization) as
  *     a maintained index — re-embedded vectors move cells individually.
  *
  * Both queries build the index, then apply an incremental update batch
  * (a deterministic slice of mutated documents), and return the
  * persisted post-update state; the DuckDB oracle recomputes the same
  * state from scratch over the mutated corpus, so the equality check IS
  * the incremental ≡ batch proof on real data.
  *
  * The map kernels reuse the exact hash formulas of the batch operators
  * (md5 minhash as in [[Dedup]]; `sin`-plane projections via
  * [[HyperplaneBuckets.sinPlanes]]), so index contents are bit-identical
  * to what the batch queries compute.
  */
object IncrementalIndexes {

  private val NumHashes = 8

  // Digest plumbing shared with the expression kernels
  // (`MinHashSigs.md5` per-thread instance + its hex spelling) — ONE
  // implementation of the lockstep-critical md5/hex formulas repo-wide.
  // Both digest call sites reset() first, per the thread-local's
  // contract: digest() leaves the instance reset, but a prior kernel
  // aborting between update() and digest() leaves residue that would
  // silently corrupt every later hash on that thread (ADVICE r6).
  private def md5hex(s: String): String = {
    val md = graft.functions.MinHashSigs.md5.get(); md.reset()
    graft.functions.MinHashSigs.toHex(md.digest(s.getBytes("UTF-8")))
  }

  /** 3-word shingles + MinHash, JVM-side — the same double-hash formula
    * as q26's `MinHashSigs` expression and its DuckDB oracle: one md5
    * per shingle, slot k = min over shingles of h1 + k·h2 mod 2^64
    * (h1/h2 = big-endian uint64 of digest bytes 0-7 / 8-15) as 16-char
    * lowercase hex. */
  // All JVM tokenizers here split with limit -1: Java's default
  // `split` DROPS trailing empty tokens, while Spark's `split()` and
  // DuckDB's `string_split_regex` keep them — a doc with trailing
  // whitespace would otherwise hash differently here than in the
  // column-expression/oracle mirrors (ADVICE r5).
  private def minhashOf(text: String): Option[Seq[String]] = {
    val words = text.split("[ \\t\\n\\f\\r]+", -1)
    if (words.length < 3) return None
    val sh = words.sliding(3).map(_.mkString(" ")).toArray.distinct
    val mins = new Array[Long](NumHashes)
    var any = false
    val md = graft.functions.MinHashSigs.md5.get()
    for (s <- sh) {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      var h1 = 0L; var h2 = 0L
      var j = 0
      while (j < 8) {
        h1 = (h1 << 8) | (d(j) & 0xffL)
        h2 = (h2 << 8) | (d(j + 8) & 0xffL)
        j += 1
      }
      var v = h1; var k = 0
      while (k < NumHashes) {
        if (!any || java.lang.Long.compareUnsigned(v, mins(k)) < 0) mins(k) = v
        v += h2; k += 1
      }
      any = true
    }
    Some(mins.toSeq.map(graft.functions.MinHashSigs.toHex64))
  }

  case class DocText(doc_id: Long, text: String)
  case class Sig(doc_id: Long, mh0: String, mh1: String, mh2: String,
      mh3: String, mh4: String, mh5: String, mh6: String, mh7: String)

  /** MinHash signature index: one row per document, keyed by the
    * document itself (reduce = identity over the single surviving map
    * entry — update semantics do the delete-and-replace). */
  object MinHashIndex extends MapReduceTask[DocText, Sig] {
    def map(docs: Iterator[DocText]): Iterator[(String, Sig)] =
      docs.flatMap { d =>
        minhashOf(d.text).map { mh =>
          (s"doc-${d.doc_id}", Sig(d.doc_id, mh(0), mh(1), mh(2), mh(3),
            mh(4), mh(5), mh(6), mh(7)))
        }
      }
    def reduce(entries: Iterator[Sig]): Iterator[Sig] = entries
    def reduceKey(e: Sig): String = e.doc_id.toString
    def documentId(d: DocText): String = s"doc-${d.doc_id}"
  }

  /** Winnowing fingerprint summary of one document — the q53 algorithm
    * (k=4-gram md5, w=5 sliding minima, distinct) reduced to a stable
    * per-doc scalar pair: the fingerprint count and the md5 of the
    * sorted, '|'-joined fingerprint set. */
  private def winnowOf(text: String): Option[(Int, String)] = {
    val k = 4; val w = 5
    val words = text.split("[ \\t\\n\\f\\r]+", -1)
    val m = words.length - k + 1
    if (m < w) return None
    val hs = Array.tabulate(m)(i => md5hex(words.slice(i, i + k).mkString(" ")))
    val fps = (0 to m - w).map(i => hs.slice(i, i + w).min).distinct
    Some((fps.length, md5hex(fps.sorted.mkString("|"))))
  }

  case class WinnowRow(doc_id: Long, n_fps: Int, fps_digest: String)

  /** Winnowing fingerprint index: the q53 artifact maintained per doc —
    * an edited document re-winnows only itself. */
  object WinnowIndex extends MapReduceTask[DocText, WinnowRow] {
    def map(docs: Iterator[DocText]): Iterator[(String, WinnowRow)] =
      docs.flatMap { d =>
        winnowOf(d.text).map { case (n, dig) =>
          (s"doc-${d.doc_id}", WinnowRow(d.doc_id, n, dig))
        }
      }
    def reduce(entries: Iterator[WinnowRow]): Iterator[WinnowRow] = entries
    def reduceKey(e: WinnowRow): String = e.doc_id.toString
    def documentId(d: DocText): String = s"doc-${d.doc_id}"
  }

  case class VecDoc(vec_id: Long, embedding: Array[Float])
  case class CellRow(vec_id: Long, cell: Int)

  private val CellBits = 8
  private val Dim = 64
  private lazy val planes = HyperplaneBuckets.sinPlanes(CellBits, Dim)

  /** IVF coarse-quantization cell of a vector — same arithmetic as the
    * `hyperplane_buckets` expression with tables=1, bits=8, dim=64
    * (ascending-index double accumulation). Rejects vectors LONGER
    * than `Dim` loudly (same contract as [[IvfCentroidIndex]], ADVICE
    * r5): the kernel would truncate at `Dim` while the q37 oracle sums
    * the full length into the next bit's plane indices — a silent
    * engine/oracle divergence. Shorter vectors project over their
    * prefix on both sides, so they stay allowed. */
  private def cellOf(emb: Array[Float]): Int = {
    require(emb.length <= Dim,
      s"IvfCellIndex expects <= $Dim-dim embeddings, got ${emb.length}")
    var bucket = 0
    var b = 0
    while (b < CellBits) {
      val base = b * Dim
      var proj = 0.0
      var i = 0
      while (i < Dim && i < emb.length) {
        proj += emb(i).toDouble * planes(base + i)
        i += 1
      }
      if (proj >= 0) bucket |= 1 << b
      b += 1
    }
    bucket
  }

  object IvfCellIndex extends MapReduceTask[VecDoc, CellRow] {
    def map(docs: Iterator[VecDoc]): Iterator[(String, CellRow)] =
      docs.map(v => (s"vec-${v.vec_id}", CellRow(v.vec_id, cellOf(v.embedding))))
    def reduce(entries: Iterator[CellRow]): Iterator[CellRow] = entries
    def reduceKey(e: CellRow): String = e.vec_id.toString
    def documentId(d: VecDoc): String = s"vec-${d.vec_id}"
  }

  case class SimhashRow(doc_id: Long, simhash: Int)

  /** JVM-side simhash, bit-identical to q28's column expression (and
    * its DuckDB oracle): each DISTINCT word votes ±1 on bit b by hex
    * digit b of md5(word) (≥ '8' → +1); bit set iff the vote sum ≥ 0. */
  private def simhashOf(text: String): Int = {
    val words = text.split("[ \\t\\n\\f\\r]+", -1).distinct
    val digests = words.map(md5hex)
    var sig = 0
    var bit = 0
    while (bit < 16) {
      var votes = 0
      for (d <- digests) votes += (if (d.charAt(bit) >= '8') 1 else -1)
      if (votes >= 0) sig |= 1 << bit
      bit += 1
    }
    sig
  }

  /** The per-doc SimHash signature (q28's artifact) as a maintained
    * index — completes the family (sig q28, pairs q95, maintained
    * here) and the symmetry with MinHash (q26/q27/q29): an edited
    * document re-signs only itself. */
  object SimhashIndex extends MapReduceTask[DocText, SimhashRow] {
    def map(docs: Iterator[DocText]): Iterator[(String, SimhashRow)] =
      docs.map(d =>
        (s"doc-${d.doc_id}", SimhashRow(d.doc_id, simhashOf(d.text))))
    def reduce(entries: Iterator[SimhashRow]): Iterator[SimhashRow] = entries
    def reduceKey(e: SimhashRow): String = e.doc_id.toString
    def documentId(d: DocText): String = s"doc-${d.doc_id}"
  }

  case class CentroidRow(cell: Int, n_vecs: Long, qsum: Array[Long])

  /** The IVF CENTROID table as a maintained index — the vector-state
    * companion to q37's cell assignment: reduce key = cell, state =
    * (member count, element-wise component sum). Means are not
    * re-reducible but (sum, count) is, and to keep the incremental ≡
    * batch equality EXACT across engines the summed components are
    * fixed-point quantized first (floor(x·1000 + 0.5), the q75 trick —
    * float addition reordered across partitions would otherwise differ
    * in the last ulp and the oracle hash with it); the centroid is one
    * final division of exact integers. The quantization also makes
    * (count, component sums) an exact abelian group, so the task
    * declares [[MapReduceTask.deltaReducible]]: a re-embedded vector's
    * retraction from its old cell is a SUBTRACTION of exact integers
    * merged into the stored partials, never a re-reduce of the cell's
    * other members. (Earlier rounds avoided subtraction because a lost
    * update could corrupt the sum; the engine-level delta path closed
    * that — the WAL is written before any mutation and recovery replays
    * it through sibling recompute, which the group laws make
    * equivalent.) At 100 TB this is the coarse-quantizer refresh a
    * production ANN index runs per ingest batch without touching the
    * 99% of cells no vector left or joined. */
  object IvfCentroidIndex extends MapReduceTask[VecDoc, CentroidRow] {
    def map(docs: Iterator[VecDoc]): Iterator[(String, CentroidRow)] =
      docs.map { v =>
        // The q91 oracle iterates the ACTUAL embedding length; padding
        // or truncating to Dim here would silently diverge from it for
        // any non-Dim vector, so reject those loudly (ADVICE r5).
        require(v.embedding.length == Dim,
          s"IvfCentroidIndex requires $Dim-dim embeddings, " +
            s"got ${v.embedding.length} for vec ${v.vec_id}")
        val q = Array.tabulate(Dim)(i =>
          math.floor(v.embedding(i).toDouble * 1000 + 0.5).toLong)
        (s"vec-${v.vec_id}", CentroidRow(cellOf(v.embedding), 1L, q))
      }
    def reduce(entries: Iterator[CentroidRow]): Iterator[CentroidRow] = {
      var acc: CentroidRow = null
      entries.foreach { e =>
        acc = if (acc == null) e
        else acc.copy(n_vecs = acc.n_vecs + e.n_vecs,
          qsum = Array.tabulate(Dim)(i => acc.qsum(i) + e.qsum(i)))
      }
      if (acc == null) Iterator.empty else Iterator(acc)
    }
    def reduceKey(e: CentroidRow): String = e.cell.toString
    def documentId(d: VecDoc): String = s"vec-${d.vec_id}"
    override def singleOutput: Boolean = true
    override def deltaReducible: Boolean = true
    override def negate(e: CentroidRow): CentroidRow =
      e.copy(n_vecs = -e.n_vecs, qsum = e.qsum.map(x => -x))
    override def isZero(e: CentroidRow): Boolean =
      e.n_vecs == 0L && e.qsum.forall(_ == 0L)
  }

  case class ShingleFreq(sh: String, ndocs: Long)

  /** The corpus shingle-frequency table (q69's artifact) as a maintained
    * index — the first CURATION index through the engine, and the first
    * whose reduce genuinely merges MANY documents per key (q29/q64/q37
    * reduce one doc's own rows): reduce key = the shingle hash, reduce =
    * count of contributing docs. An edited document retracts its old
    * shingles and contributes its new ones through delete-and-invalidate
    * + sibling re-reduce; every shingle no edited doc touches is
    * untouched state. At 100 TB this is the table a production C4-style
    * dedup pass consults, and rebuilding it per corpus drop is exactly
    * the recompute the reference exists to avoid
    * (reference: `MapReduce/Executer.cs:31-45`). */
  class KgramFreqIndex(k: Int) extends MapReduceTask[DocText, ShingleFreq] {
    def map(docs: Iterator[DocText]): Iterator[(String, ShingleFreq)] =
      docs.flatMap { d =>
        val ws = d.text.split("[ \\t\\n\\f\\r]+", -1)
        if (ws.length < k) Iterator.empty
        else ws.sliding(k).map(g => md5hex(g.mkString(" ")))
          .toArray.distinct.iterator
          .map(sh => (s"doc-${d.doc_id}", ShingleFreq(sh, 1L)))
      }
    def reduce(entries: Iterator[ShingleFreq]): Iterator[ShingleFreq] = {
      var sh: String = null; var n = 0L
      entries.foreach { e => sh = e.sh; n += e.ndocs }
      if (sh == null) Iterator.empty else Iterator(ShingleFreq(sh, n))
    }
    def reduceKey(e: ShingleFreq): String = e.sh
    def documentId(d: DocText): String = s"doc-${d.doc_id}"
    override def singleOutput: Boolean = true
    // Parameterized task: two instances with different k share a class
    // name but emit incompatible shingle universes — fold k into the
    // persisted identity so the store guard can tell them apart.
    override def taskId: String = s"${getClass.getName}#k=$k"
    // Doc counts form an abelian group: the engine maintains this index
    // by DELTAS (subtract the edited docs' old shingles, add the new),
    // O(batch + touched partials) instead of re-reducing every group a
    // hot shingle appears in — the sibling-recompute term that made a
    // 1/7-corpus edit a near-full re-reduce (SURVEY §16.6 #1, decided
    // in r8). A shingle whose count reaches zero disappears, exactly as
    // under recompute. Crash recovery still replays the WAL through the
    // recompute path (MapReduceTask.deltaReducible).
    override def deltaReducible: Boolean = true
    override def negate(e: ShingleFreq): ShingleFreq = e.copy(ndocs = -e.ndocs)
    override def isZero(e: ShingleFreq): Boolean = e.ndocs == 0L
  }

  /** q69's table: 3-gram shingle frequency over the whole corpus. */
  object ShingleFreqIndex extends KgramFreqIndex(3)

  case class DocLen(doc_id: Long, source: String, text: String)
  case class HistRow(source: String, len_bin: Long, docs: Long,
      tokens: Long, min_toks: Int, max_toks: Int)

  /** q88's sequence-length histogram as a maintained index: reduce key =
    * (source, 16-token bin), reduce = merge of (count, token sum, min,
    * max) — all four re-reducible, so the update path is exact: an
    * edited document retracts its old bin row and contributes to its new
    * bin through delete-and-invalidate + sibling re-reduce (min/max need
    * the re-reduce from surviving map outputs — a pure decrement
    * could not recover a retracted minimum). The histogram a 100 TB
    * pipeline consults before packing is maintained per batch, never
    * recomputed. */
  // `[^ \t\n\f\r]+` run count — the repo-wide token convention (TextOps.nTokens,
  // unified in r7 per VERDICT r6 #4; the former split-count agreed on
  // the corpus but diverged on leading/trailing-whitespace text).
  private val NonWsRun = java.util.regex.Pattern.compile("[^ \\t\\n\\f\\r]+")
  private def countTokens(text: String): Int = {
    val m = NonWsRun.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  object LengthHistIndex extends MapReduceTask[DocLen, HistRow] {
    def map(docs: Iterator[DocLen]): Iterator[(String, HistRow)] =
      docs.map { d =>
        val toks = countTokens(d.text)
        (s"doc-${d.doc_id}",
          HistRow(d.source, toks.toLong / 16, 1L, toks.toLong, toks, toks))
      }
    def reduce(entries: Iterator[HistRow]): Iterator[HistRow] = {
      var acc: HistRow = null
      entries.foreach { e =>
        acc = if (acc == null) e
        else acc.copy(docs = acc.docs + e.docs, tokens = acc.tokens + e.tokens,
          min_toks = math.min(acc.min_toks, e.min_toks),
          max_toks = math.max(acc.max_toks, e.max_toks))
      }
      if (acc == null) Iterator.empty else Iterator(acc)
    }
    def reduceKey(e: HistRow): String = s"${e.source}|${e.len_bin}"
    def documentId(d: DocLen): String = s"doc-${d.doc_id}"
    override def singleOutput: Boolean = true
  }

  /** q66's probe table: the 4-gram shingle set of the held-out eval
    * slice, maintained as an index so a benchmark release is an UPDATE
    * (submit the new eval docs), not a recompute of the whole list. */
  object EvalShingleIndex extends KgramFreqIndex(4)

  /** Built+updated store DIRECTORY per (process, source dir) — the
    * on-disk state is session-free. Executer HANDLES are cached per
    * (session, query, dir) separately: an Executer captures its
    * SparkSession, so a later session must reopen the shared store
    * rather than inherit a handle pinned to a stopped context. */
  private val updatedStores =
    scala.collection.concurrent.TrieMap.empty[(String, String), (String, Long)]
  private val updatedHandles =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), Any]

  /** One LengthHistIndex store per (process, source dir), built from a
    * pristine clone then mutated by q89's update batch, shared by q89
    * (current state) and q89b (pre-update generation via time travel):
    * both only READ once built, so oracle isolation holds and the sweep
    * pays the build+update once. Returns (executer, pre-update
    * snapshot version). */
  private def lengthHistUpdated(
      s: SparkSession, dir: String): (Executer[DocLen, HistRow], Long) = {
    implicit val spark: SparkSession = s
    import s.implicits._
    def docs = t(s, dir, "documents")
      .select($"doc_id".cast("long") as "doc_id", $"source", $"text")
      .repartition(cpuWidth(s)).as[DocLen]
    val cfg = fixtureCfg
    val (path, v) = Memo.memo(updatedStores, ("q89", dir)) {
      val store = TempStores.scratch("graft-run-q89")
      // The whole built+updated pipeline is a deterministic derivation,
      // so the cross-RUN cache (Bench only) serves the post-update store
      // plus its pre-update snapshot version as one entry.
      val (preV, _) = StoreCache.orBuild("q89", dir, store,
          cacheExtras("q89")) { st =>
        // Built directly into the updated store's directory: the base
        // was only ever cloned into this pipeline (nothing else reads
        // it), so the former build-then-clone paid a full store copy
        // for pristine-memo semantics no consumer needed. q89b's
        // pre-update read comes from TIME TRAVEL (the preV snapshot),
        // not from a pristine sibling directory.
        val ex = new Executer(LengthHistIndex, st, cfg)
        Phases.timed("q89", "base_store_build")(ex.execute(docs))
        val preV0 = ex.snapshotVersion()
        // % 37 (~1/37 of the corpus), not the siblings' % 7: the oracle
        // only needs the retraction semantics — bin moves, min/max
        // recovery through sibling re-reduce — which a ~140-doc batch at
        // sf0.1 exercises fully, while the % 7 batch dirtied nearly every
        // (source, bin) pair and made this family's one-time build the
        // single heaviest driver bench entry (29.6s, VERDICT r8 #5).
        val updates = docs.filter(_.doc_id % 37 == 0)
          .map(d => d.copy(text = d.text +
            " twenty more revision tokens appended to move this doc up bins"))
        Phases.timedUpdate("q89", ex)(ex.execute(updates))
        preV0
      }
      (store, preV)
    }
    (Memo.memo(updatedHandles, (s, "q89", dir))(
      new Executer(LengthHistIndex, path, cfg))
      .asInstanceOf[Executer[DocLen, HistRow]], v)
  }

  /** Built-base-store cache + clone (VERDICT r5 #4): every index-update
    * query needs a freshly-built base store to run its mutation cycle
    * against. The base build is pure in (query, source dir), so it is
    * built ONCE per process into a pristine cached store; each
    * invocation then mutates a cheap local-filesystem COPY (an sf0.1
    * store is tens of MB — copying is orders cheaper than re-running
    * the corpus build), preserving oracle isolation: the shared
    * pristine copy is never mutated. The first invocation in a process
    * still pays its one build; every repeat (local iteration, a driver
    * that materializes twice) pays only copy + update — which is also
    * the honest accounting: the build is the once-per-corpus cost, the
    * update is what the query exists to measure. */
  private val baseStores =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def baseStoreOf(key: String, dir: String,
      task: MapReduceTask[_, _], taskCfg: ExecuterConfig)(
      build: String => Unit): String =
    Memo.memo(baseStores, (key, dir)) {
      // Phase line per one-time base build: the sweep's tail is these
      // builds, and a bench anomaly must say WHICH store's build ate
      // the time (the q59b lesson, VERDICT r6 #2).
      Phases.timed(key, "base_store_build") {
        val p = TempStores.scratch(s"graft-base-$key")
        // Cross-RUN disk cache (Bench only; tag matches the SharedBuilds
        // entry name): pristine base stores are pure in (task, testdata)
        // — every mutation runs on a per-invocation clone, never here.
        // Task identity + layout config fold into the entry so either
        // changing invalidates it without a version bump (VERDICT r10 #6).
        // The extra comes from the one canonical map; the require pins
        // the caller's (task, cfg) pairing to it, so a drifted warmBase
        // case fails loudly at build time instead of caching under a
        // wrong shape.
        val extra = cacheExtras(s"base-$key")
        require(extra == StoreCache.keyOf(task, taskCfg),
          s"base-$key: builder task/cfg disagrees with cacheExtras")
        StoreCache.orBuild(s"base-$key", dir, p, extra)(d => { build(d); 0L })
        p
      }
    }

  /** Warm (or reuse) the memoized base store for `key`, then clone it
    * for this invocation's private mutation — the query-body entry
    * point. The build spelling lives ONLY in [[warmBase]], so the warm
    * section and the query bodies cannot drift. */
  private def clonedBase(key: String, s: SparkSession, dir: String): String = {
    warmBase(key, s, dir)
    Phases.timed(key, "store_clone")(
      TempStores.cloneOf(baseStores((key, dir)), s"graft-run-$key"))
  }

  // ---- shared-build surface (VERDICT r8 #1) --------------------------
  // The one-time base-store builds, exposed so the bench can run each
  // as its OWN separately-attributed `build:` cost entry instead of
  // billing it to whichever family query happens to execute first.
  // Each warm spelling is THE SAME memoized builder the query bodies
  // call — no second spelling to drift.

  private[ops] def baseBuilt(key: String, dir: String): Boolean =
    baseStores.contains((key, dir))
  private[ops] def q89Built(dir: String): Boolean =
    updatedStores.contains(("q89", dir))

  // Bench-fixture layout for the maintained-index stores. A store's
  // update latency is dominated by FIXED per-partition machinery (the
  // ProfileUpdate anatomy, SURVEY §18.7) times partitions touched, and
  // doc-keyed indexes dirty every partition on any slice — so the
  // fixture uses the smallest layout that still exercises multi-parent
  // fan-in and multi-partition re-reduce (VERDICT r14 #2 "lighter store
  // config"). Correctness is layout-independent (every query is
  // oracle-gated); a 100 TB deployment raises both numbers.
  private def fixtureCfg = ExecuterConfig(fanIn = 8, finalParts = 4)

  /** Task identity per base-store key — ONE spelling feeding both
    * [[warmBase]]'s builders (via the require in [[baseStoreOf]]) and
    * [[cacheExtras]], so the planner's staleness probe and the restore
    * path can never disagree about an entry's shape. */
  private val baseTasks: Map[String, MapReduceTask[_, _]] = Map(
    "q29" -> MinHashIndex, "q64" -> WinnowIndex, "q37" -> IvfCellIndex,
    "q77" -> ShingleFreqIndex, "q97" -> SimhashIndex,
    "q91" -> IvfCentroidIndex, "q78" -> EvalShingleIndex)

  /** The [[StoreCache]] `extra` per cache TAG (see
    * [[IndexQueries.cacheExtras]] for why the planner needs these). */
  private[graft] val cacheExtras: Map[String, String] =
    baseTasks.map { case (k, t) =>
      s"base-$k" -> StoreCache.keyOf(t, fixtureCfg)
    } + ("q89" -> StoreCache.keyOf(LengthHistIndex, fixtureCfg))
  private def docTexts(s: SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id".cast("long") as "doc_id", $"text")
      .repartition(cpuWidth(s)).as[DocText]
  }
  private def vecDocs(s: SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id".cast("long") as "vec_id", $"embedding")
      .repartition(cpuWidth(s)).as[VecDoc]
  }

  /** Build (memoize) the base store for `key` without cloning or
    * updating — the warm-section entry point. q89 warms its whole
    * one-time pipeline (base + clone + update) since the updated store
    * is itself memoized and shared by q89/q89b. */
  private[ops] def warmBase(key: String, s: SparkSession, dir: String): Unit = {
    implicit val spark: SparkSession = s
    key match {
      case "q29" => baseStoreOf(key, dir, MinHashIndex, fixtureCfg)(p =>
        new Executer(MinHashIndex, p, fixtureCfg).execute(docTexts(s, dir)))
      case "q64" => baseStoreOf(key, dir, WinnowIndex, fixtureCfg)(p =>
        new Executer(WinnowIndex, p, fixtureCfg).execute(docTexts(s, dir)))
      case "q37" => baseStoreOf(key, dir, IvfCellIndex, fixtureCfg)(p =>
        new Executer(IvfCellIndex, p, fixtureCfg).execute(vecDocs(s, dir)))
      case "q77" => baseStoreOf(key, dir, ShingleFreqIndex, fixtureCfg)(p =>
        new Executer(ShingleFreqIndex, p, fixtureCfg).execute(docTexts(s, dir)))
      case "q97" => baseStoreOf(key, dir, SimhashIndex, fixtureCfg)(p =>
        new Executer(SimhashIndex, p, fixtureCfg).execute(docTexts(s, dir)))
      case "q91" => baseStoreOf(key, dir, IvfCentroidIndex, fixtureCfg)(p =>
        new Executer(IvfCentroidIndex, p, fixtureCfg).execute(vecDocs(s, dir)))
      case "q78" => baseStoreOf(key, dir, EvalShingleIndex, fixtureCfg)(p =>
        new Executer(EvalShingleIndex, p, fixtureCfg)
          .execute(docTexts(s, dir).filter(_.doc_id % 97 == 0)))
      case "q89" => lengthHistUpdated(s, dir)
      case other => throw new IllegalArgumentException(s"no base build: $other")
    }
    ()
  }

  val queries: Map[String, Q] = Map(
    // Build the signature index over all documents, then incrementally
    // re-submit the ~1/43 of documents whose text changed (an appended
    // revision marker); the returned state must equal a from-scratch
    // signature computation over the post-update corpus (the oracle).
    "q29_minhash_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long") as "doc_id", $"text")
        .repartition(cpuWidth(s)).as[DocText]
      val store = clonedBase("q29", s, dir)
      val ex = new Executer(MinHashIndex, store,
        fixtureCfg)
      // % 43 slice (the q64/q91 doctrine, VERDICT r9 #5 — extended to
      // the %7 siblings in r15 to close the forced-cold tail): the
      // incremental ≡ batch proof needs retraction + re-reduce
      // semantics, which ~1/43 of the corpus exercises fully, while the
      // 1/7 batch re-ran the minhash kernel over 5k docs and priced the
      // query out of a throttled cold host's budget.
      val updates = docs.filter(_.doc_id % 43 == 0)
        .map(d => d.copy(text = d.text + " xrevision"))
      Phases.timedUpdate("q29", ex)(ex.execute(updates))
      ex.queryAll().select($"doc_id", $"mh0", $"mh1", $"mh2", $"mh3",
        $"mh4", $"mh5", $"mh6", $"mh7")
    },

    // Winnowing fingerprint index under the same incremental ≡ batch
    // proof: build over all documents, re-submit the ~1/29 mutated slice,
    // return the maintained state (vs a from-scratch oracle recompute).
    "q64_winnow_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long") as "doc_id", $"text")
        .repartition(cpuWidth(s)).as[DocText]
      val store = clonedBase("q64", s, dir)
      val ex = new Executer(WinnowIndex, store,
        fixtureCfg)
      // % 29, not the siblings' % 7 (the q89/q77 doctrine, VERDICT r9
      // #5): the oracle needs retraction + re-reduce semantics, which a
      // ~1/29 slice exercises fully, while the 1/7 batch re-ran the
      // winnow kernel over 1/7 of the corpus and made this the round-9
      // sweep's heaviest entry (19.5s under digest-class throttle).
      val updates = docs.filter(_.doc_id % 29 == 0)
        .map(d => d.copy(text = d.text + " xrevision marker words here"))
      Phases.timedUpdate("q64", ex)(ex.execute(updates))
      ex.queryAll().select($"doc_id", $"n_fps", $"fps_digest")
    },

    // Build the IVF cell index over all embeddings, then incrementally
    // re-submit the ~1/43 of vectors that were re-embedded (negated —
    // which provably moves them to the complement cell); state must
    // equal the from-scratch assignment over the post-update corpus.
    "q37_ivf_cell_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val vecs = t(s, dir, "embeddings")
        .select($"vec_id".cast("long") as "vec_id", $"embedding")
        .repartition(cpuWidth(s)).as[VecDoc]
      val store = clonedBase("q37", s, dir)
      val ex = new Executer(IvfCellIndex, store,
        fixtureCfg)
      // % 43 slice (same doctrine as q91 below; r15).
      val updates = vecs.filter(_.vec_id % 43 == 0)
        .map(v => v.copy(embedding = v.embedding.map(x => -x)))
      Phases.timedUpdate("q37", ex)(ex.execute(updates))
      ex.queryAll().select($"vec_id", $"cell")
    },

    // Corpus shingle-frequency table as a maintained index: build over
    // all documents, re-submit the ~1/59 mutated slice (text appended →
    // old shingles retracted, new ones added), return the maintained
    // (sh, ndocs) state; the oracle recomputes the same table from
    // scratch over the post-update corpus, so equality IS the
    // incremental ≡ batch proof for a many-docs-per-key reduce.
    "q77_shingle_freq_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long") as "doc_id", $"text")
        .repartition(cpuWidth(s)).as[DocText]
      val store = clonedBase("q77", s, dir)
      // Measured (round 11, do NOT retry): raising driverDirtyLimit to
      // 65536 so this update's ~25k dirty (shingle, parent) pairs take
      // the driver isin-pushdown path made the update 2× SLOWER (19-21s
      // vs ~9s quiet) — at that cardinality the pushed-down InSet
      // filters evaluate per-row over every scan with no row-group
      // pruning (random md5 min/max spans everything), while the
      // distributed join path shuffles once and prunes properly. The
      // 4096 default is the right cliff for this shape.
      val ex = new Executer(ShingleFreqIndex, store,
        fixtureCfg)
      // % 59 (~1.7% of the corpus; was % 29, before that the siblings'
      // % 7): an inverted index's dirty set is the batch's SHINGLE
      // fan-out, so even the 1/29 slice's ~170 docs dirtied tens of
      // thousands of (sh, bucket) pairs and stayed the sweep's one
      // double-digit entry (8-13s quiet, VERDICT r10 #8); the
      // retraction/insert semantics the oracle proves are fully
      // exercised by the smaller slice (the q89 % 37 doctrine,
      // VERDICT r8 #5 — the oracle SQL below carries the SAME modulus).
      val updates = docs.filter(_.doc_id % 59 == 0)
        .map(d => d.copy(text = d.text + " xrevision marker"))
      Phases.timedUpdate("q77", ex)(ex.execute(updates))
      ex.queryAll().select($"sh", $"ndocs")
    },

    // SimHash signature index under the incremental ≡ batch proof:
    // build over all documents, re-submit the ~1/43 mutated slice (new
    // words shift the bit votes), return the maintained state vs a
    // from-scratch oracle recompute over the post-update corpus.
    "q97_simhash_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long") as "doc_id", $"text")
        .repartition(cpuWidth(s)).as[DocText]
      val store = clonedBase("q97", s, dir)
      val ex = new Executer(SimhashIndex, store,
        fixtureCfg)
      // % 43 slice (same doctrine as q64 above; r15).
      val updates = docs.filter(_.doc_id % 43 == 0)
        .map(d => d.copy(text = d.text + " xrevision"))
      Phases.timedUpdate("q97", ex)(ex.execute(updates))
      ex.queryAll().select($"doc_id", $"simhash")
    },

    // IVF centroid table as a maintained index: build over all
    // embeddings, re-submit the ~1/29 re-embedded slice (negated —
    // provably moves each to the complement cell, so BOTH the old and
    // new cells' sums must update through retraction + re-reduce),
    // return the maintained per-(cell, dim) state; the oracle
    // recomputes centroids from scratch over the post-update vectors.
    "q91_ivf_centroid_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val vecs = t(s, dir, "embeddings")
        .select($"vec_id".cast("long") as "vec_id", $"embedding")
        .repartition(cpuWidth(s)).as[VecDoc]
      val store = clonedBase("q91", s, dir)
      val ex = new Executer(IvfCentroidIndex, store,
        fixtureCfg)
      // % 29 slice for the same reason as q64 above (VERDICT r9 #5):
      // negation still provably moves every updated vector to the
      // complement cell, so retraction + re-reduce of BOTH cells'
      // sums is exercised at a fraction of the digest cost.
      val updates = vecs.filter(_.vec_id % 29 == 0)
        .map(v => v.copy(embedding = v.embedding.map(x => -x)))
      Phases.timedUpdate("q91", ex)(ex.execute(updates))
      ex.queryAll()
        .select($"cell", $"n_vecs", posexplode($"qsum"))
        .toDF("cell", "n_vecs", "dim", "qsum")
        .select($"cell", $"dim".cast("int") as "dim", $"n_vecs", $"qsum",
          ($"qsum".cast("double") / ($"n_vecs" * 1000)) as "centroid")
    },

    // q88's length histogram as a maintained index: build over all
    // documents, re-submit the mutated slice whose text grew (appended
    // tokens move docs to HIGHER bins — the retraction path must clear
    // them from their old bins, including bin min/max recovery via
    // sibling re-reduce), return the maintained state; the oracle
    // recomputes the histogram from scratch over the post-update corpus.
    "q89_length_hist_index_update" -> { (s, dir) =>
      import s.implicits._
      lengthHistUpdated(s, dir)._1.queryAll()
        .select($"source", $"len_bin", $"docs", $"tokens",
          $"min_toks", $"max_toks")
    },

    // Corpus drift report — maintained state + time travel, no corpus
    // rescans: the per-(source, bin) delta between the histogram's
    // PRE-update generation (queryAllAt) and its current state answers
    // "what changed in the length distribution since the last batch?"
    // from two index reads. The oracle recomputes both histograms from
    // the raw documents and diffs them. Named q89b: shares q89's
    // built+updated store and runs warm right after it.
    "q89b_hist_drift" -> { (s, dir) =>
      import s.implicits._
      val (ex, v) = lengthHistUpdated(s, dir)
      val now = ex.queryAll().select($"source", $"len_bin",
        $"docs" as "docs_now", $"tokens" as "tokens_now")
      val before = ex.queryAllAt(v).select($"source", $"len_bin",
        $"docs" as "docs_before", $"tokens" as "tokens_before")
      now.join(before, Seq("source", "len_bin"), "full_outer")
        .na.fill(0L, Seq("docs_now", "tokens_now", "docs_before", "tokens_before"))
        .select($"source", $"len_bin",
          ($"docs_now" - $"docs_before") as "docs_delta",
          ($"tokens_now" - $"tokens_before") as "tokens_delta")
        .where($"docs_delta" =!= 0 || $"tokens_delta" =!= 0)
    },

    // Incremental decontamination: the eval-shingle probe list lives in
    // a maintained index. Build it from the initial benchmark slice
    // (doc_id % 97), then a NEW benchmark release lands (doc_id % 89) as
    // an UPDATE — only the new eval docs shingle; the list is never
    // recomputed. The maintained state then drives q66's broadcast
    // probe over the training side. At 100 TB the training scan is the
    // expensive leg either way; this keeps the probe-list maintenance
    // O(new benchmark), the reference's update contract applied to the
    // curation family. Oracle: from-scratch decontamination against the
    // union eval set.
    "q78_decontaminate_index_update" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      def docs = t(s, dir, "documents")
        .select($"doc_id".cast("long") as "doc_id", $"text")
        .repartition(cpuWidth(s)).as[DocText]
      // The %97 base probe-list build is pure in (query, dir) — cached
      // and cloned like the sibling index-update queries (VERDICT r5
      // #4); each invocation pays only the clone + the %89 benchmark-
      // release update it exists to measure.
      val store = clonedBase("q78", s, dir)
      val ex = new Executer(EvalShingleIndex, store,
        fixtureCfg)
      Phases.timedUpdate("q78", ex)(ex.execute(docs.filter(d => d.doc_id % 89 == 0 && d.doc_id % 97 != 0)))
      val evalSh = ex.queryAll().select($"sh")
      val trainSh = Curation.shingleStream(s, dir, 4)
        .where($"doc_id" % 97 =!= 0 && $"doc_id" % 89 =!= 0)
      trainSh.join(org.apache.spark.sql.functions.broadcast(evalSh), "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)) as "contaminated_shingles")
    })

  // Lockstep DuckDB mirror of the MinHashSigs double-hash kernel (see
  // functions/MinHashSigs.scala and ops/Dedup.mhSql).
  private def mhSql(seed: Int): String = {
    val h1 = "('0x'||substr(md5(x),1,16))::UBIGINT::HUGEINT"
    val h2 = "('0x'||substr(md5(x),17,16))::UBIGINT::HUGEINT"
    s"list_min(list_transform(sh, x -> lower(lpad(to_hex((($h1 + " +
      s"$seed*$h2) % 18446744073709551616::HUGEINT)::UBIGINT),16,'0'))))"
  }

  val oracles: Map[String, String] = Map(
    "q29_minhash_index_update" ->
      s"""WITH src AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    CASE WHEN doc_id % 43 = 0 THEN text || ' xrevision' ELSE text END AS text
         |  FROM documents),
         |w AS (SELECT doc_id, string_split_regex(text, '[ \\t\\n\\f\\r]+') AS ws FROM src),
         |d AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, len(ws) - 2),
         |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
         |  FROM w WHERE len(ws) >= 3)
         |SELECT doc_id, ${(0 until NumHashes).map(i => s"${mhSql(i)} AS mh$i").mkString(", ")}
         |FROM d""".stripMargin,
    "q64_winnow_index_update" ->
      """WITH src AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CASE WHEN doc_id % 29 = 0
        |      THEN text || ' xrevision marker words here' ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS ws FROM src),
        |g AS (
        |  SELECT doc_id, list_transform(
        |    generate_series(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS kg
        |  FROM w WHERE len(ws) >= 8),
        |h AS (SELECT doc_id, list_transform(kg, x -> md5(x)) AS hs FROM g),
        |m AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(hs) - 4),
        |    i -> list_min(hs[i:i+4]))) AS fps
        |  FROM h)
        |SELECT doc_id, CAST(len(fps) AS INT) AS n_fps,
        |  md5(array_to_string(list_sort(fps), '|')) AS fps_digest
        |FROM m""".stripMargin,
    "q37_ivf_cell_index_update" ->
      """WITH src AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    CASE WHEN vec_id % 43 = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> -x)
        |      ELSE embedding::DOUBLE[] END AS e
        |  FROM embeddings)
        |SELECT vec_id,
        |  (SELECT CAST(sum(CASE WHEN
        |      (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |       FROM (SELECT unnest(e) AS emb,
        |                    generate_subscripts(e, 1) AS i) ei) >= 0
        |      THEN power(2, b.bit) ELSE 0 END) AS INT)
        |   FROM (SELECT unnest(generate_series(0, 7)) AS bit) b) AS cell
        |FROM src""".stripMargin,
    "q77_shingle_freq_index_update" ->
      """WITH src AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CASE WHEN doc_id % 59 = 0
        |      THEN text || ' xrevision marker' ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS ws FROM src),
        |d AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(ws) - 2),
        |    i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))) AS sh
        |  FROM w WHERE len(ws) >= 3)
        |SELECT sh, count(*) AS ndocs FROM d GROUP BY sh""".stripMargin,
    "q97_simhash_index_update" ->
      """WITH src AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CASE WHEN doc_id % 43 = 0 THEN text || ' xrevision'
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |CAST((SELECT sum(CASE WHEN
        |    (SELECT sum(CASE WHEN substr(md5(w.w), b.bit + 1, 1) >= '8'
        |       THEN 1 ELSE -1 END)
        |     FROM (SELECT unnest(list_distinct(string_split_regex(text, '[ \t\n\f\r]+'))) AS w) w) >= 0
        |  THEN power(2, b.bit) ELSE 0 END)
        |  FROM (SELECT unnest(generate_series(0, 15)) AS bit) b) AS INT) AS simhash
        |FROM src""".stripMargin,
    "q91_ivf_centroid_index_update" ->
      """WITH src AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    CASE WHEN vec_id % 29 = 0
        |      THEN list_transform(embedding::DOUBLE[], x -> -x)
        |      ELSE embedding::DOUBLE[] END AS e
        |  FROM embeddings),
        |cells AS (
        |  SELECT vec_id, e,
        |    (SELECT CAST(sum(CASE WHEN
        |        (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |         FROM (SELECT unnest(e) AS emb,
        |                      generate_subscripts(e, 1) AS i) ei) >= 0
        |        THEN power(2, b.bit) ELSE 0 END) AS INT)
        |     FROM (SELECT unnest(generate_series(0, 7)) AS bit) b) AS cell
        |  FROM src),
        |expl AS (
        |  SELECT cell,
        |    unnest(generate_series(1, len(e))) - 1 AS dim,
        |    CAST(floor(unnest(e) * 1000 + 0.5) AS BIGINT) AS qc
        |  FROM cells)
        |SELECT cell, CAST(dim AS INT) AS dim,
        |  count(*) AS n_vecs,
        |  CAST(sum(qc) AS BIGINT) AS qsum,
        |  CAST(sum(qc) AS DOUBLE) / (1000 * count(*)) AS centroid
        |FROM expl GROUP BY cell, dim""".stripMargin,
    "q89_length_hist_index_update" ->
      """WITH src AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 37 = 0 THEN text ||
        |      ' twenty more revision tokens appended to move this doc up bins'
        |      ELSE text END AS text
        |  FROM documents),
        |d AS (
        |  SELECT source, len(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS toks
        |  FROM src)
        |SELECT source, toks // 16 AS len_bin,
        |  count(*) AS docs,
        |  CAST(sum(toks) AS BIGINT) AS tokens,
        |  CAST(min(toks) AS INT) AS min_toks,
        |  CAST(max(toks) AS INT) AS max_toks
        |FROM d GROUP BY source, toks // 16""".stripMargin,
    // Both generations recomputed from the raw documents, then diffed —
    // must equal the engine's two-index-read drift report.
    "q89b_hist_drift" ->
      """WITH oldd AS (
        |  SELECT source, len(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS toks
        |  FROM documents),
        |oldh AS (
        |  SELECT source, toks // 16 AS len_bin, count(*) AS docs,
        |    sum(toks) AS tokens
        |  FROM oldd GROUP BY 1, 2),
        |newd AS (
        |  SELECT source, len(regexp_extract_all(
        |    CASE WHEN doc_id % 37 = 0 THEN text ||
        |      ' twenty more revision tokens appended to move this doc up bins'
        |      ELSE text END, '[^ \t\n\f\r]+')) AS toks
        |  FROM documents),
        |newh AS (
        |  SELECT source, toks // 16 AS len_bin, count(*) AS docs,
        |    sum(toks) AS tokens
        |  FROM newd GROUP BY 1, 2)
        |SELECT COALESCE(n.source, o.source) AS source,
        |  CAST(COALESCE(n.len_bin, o.len_bin) AS BIGINT) AS len_bin,
        |  CAST(COALESCE(n.docs, 0) - COALESCE(o.docs, 0) AS BIGINT) AS docs_delta,
        |  CAST(COALESCE(n.tokens, 0) - COALESCE(o.tokens, 0) AS BIGINT) AS tokens_delta
        |FROM newh n FULL OUTER JOIN oldh o
        |  ON n.source = o.source AND n.len_bin = o.len_bin
        |WHERE COALESCE(n.docs, 0) <> COALESCE(o.docs, 0)
        |   OR COALESCE(n.tokens, 0) <> COALESCE(o.tokens, 0)""".stripMargin,
    "q78_decontaminate_index_update" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(text, '[ \t\n\f\r]+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 3),
        |    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |             w[i+3])))) AS sh
        |  FROM ws WHERE len(w) >= 4),
        |ev AS (SELECT DISTINCT sh FROM sh
        |       WHERE doc_id % 97 = 0 OR doc_id % 89 = 0),
        |train AS (SELECT doc_id, sh FROM sh
        |          WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0)
        |SELECT train.doc_id, count(*) AS contaminated_shingles
        |FROM train JOIN ev USING (sh)
        |GROUP BY train.doc_id""".stripMargin
  )
}
