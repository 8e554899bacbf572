package graft.streaming

import java.nio.file.{Files, Paths}

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, struct, upper}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{Executer, ExecuterConfig, MapReduceTask}

/** A join consumer's operational health — [[CdcHealth]]'s two-upstream
  * twin (same field semantics per side; see
  * [[JoinCdcConsumer.health]]). */
case class JoinCdcHealth(
    leftCursor: Long,
    rightCursor: Long,
    leftUpstreamVersion: Long,
    rightUpstreamVersion: Long,
    leftLag: Long,
    rightLag: Long,
    resyncCount: Long,
    fallbackResyncCount: Long,
    lastPollChurn: Long)

/** Incremental EQUI-JOIN maintenance: a downstream maintained index
  * whose documents are the INNER JOIN of TWO upstream maintained
  * indexes' reduce rows, kept in sync through both upstreams' CDC
  * surfaces — never a rescan of either side.
  *
  * This is the composition the single-upstream [[CdcConsumer]] cannot
  * express, and the view-maintenance shape real pipelines run
  * constantly (facts ⋈ dimension: documents ⋈ their source metadata,
  * orders ⋈ customer). The classic difficulty of join maintenance —
  * "a dimension-side change invalidates every fact row holding that
  * key" — is exactly what the engine's keyed invalidation already
  * solves: both upstreams REDUCE on the join key, so a change on
  * EITHER side names the same downstream document id (the join key),
  * and one delete-and-reinsert of that key's joined row repairs the
  * view. Per poll the work is O(churn of both sides), never
  * O(|left| + |right|).
  *
  * Contract:
  *   - both upstreams' reduce keys ARE the join key (pre-aggregate a
  *     many-rows-per-key side into its upstream store first — that
  *     store is the join-key-grained view the join consumes);
  *   - the downstream task's documents are `(key, leftRow, rightRow)`
  *     tuples and `documentId` must return the key (the [[CdcConsumer]]
  *     chain contract, enforced by the engine's map-contract guard);
  *   - INNER semantics: a key living on only one side contributes no
  *     downstream document, and a key that LOSES either side is an
  *     explicit downstream delete.
  *
  * Delivery semantics match [[CdcConsumer]]: at-least-once with
  * idempotent application — the two-cursor file (`_cdc_cursor2`) lands
  * AFTER the downstream mutation, so a crash between them replays a
  * converging sync. Bootstrap joins two PINNED snapshots
  * (`queryAllAt` both sides — immutable, reproducible) distributed,
  * with the stale-downstream sweep on re-bootstrap; a cursor behind
  * either upstream's pruning horizon falls back to the same full
  * resync. `strict = true` rethrows incremental-poll failures instead
  * of resyncing (the q106-family doctrine: gated builds must fail on
  * an incremental-path bug, not be converged past it).
  *
  * Cross-store snapshot pinning: each completed sync appends a
  * (downGen, leftCursor, rightCursor) triple to the sync ledger — a
  * reader joining ACROSS the three stores pins all sides from one
  * [[syncLog]] row ([[cursorsAsOf]] maps a downstream generation back
  * to its upstream pair), immutable time-travel reads throughout, no
  * coordination with the writers.
  *
  * Scope note — the deliberate deltas from [[CdcConsumer]] (which
  * remains the one spelling of the SINGLE-upstream protocol; this class
  * carries the same cursor/ledger/resync/strict/health/`attach`
  * doctrine for the join shape, including the
  * [[CdcConsumer.MaxLedgerBytes]] ledger compaction): no `viaDiff`
  * (the changed-keys + refetch protocol is the only steady-state
  * mode — one diff feed cannot carry the OTHER side's half of a
  * joined row, so a diff-driven join poll would still refetch; the
  * refetch spelling states that honestly). A protocol fix landing in
  * either class should be checked against the other.
  */
class JoinCdcConsumer[
    RA <: Product: TypeTag, RB <: Product: TypeTag, RD <: Product: TypeTag](
    left: Executer[_, RA],
    right: Executer[_, RB],
    task: MapReduceTask[(String, RA, RB), RD],
    storePath: String,
    config: ExecuterConfig = ExecuterConfig(),
    strict: Boolean = false)(implicit spark: SparkSession) {

  val executer = new Executer[(String, RA, RB), RD](task, storePath, config)

  private implicit val encRA: Encoder[RA] = Encoders.product[RA]
  private implicit val encRB: Encoder[RB] = Encoders.product[RB]
  private implicit val encDoc: Encoder[(String, RA, RB)] =
    Encoders.tuple(Encoders.STRING, encRA, encRB)
  private val aFields = encRA.schema.fieldNames.toSeq
  private val bFields = encRB.schema.fieldNames.toSeq

  private val cursorFile = Paths.get(storePath, "_cdc_cursor2")

  // Health counters ([[CdcConsumer]]'s doctrine, VERDICT r11 #5):
  // in-memory per consumer INSTANCE — a fleet scrapes them per process;
  // they deliberately reset on restart.
  @volatile private var _resyncCount = 0L
  @volatile private var _fallbackResyncCount = 0L
  @volatile private var _lastPollChurn = -1L

  /** Operational health, [[CdcConsumer.health]]'s semantics per side:
    * `leftLag`/`rightLag` = that upstream's generations not yet applied
    * (pre-bootstrap counts every published generation), `resyncCount` =
    * ALL full-snapshot syncs this instance performed (bootstrap +
    * horizon recovery + fallback), `fallbackResyncCount` = only those
    * triggered by an incremental-poll FAILURE (nonzero in steady state
    * means a retention window shorter than the poll cadence — the
    * resync-storm misconfiguration an operator must see),
    * `lastPollChurn` = dirty keys the last poll moved (−1 = the last
    * poll was a full-snapshot sync). */
  def health: JoinCdcHealth = {
    val (cl, cr) = cursors
    val (nl, nr) = (left.snapshotVersion(), right.snapshotVersion())
    JoinCdcHealth(
      leftCursor = cl, rightCursor = cr,
      leftUpstreamVersion = nl, rightUpstreamVersion = nr,
      leftLag = nl - cl, rightLag = nr - cr,
      resyncCount = _resyncCount,
      fallbackResyncCount = _fallbackResyncCount,
      lastPollChurn = _lastPollChurn)
  }

  /** The last (left, right) upstream generations fully applied;
    * (−1, −1) before the bootstrap sync. */
  def cursors: (Long, Long) =
    if (!Files.exists(cursorFile)) (-1L, -1L)
    else {
      val Array(l, r) = new String(Files.readAllBytes(cursorFile),
        java.nio.charset.StandardCharsets.UTF_8).trim.split(' ')
      (l.toLong, r.toLong)
    }

  private val cursorLogFile = Paths.get(storePath, "_cdc_cursor2_log")

  private def writeCursors(l: Long, r: Long): Unit = {
    // Sync ledger: the (downstream generation, left cursor, right
    // cursor) TRIPLE this sync produced — what makes a pinned
    // THREE-store read possible (see [[cursorsAsOf]]). Same crash
    // discipline as [[CdcConsumer]]'s ledger: the row lands BEFORE the
    // atomic cursor move (a crash between them can only produce a
    // duplicate row on replay, never a completed sync with no row), and
    // records are newline-PREFIXED so a torn append can only lose
    // itself, never merge into the following valid row.
    Files.write(cursorLogFile,
      s"\n${executer.snapshotVersion()} $l $r".getBytes(
        java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    compactLedgerIfOversized()
    val tmp = Paths.get(s"$cursorFile.tmp-${ProcessHandle.current().pid()}")
    Files.write(tmp, s"$l $r".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, cursorFile,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Ledger retention — [[CdcConsumer.compactLedgerIfOversized]]'s
    * contract verbatim (VERDICT r12 #5: a consumer polling for months
    * must not grow the ledger one line per poll forever): past
    * [[CdcConsumer.MaxLedgerBytes]] the file is rewritten to the newest
    * [[CdcConsumer.KeptLedgerRows]] rows via write-tmp-then-atomic-move
    * (a crash mid-compaction leaves the original intact). Entries that
    * age out are dead weight anyway — their pinned `queryAllAt` reads
    * fail by manifest-retention contract. */
  private[graft] def compactLedgerIfOversized(): Unit =
    if (Files.exists(cursorLogFile) &&
        Files.size(cursorLogFile) > CdcConsumer.MaxLedgerBytes) {
      val kept = syncLog.takeRight(CdcConsumer.KeptLedgerRows)
      val tmp = Paths.get(
        s"$cursorLogFile.tmp-${ProcessHandle.current().pid()}")
      Files.write(tmp,
        kept.map { case (g, l, r) => s"$g $l $r\n" }.mkString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, cursorLogFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** The sync ledger: every completed sync's (downstream generation,
    * left cursor, right cursor) triple, oldest first. Malformed
    * trailing lines (a crash mid-append) are skipped — the cursor
    * file, written after, is the source of truth for resuming; the
    * ledger only serves pinned cross-store reads. */
  def syncLog: Seq[(Long, Long, Long)] =
    if (!Files.exists(cursorLogFile)) Seq.empty
    else new String(Files.readAllBytes(cursorLogFile),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.flatMap { line =>
        line.split(' ') match {
          case Array(g, l, r) =>
            try Some((g.toLong, l.toLong, r.toLong)) catch {
              case _: NumberFormatException => None
            }
          case _ => None
        }
      }.toSeq

  /** The upstream cursors in effect at downstream generation `downGen`
    * — the generations whose `queryAllAt` reads are CONSISTENT with
    * `executer.queryAllAt(downGen)`: the pinned three-store read is
    * `(executer.queryAllAt(g), left.queryAllAt(l), right.queryAllAt(r))`
    * from one [[syncLog]] row. (−1,−1) if `downGen` predates the
    * retained history. Defined ONLY at recorded sync completions: a
    * generation between two ledger rows is a half-applied sync batch
    * (one poll can publish several downstream generations — execute
    * then deleteDocuments — and records only the final one), consistent
    * with NEITHER neighbor's cursors, so asking for one THROWS instead
    * of returning a plausible wrong pin (the [[CdcConsumer.cursorAsOf]]
    * contract). */
  def cursorsAsOf(downGen: Long): (Long, Long) = {
    val log = syncLog
    val hits = log.filter(_._1 == downGen)
    if (hits.nonEmpty) hits.map(t => (t._2, t._3)).max
    else if (log.forall(_._1 > downGen)) (-1L, -1L)
    else throw new IllegalArgumentException(
      s"downstream generation $downGen is not a recorded sync " +
        "completion: it names a half-applied sync batch (or a non-CDC " +
        "mutation), consistent with no single upstream cursor pair — " +
        "pin three-store reads from a syncLog row's (downGen, lCursor, " +
        "rCursor) triple")
  }

  /** One side's pinned snapshot as (join key, payload struct) — the
    * positional rename keeps the key addressable even if the payload
    * type itself has a `reduce_key` field (the [[CdcConsumer]] resync
    * doctrine). */
  private def snapSide(ex: Executer[_, _], at: Long, fields: Seq[String],
      keyCol: String, payloadCol: String) = {
    val df = ex.queryAllAt(at).toDF(("__graft_reduce_key" +: fields): _*)
    df.select(col("__graft_reduce_key") as keyCol,
      struct(fields.map(df.col): _*) as payloadCol)
  }

  /** Full (re)sync: distributed inner join of the two pinned snapshots,
    * stale-downstream sweep, upsert, land both cursors. Serves the
    * bootstrap AND the past-the-horizon fallback. */
  private def resync(al: Long, ar: Long): (Long, Long) = {
    _resyncCount += 1
    _lastPollChurn = -1L
    val joined = snapSide(left, al, aFields, "_1", "_2")
      .join(snapSide(right, ar, bFields, "_1", "_3"), "_1")
      .select("_1", "_2", "_3")
    if (!executer.isEmptyStore) {
      // Ids present downstream but absent from the joined key set —
      // keys that lost a side while this consumer was blind would
      // otherwise stay stale forever. Post-normalization compare, same
      // as the engine's own id handling; bounded by the stale count.
      val stale = executer.documentIds()
        .join(joined.select(upper(col("_1")) as "doc_id"),
          Seq("doc_id"), "left_anti")
        .collect().map(_.getString(0)).sorted.toSeq
      if (stale.nonEmpty) executer.deleteDocuments(stale)
    }
    executer.execute(joined.as[(String, RA, RB)])
    writeCursors(al, ar)
    (al, ar)
  }

  /** One consumer poll over BOTH upstreams. Bootstrap (no cursors yet):
    * join the two snapshots pinned at `bootstrapAt` (default: both
    * current generations). Steady state: the dirty key set is the UNION
    * of both sides' `changedKeysSince` feeds; refetch both sides'
    * current rows for exactly those keys (point-pruned `queryKeys`),
    * re-execute the keys holding both sides, delete the keys that lost
    * one. Driver-side work is O(churn), the bound the CDC surface
    * exists to keep small. Returns the new cursors. */
  def syncOnce(
      bootstrapAt: Option[(Long, Long)] = None): (Long, Long) = synchronized {
    val (cl, cr) = cursors
    val (nl, nr) = (left.snapshotVersion(), right.snapshotVersion())
    require(nl >= 0 && nr >= 0,
      "JoinCdcConsumer needs manifest upstream stores with at least one " +
        "published generation each")
    if (cl < 0) {
      val (al, ar) = bootstrapAt.getOrElse((nl, nr))
      require(al >= 0 && al <= nl && ar >= 0 && ar <= nr,
        s"bootstrapAt must name published generations in ([0,$nl],[0,$nr]), " +
          s"got ($al,$ar)")
      return resync(al, ar)
    }
    require(bootstrapAt.isEmpty,
      s"bootstrapAt is a bootstrap-only parameter; cursors are ($cl,$cr)")
    // A cursor AHEAD of its upstream's head means the upstream was
    // regenerated at the same path, or this store was restored from a
    // newer backup than its upstreams — silently skipping that side's
    // feed and rewriting the cursor backward would leave every key
    // changed in the lost range stale forever. Fail loudly, like the
    // engine's own below-horizon reads (CdcConsumer inherits the same
    // loud failure from changedKeysSince's require).
    require(nl >= cl && nr >= cr,
      s"consumer cursors ($cl,$cr) are ahead of the upstream heads " +
        s"($nl,$nr): an upstream store was replaced or this store was " +
        "restored from a newer backup — rebuild the consumer (delete " +
        "_cdc_cursor2 to force a bootstrap resync) after verifying the " +
        "upstream paths")
    if (nl == cl && nr == cr) { _lastPollChurn = 0L; return (cl, cr) }
    if (cl < left.changedHorizonVersion() ||
        cr < right.changedHorizonVersion()) return resync(nl, nr)
    try incrementalPoll(cl, cr, nl, nr)
    catch { case scala.util.control.NonFatal(e) if !strict =>
      System.err.println(s"[graft][joincdc] incremental poll since=($cl,$cr) " +
        s"now=($nl,$nr) failed (${e.getClass.getSimpleName}: " +
        s"${String.valueOf(e.getMessage).take(200)}); falling back to " +
        "full resync")
      _fallbackResyncCount += 1
      resync(nl, nr)
    }
  }

  private def sideRows[P <: Product](ex: Executer[_, P], keys: Seq[String],
      fields: Seq[String])(implicit enc: Encoder[P]): Map[String, P] = {
    // Positional rename, same as resync's snapSide: queryKeys returns
    // `reduce_key` + the payload fields, so a payload type with its own
    // `reduce_key` field would otherwise make every column reference
    // ambiguous.
    val df = ex.queryKeys(keys).toDF(("__graft_reduce_key" +: fields): _*)
    implicit val encKV: Encoder[(String, P)] =
      Encoders.tuple(Encoders.STRING, enc)
    val rows = df.select(col("__graft_reduce_key"),
        struct(fields.map(df.col): _*) as "payload")
      .as[(String, P)].collect()
    // The join contract needs exactly one reduce row per key on each
    // side (pre-aggregate to the join-key grain upstream). A multi-row
    // key would be silently last-wins'd by the map — and the RESYNC
    // path would instead m×n-join it (then die on the engine's dup-id
    // guard) — so refuse loudly here, where the violation is visible.
    val dup = rows.groupBy(_._1).collectFirst { case (k, vs) if vs.length > 1 => k }
    require(dup.isEmpty,
      s"join upstream ${ex.storePath} returned multiple reduce rows for " +
        s"key '${dup.get}': JoinCdcConsumer upstreams must be single-output " +
        "per join key (pre-aggregate that side into its upstream store)")
    rows.toMap
  }

  private def incrementalPoll(cl: Long, cr: Long,
      nl: Long, nr: Long): (Long, Long) = {
    val dirty = (
      (if (nl > cl) left.changedKeysSince(cl).collect().map(_.getString(0))
       else Array.empty[String]) ++
      (if (nr > cr) right.changedKeysSince(cr).collect().map(_.getString(0))
       else Array.empty[String])).distinct.sorted.toSeq
    if (dirty.nonEmpty) {
      val lRows = sideRows(left, dirty, aFields)
      val rRows = sideRows(right, dirty, bFields)
      // Inner join over the dirty keys, sorted for a byte-identical
      // sync batch across runs.
      val live = dirty.flatMap(k =>
        for (a <- lRows.get(k); b <- rRows.get(k)) yield (k, a, b))
      if (live.nonEmpty) executer.execute(spark.createDataset(live))
      val liveKeys = live.map(_._1).toSet
      val vanished = dirty.filterNot(liveKeys)
      if (vanished.nonEmpty) executer.deleteDocuments(vanished)
    }
    _lastPollChurn = dirty.size.toLong
    writeCursors(nl, nr)
    (nl, nr)
  }

  /** Run this consumer as a continuous micro-batch job
    * ([[CdcConsumer.attach]]'s contract): each tick triggers one
    * [[syncOnce]] poll over BOTH upstream feeds. The tick stream only
    * paces the polls — cursors (not the checkpoint) carry the
    * protocol state, so a replayed batch converges like any crash
    * replay. */
  def attach(
      ticks: Dataset[_],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ticks.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        syncOnce(); ()
      }
      .start()

  def queryAll() = executer.queryAll()
}
