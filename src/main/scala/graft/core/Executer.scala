package graft.core

import java.net.URI

import scala.reflect.runtime.universe.TypeTag

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableBucketHash

/** Tuning constants of the bucketed reduce tree.
  *
  * Reference shape (`MapReduce/Executer.cs:23,62,297`): 65,536 map buckets
  * (= fanIn²) per reduce key, collapsed by `bucket / fanIn` into ≤256
  * level-1 partials, then one final result per key — bounding incremental
  * update cost to O(changed docs + 2·fanIn) records per touched key,
  * independent of dataset size.
  *
  * `finalParts` partitions the final-results table by a hash of the reduce
  * key so a point query prunes to 1/finalParts of the table.
  */
final case class ExecuterConfig(
    fanIn: Int = 256,
    finalParts: Int = 64,
    driverDirtyLimit: Int = 4096,
    tombstoneLimit: Int = 1 << 17,
    manifests: Boolean = true,
    manifestRetention: Int = 2,
    manifestGraceMs: Long = 600000L,
    rebuildDirtyFraction: Double = 0.5) {
  val buckets: Int = fanIn * fanIn
}
// `manifests` governs FRESH stores only: an existing store keeps the layout
// it was built with (a `_current` pointer on disk means manifest reads; its
// absence on a non-empty store means the legacy listing+seqlock protocol).
// `manifestRetention`/`manifestGraceMs`: a retired data file is deleted only
// once it is BOTH ≥ retention generations old AND ≥ grace millis old, so any
// reader holding a recent snapshot never loses a file under it.
// `rebuildDirtyFraction`: an update whose dirty (key, parent) pair set
// covers at least this fraction of the live level-1 partials takes the
// single-write rebuild path instead of incremental maintenance (the
// incremental spelling would pay tombstone append + a near-total sibling
// re-reduce + the merge-on-read overlay, strictly more than a rebuild —
// measured 2.8× at a 10k-doc bulk re-submit over a 456k-doc corpus).
// Double.PositiveInfinity disables the fallback. Manifest stores only.

/** One generation of a manifest store's file layout (SURVEY §14): the
  * exact live data files per table, the current local-tombstone file, and
  * the retired files awaiting GC. Published as `_manifests/m<version>`
  * with `_current` atomically renamed to point at it; data files are
  * immutable and never change path, so a resolved snapshot stays readable
  * no matter how many mutations land after it. */
private[graft] final case class Retired(path: String, version: Long, millis: Long)
private[graft] final case class Snapshot(
    version: Long,
    live: Map[String, Vector[String]], // table name -> store-relative paths
    tombLocal: Option[String],         // "_tomb/t<seq>.bin"
    retired: Vector[Retired])

object Executer {
  /** The session's Hadoop configuration flattened to plain entries for
    * the broadcast into [[copyBranchFiles]] (ADVICE r13: a bare
    * executor-default `new Configuration()` resolved scheme-less store
    * paths against `file://` and dropped `spark.hadoop.*` credentials).
    * An `Array[(String, String)]` survives ANY Spark serializer — a
    * custom Serializable wrapper with writeObject/readObject hooks does
    * not: Kryo (spark.serializer=KryoSerializer, common cluster-wide)
    * ignores Java serialization hooks for unregistered classes and
    * skips transient fields, which would deserialize the wrapped
    * Configuration as null on exactly the deployments the fix targets
    * (Spark registers its own private SerializableConfiguration with
    * Kryo's JavaSerializer for this reason). */
  private[core] def confEntries(
      conf: org.apache.hadoop.conf.Configuration): Array[(String, String)] = {
    val out = Array.newBuilder[(String, String)]
    val it = conf.iterator()
    while (it.hasNext) { val e = it.next(); out += ((e.getKey, e.getValue)) }
    out.result()
  }

  /** Task body of [[Executer.branchAt]]'s distributed file copy — a
    * static function (no Executer capture: the instance holds a
    * SparkSession and live FileSystems, none serializable). Each task
    * rebuilds the session's Hadoop config from the broadcast entries
    * (over loaded defaults); the roots arrive as fully-qualified URIs
    * (driver-side `makeQualified`), so resolution cannot depend on
    * executor-local filesystem defaults. */
  private[core] def copyBranchFiles(srcRoot: String, dstRoot: String,
      bconf: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
      : Iterator[String] => Unit = { rels =>
    val conf = new org.apache.hadoop.conf.Configuration(true)
    bconf.value.foreach { case (k, v) => conf.set(k, v) }
    val srcFs = FileSystem.get(URI.create(srcRoot), conf)
    val dstFs = FileSystem.get(URI.create(dstRoot), conf)
    rels.foreach { rel =>
      val to = new Path(s"$dstRoot/$rel")
      dstFs.mkdirs(to.getParent)
      if (!org.apache.hadoop.fs.FileUtil.copy(srcFs,
          new Path(s"$srcRoot/$rel"), dstFs, to, false, conf))
        throw new java.io.IOException(s"branchAt: copy failed for $rel")
    }
  }

  /** A reduce key's final-results partition — ONE definition shared by
    * the engine's pruned reads (`query`/`queryKeys`/point time travel)
    * and the external reader's [[graft.sources.StoreReader.pointQuery]].
    * Must agree with `pmod(hash(reduce_key), finalParts)` used on
    * write (Spark's Murmur3, seed 42). */
  private[graft] def fpartHash(key: String, finalParts: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(key),
      org.apache.spark.sql.types.StringType, 42L).toInt
    val m = h % finalParts
    if (m < 0) m + finalParts else m
  }

  /** First path segment of a store-relative file path = its table. */
  private[graft] def tableOf(rel: String): String = {
    val i = rel.indexOf('/')
    if (i < 0) rel else rel.substring(0, i)
  }

  /** The engine's case-insensitive document-id normalization (Spark's
    * UTF8String upper-casing — locale-stable where JDK toUpperCase is
    * not), shared so the external reader cannot drift from the ids the
    * engine stored. */
  private[graft] def normDocId(id: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(id)
      .toUpperCase.toString

  /** A normalized doc id's map partition under `fanIn` — the pure
    * function both [[Executer.contributionsOf]] and the external
    * reader prune by (buckets = fanIn², bucket / fanIn = parent). */
  private[graft] def parentOf(normId: String, fanIn: Int): Int =
    graft.functions.StableBucketHash.hash(normId, fanIn * fanIn) / fanIn

  /** Decode side of the length-prefixed UTF-8 string record used by
    * every driver-local state file — ONE definition shared by the
    * engine's readers and the external reader's tombstone decode so the
    * wire format cannot drift. Encode side: `Executer!.writeStr`. */
  private[graft] def decodeStr(in: java.io.DataInputStream): String = {
    val n = in.readInt()
    // Validated BEFORE allocating (ADVICE r9): a record written by a
    // different format (e.g. the pre-r9 writeUTF spelling, whose 2-byte
    // length plus 2 data bytes would be read here as one 4-byte length)
    // must fail as an explicit corrupt-record error, not as a
    // multi-GB allocation attempt. 16 MiB is far above any real
    // document id / reduce key and far below anything allocatable by
    // accident from reinterpreted bytes.
    if (n < 0 || n > (16 << 20)) throw new java.io.IOException(
      s"corrupt or unsupported string record: length $n out of range " +
        "(store written by an incompatible version?)")
    val b = new Array[Byte](n); in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The local-tombstone file codec, decode side — (doc_id, tomb_seq)
    * entries, max-merged per doc by the writer. Shared by the engine's
    * [[Executer!.readTombFile]] and the external reader's map-level
    * overlay ([[graft.sources.StoreReader.contributors]]). Encode side:
    * `addTombstonesLocal`. */
  private[graft] def decodeTombFile(
      in: java.io.DataInputStream): Seq[(String, Int)] = {
    val n = in.readInt()
    (0 until n).map(_ => (decodeStr(in), in.readInt()))
  }

  /** The driver-local changed-keys record codec, decode side (count +
    * length-prefixed keys) — shared by the engine's
    * [[Executer!.readChangedLocal]] and the external CDC poll
    * ([[graft.sources.StoreReader.changedKeysSince]]). Encode side: the
    * pre-publish archive in `publishModel`/`sentinelRecord`. */
  private[graft] def decodeKeyList(
      in: java.io.DataInputStream): Seq[String] = {
    val n = in.readInt()
    (0 until n).map(_ => decodeStr(in))
  }

  /** The manifest binary codec, decode side — ONE definition shared by
    * the engine's [[Executer!.readManifest]] and the external
    * lock-free reader ([[graft.sources.StoreReader]]), so the two can
    * never drift on the wire format. Encode side: `writeManifest`. */
  private[graft] def decodeManifest(in: java.io.DataInputStream): Snapshot = {
    val ver = in.readLong()
    val tl = in.readUTF()
    val n = in.readInt()
    val live = (0 until n).map(_ => in.readUTF()).toVector.groupBy(tableOf)
    val nr = in.readInt()
    val retired = (0 until nr).map(_ =>
      Retired(in.readUTF(), in.readLong(), in.readLong())).toVector
    Snapshot(ver, live, if (tl.isEmpty) None else Some(tl), retired)
  }

  /** On-disk store format version. Bump when ANY persisted layout
    * changes: table schemas/partitioning, manifest or WAL encoding,
    * tombstone format, state-file layout. Folded into the cross-run
    * [[graft.ops.StoreCache]] fingerprint so a format change can never
    * silently serve a previous build's store to the bench
    * (VERDICT r10 #6). */
  val FormatVersion = 1

  // One checksum-free state-file FileSystem per (scheme, authority),
  // shared by every Executer instance in the process (see `stateFs`).
  private val stateFsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  private[core] def stateFsFor(
      uri: URI, conf: org.apache.hadoop.conf.Configuration): FileSystem = {
    val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    stateFsCache.computeIfAbsent(key, _ => {
      val f = FileSystem.newInstance(uri, conf)
      f.setVerifyChecksum(false)
      f.setWriteChecksum(false)
      f
    })
  }
}

/** Per-batch maintenance observability — the reference's NLog step trace
  * (`MapReduce/Executer.cs:65-78,98-104`) re-expressed as metrics: which
  * maintenance mode ran, how many Spark actions it issued, and how much
  * state was dirty. Exposed via [[Executer.lastStats]] and logged. */
final case class MaintenanceStats(
    mode: String,
    sparkJobs: Int,
    incomingDocs: Long,
    dirtyPairs: Int,
    dirtyParents: Int,
    millis: Long)

/** Updatable, persistent, queryable map/reduce index on Spark.
  *
  * Spark-first re-expression of the reference engine
  * (`MapReduce/Executer.cs`): state lives in three partitioned Parquet
  * tables instead of one-JSON-file-per-record directory trees
  * (`Executer.cs:165-203,263-276`), and each filesystem hop of the
  * reference becomes a shuffle or a partition-pruned table scan:
  *
  *   - `map_results/`     partitioned by `parent` (= bucket/fanIn, ≤256
  *     values) — replaces `MapResults/<key>/<bucket>/<docId>`.
  *   - `reduce_tree/`     BOTH reduce levels in one table partitioned by
  *     (`level`, `part`): level=1/part=parent replaces
  *     `ReduceResults/One/<key>/<levelBucket>/<seq>`; level=2/part=fpart
  *     (= hash(key) mod finalParts) replaces `FinalResults/<key>`. One
  *     table means one incremental update rewrites the whole reduce tree
  *     in a SINGLE write job + partition swap.
  *   - `dirty/`           write-ahead dirty-set log — replaces the
  *     `Schedules tree` marker files (`Executer.cs:115-151`); written before
  *     any state mutation so a crash leaves buckets conservatively marked
  *     dirty, never silently wrong (§2.3.4 of SURVEY.md).
  *
  * Scale notes (the 100 TB design point):
  *   - No driver-side file listing anywhere: invalidation is a semi/anti
  *     join of the state table against the incoming ids (vs the
  *     reference's `Directory.GetFiles` scan, `Executer.cs:246`). AQE
  *     broadcasts the incoming side when the update batch is small.
  *   - The only values ever collected to the driver are the distinct
  *     dirty `parent` partition ids (≤ fanIn = 256 ints) and dirty
  *     `fpart` ids (≤ finalParts) — used to build partition-pruning
  *     filters for `INSERT OVERWRITE`-style dynamic partition rewrites.
  *   - Incremental recompute reads only dirty `parent` partitions
  *     (partition pruning) and only dirty keys within them (semi join).
  */
class Executer[D, R <: Product: TypeTag](
    task: MapReduceTask[D, R],
    val storePath: String,
    config: ExecuterConfig = ExecuterConfig(),
    lease: Option[LeaseProvider] = None)(implicit spark: SparkSession) {

  import spark.implicits._

  /** Sentinel `parent` value in the dirty WAL meaning "full rebuild". */
  private val FullRebuild = -1

  /** Minimum dirty-pair count before the rebuild-fallback check runs at
    * all: the check costs one metadata-only count job over the level-1
    * partials, which a small update (the steady-state maintenance loop)
    * must never pay. Below this floor the incremental path is always
    * cheaper than a rebuild anyway. */
  private val RebuildCheckFloor = 256

  /** Above `config.driverDirtyLimit` dirty (key, parent) pairs,
    * incremental maintenance switches from driver-side pruning (isin
    * pushdown, zero extra jobs) to the distributed join path. The 4096
    * default ≈ a few hundred KB of driver strings at worst, while keeping
    * per-doc-keyed indexes (signature/cell tables, dirty pairs ≈ 2 ×
    * batch docs) on the cheap path for multi-thousand-doc batches. */
  private val DriverDirtyLimit = config.driverDirtyLimit

  implicit private val encR: Encoder[R] = Encoders.product[R]
  implicit private val encKR: Encoder[(String, String, R)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING, encR)

  private val mapResultsPath = s"$storePath/map_results"
  private val treePath = s"$storePath/reduce_tree"
  private val dirtyPath = s"$storePath/dirty"
  private val leasePath = s"$storePath/_writer.lease"
  private val configPath = s"$storePath/_config"

  /** The bucket/partition layout is baked into the stored data: opening
    * a store with a different (fanIn, finalParts) would silently
    * mis-prune every lookup and mis-route every update. The layout is
    * persisted at first build and validated once per instance on every
    * entry point. Since round 15 the task's identity
    * ([[MapReduceTask.taskId]]) is persisted and validated alongside:
    * map rows and reduce tree are meaningful only under the task that
    * wrote them, so opening a store with a DIFFERENT named task (and
    * then updating it) would silently mix two tasks' outputs in one
    * index. Ids containing `$$anon$` are recorded but never enforced —
    * anonymous classes have no stable identity across recompiles.
    * Legacy stores (2-int `_config`, or none) are accepted as-is.
    * Checked lazily so constructing an Executer stays IO-free. */
  private lazy val configChecked: Unit = {
    val p = new Path(configPath)
    if (fs.exists(p)) {
      val in = new java.io.DataInputStream(stateFs.open(p))
      try {
        val (fi, fp) = (in.readInt(), in.readInt())
        require(fi == config.fanIn && fp == config.finalParts,
          s"store $storePath was built with fanIn=$fi finalParts=$fp " +
            s"but opened with fanIn=${config.fanIn} finalParts=${config.finalParts}")
        // Task-identity trailer (absent on pre-r15 stores: readUTF hits
        // EOF — accept). Enforced only when BOTH sides are named
        // classes; an anonymous id on either side never rejects.
        val stored = try Some(in.readUTF())
          catch { case _: java.io.EOFException => None }
        stored.foreach { sid =>
          val cur = task.taskId
          require(sid == cur || sid.contains("$$anon$") ||
              cur.contains("$$anon$"),
            s"store $storePath was built by task '$sid' but opened with " +
              s"task '${cur}': an index is only meaningful under the task " +
              "that wrote it (override MapReduceTask.taskId to pin the " +
              "old id across a rename, or point the new task at a new " +
              "store path)")
        }
      } finally in.close()
    } else if (!exists(mapResultsPath)) {
      // Fresh store: this instance's layout becomes the store's layout.
      // Atomic write-temp + rename — configChecked also runs on
      // lock-free READ paths, so a crash mid-write must never strand a
      // partial _config (every later open would die in readInt), and a
      // concurrent reader must never open a half-written file.
      fs.mkdirs(new Path(storePath))
      writeLocalAtomic(configPath) { out =>
        out.writeInt(config.fanIn); out.writeInt(config.finalParts)
        out.writeUTF(task.taskId)
      }
    } // else: pre-_config store — accept as-is.
  }
  // Merge-on-read invalidation state (see the tombstone section below).
  private val tombLocalPath = s"$storePath/tombstones.bin"
  private val tombDistPath = s"$storePath/tombstones"
  private val seqPath = s"$storePath/_seq"
  private val modPath = s"$storePath/_mod"
  private val epochPath = s"$storePath/_epoch"
  // Generation-manifest state (SURVEY §14): one small file per published
  // generation plus an atomically-renamed pointer to the current one.
  private val manifestsPath = s"$storePath/_manifests"
  private val currentPath = s"$storePath/_current"
  private val tombDirPath = s"$storePath/_tomb"

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Executer[_, _]])

  @volatile private var _lastStats: Option[MaintenanceStats] = None

  /** Stats of the most recent maintenance batch run through this
    * instance — mode chosen, Spark actions issued, dirty-set size. */
  def lastStats: Option[MaintenanceStats] = _lastStats

  // ---------------------------------------------------------------------
  // Single-writer lease — the reference is single-process by construction
  // (`MapReduce/Program.cs:13-45`); on a shared store the same contract
  // must be enforced, or two concurrent executes would interleave staging
  // renames and corrupt state. The claim mechanism is pluggable
  // ([[LeaseProvider]]): the default atomic create-if-absent is correct
  // on HDFS/local; object-store deployments pass a conditional-put
  // provider via the `lease` constructor parameter.
  // ---------------------------------------------------------------------

  private val leaseProvider: LeaseProvider =
    lease.getOrElse(new AtomicCreateLeaseProvider(() => fs, leasePath))

  private def acquireLease(): Unit = {
    fs.mkdirs(new Path(storePath))
    leaseProvider.acquire(
      s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}")
  }

  /** Force-release a lease left behind by a crashed writer (call
    * [[recover]] first to replay its WAL). */
  def breakLease(): Unit = leaseProvider.release()

  private def withLease[A](f: => A): A = {
    acquireLease()
    // EVERYTHING after a successful acquire runs inside the try: a
    // transient failure in beginMutation (an _epoch IO hiccup) or in
    // the pending-snapshot load (a corrupt manifest) must still release
    // the lease in the finally, or the store is wedged behind a lease
    // file no live writer holds until an operator breaks it manually.
    try {
      beginMutation()
      // Manifest stores load the writer-side pending generation here:
      // the published snapshot (or an empty one on a fresh store) that
      // every write step below mutates in memory and publishPending()
      // lands. Inside any locked context, `pending != null` ⇔ manifest
      // store.
      if (exists(currentPath) || (config.manifests && !exists(mapResultsPath))) {
        pending = publishedSnapshot().getOrElse(
          Snapshot(-1L, Map.empty, None, Vector.empty))
        pendingRev += 1
        pendingDirty = false
      }
      writerThread = Thread.currentThread().getId
      val r = f
      // Operations that mutate outside the WAL-cleared batch shape (the
      // auto-fold, compact's consolidation) land their generation here.
      // An EXCEPTION deliberately skips this: a half-applied batch must
      // stay invisible — its WAL survives and recovery replays it.
      publishPending()
      r
    } finally {
      writerThread = -1L
      pending = null
      try {
        endMutation()
        // Registered SQL views pin their plan (and parquet file
        // listing) at registration: re-resolve them against the
        // post-mutation layout so SQL reads stay current.
        try refreshViews()
        catch { case e: Throwable => log.warn(s"view refresh failed: $e") }
      } finally breakLease()
    }
  }

  // ---------------------------------------------------------------------
  // Reader/writer epoch — a seqlock over the store's file layout for
  // CONCURRENT EXTERNAL READERS (VERDICT r5 "What's missing #2"). The
  // partition swap renames each dirty directory aside and the staged one
  // in; a reader process listing the table between those two renames
  // would see the partition MISSING and return silently short results —
  // the reference never faces this (single-process), but a 100 TB store
  // is read by a query fleet while maintenance runs. Protocol: `_epoch`
  // holds a counter that is ODD while a writer holds the lease and is
  // mutating, EVEN when quiescent. Public reads ([[consistentRead]])
  // spin until they observe the same even epoch before AND after
  // building their plan (the parquet file listing happens eagerly at
  // plan build), so a successful read's listing is never torn. A swap
  // that lands AFTER the listing surfaces as a retriable read error at
  // scan time (the files were renamed away), never as silent loss —
  // optimistic snapshot isolation, the strongest guarantee a
  // directory-listing layout offers without a manifest layer.
  // ---------------------------------------------------------------------

  private def readEpoch(): Long =
    if (!exists(epochPath)) 0L
    else {
      val in = new java.io.DataInputStream(stateFs.open(new Path(epochPath)))
      try in.readLong() finally in.close()
    }

  /** Mark the store mutating (odd). Idempotent under a crashed writer's
    * stranded odd epoch — recovery's own begin/end pair heals it. */
  private def beginMutation(): Unit = {
    val e = readEpoch()
    if (e % 2 == 0) writeLocalAtomic(epochPath)(_.writeLong(e + 1L))
  }

  /** Mark the store quiescent again (even). */
  private def endMutation(): Unit = {
    val e = readEpoch()
    if (e % 2 == 1) writeLocalAtomic(epochPath)(_.writeLong(e + 1L))
  }

  /** Build a read plan only against a quiescent, unchanged epoch.
    * Bounded spin: a crashed writer strands an odd epoch until its WAL
    * is replayed, and a reader must degrade to best-effort rather than
    * block forever behind a corpse. */
  private def consistentRead[A](build: => A): A = {
    // Manifest stores need no spin: the plan is built from an immutable
    // published file list, valid regardless of concurrent mutations
    // (SURVEY §14.6 — the seqlock survives as the legacy-store fallback).
    if (pending != null || exists(currentPath)) return build
    var tries = 0
    while (tries < 64) {
      val e1 = readEpoch()
      if (e1 % 2 == 0) {
        val out = build
        if (readEpoch() == e1) return out
      }
      tries += 1
      Thread.sleep(math.min(200L, 5L * tries))
    }
    build
  }

  // ---------------------------------------------------------------------
  // Generation manifests (SURVEY §14) — lock-free stable snapshot reads.
  //
  // The seqlock above guarantees no SILENT loss, but a swap landing after
  // a read's file listing still surfaced as a retriable error (~38%
  // retriable under adversarial churn, SwapChurnDemo). The manifest layer
  // converts those retries into successes, Iceberg/Delta-style but scoped
  // to this engine's needs:
  //
  //   1. Data files are immutable and never change path. Every write
  //      stages to a scratch dir, then RENAMES its data files additively
  //      into the destination partition directories — replaced files stay
  //      where they are, retired in the manifest instead of moved aside.
  //   2. Each mutation step publishes `_manifests/m<version>` naming every
  //      live data file (map_results, reduce_tree, distributed tombstones)
  //      plus the current immutable local-tombstone file under `_tomb/`,
  //      then atomically renames `_current` to point at it. Readers
  //      resolve _current → manifest → exact file list; partition columns
  //      still derive from the paths (basePath), so pruning is unchanged.
  //   3. Retired files are GC'd only once BOTH `manifestRetention`
  //      generations and `manifestGraceMs` have passed, so a reader
  //      holding a recent snapshot never errors; compact() reclaims
  //      everything immediately (the explicit hammer) and sweeps orphans.
  //   4. Crash contract (STRONGER than the legacy path): the manifest is
  //      published after all of a batch's data renames and before the WAL
  //      clear, so a crash anywhere mid-batch leaves the whole batch
  //      invisible — readers keep the previous generation, the surviving
  //      WAL replays an idempotent re-reduce of published state, and the
  //      crashed batch's files (including its tombstone file, which the
  //      old manifest does not reference) are orphans that compact()
  //      sweeps. Re-submitting the batch applies it.
  //
  // Legacy stores (built pre-manifest, or with manifests=false) keep the
  // listing+seqlock+trash protocol untouched; reshapeTo migrates.
  // ---------------------------------------------------------------------

  /** Writer-side pending generation: non-null exactly while this instance
    * holds the lease on a manifest store. Mutated in memory by each write
    * step; published by [[publishPending]]. */
  @volatile private var pending: Snapshot = _
  private var pendingRev: Long = 0L // bumps per model mutation → plan-cache key
  private var pendingDirty = false
  // The thread currently mutating under the lease: only ITS reads may
  // resolve the half-applied `pending` generation (the writer must see
  // its own uncommitted merges); every other thread's read on this
  // instance resolves the last PUBLISHED snapshot, preserving the
  // "half-applied batch is invisible" contract for same-instance
  // concurrent readers too (not just separate reader processes).
  @volatile private var writerThread: Long = -1L

  private def readCurrentVersion(): Long =
    if (!exists(currentPath)) -1L
    else {
      val in = new java.io.DataInputStream(stateFs.open(new Path(currentPath)))
      try in.readLong() finally in.close()
    }

  private def manifestFile(v: Long): String = s"$manifestsPath/m$v"

  private def tableOf(rel: String): String = Executer.tableOf(rel)

  private def writeManifest(s: Snapshot): Unit =
    writeLocalAtomic(manifestFile(s.version)) { out =>
      out.writeLong(s.version)
      out.writeUTF(s.tombLocal.getOrElse(""))
      val all = s.live.valuesIterator.flatten.toVector
      out.writeInt(all.size); all.foreach(out.writeUTF)
      out.writeInt(s.retired.size)
      s.retired.foreach { r =>
        out.writeUTF(r.path); out.writeLong(r.version); out.writeLong(r.millis)
      }
    }

  private def readManifest(v: Long): Snapshot = {
    val in = new java.io.DataInputStream(stateFs.open(new Path(manifestFile(v))))
    try Executer.decodeManifest(in) finally in.close()
  }

  /** Parsed manifests by version — immutable once written, so the cache
    * never staleness-checks; bounded by eviction. */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Snapshot]()

  private def manifestAt(v: Long): Snapshot = {
    val hit = manifestCache.get(v)
    if (hit != null) hit
    else {
      val s = readManifest(v)
      if (manifestCache.size > 16) manifestCache.clear()
      manifestCache.put(v, s)
      s
    }
  }

  private def publishedSnapshot(): Option[Snapshot] = {
    val v = readCurrentVersion()
    if (v < 0) None else Some(manifestAt(v))
  }

  /** The file-layout snapshot governing a read: the writer's in-progress
    * generation while this instance holds the lease, else the published
    * manifest; None on legacy (listing-based) stores. */
  private def snapshotNow(): Option[Snapshot] = {
    val p = pending
    if (p != null && Thread.currentThread().getId == writerThread) Some(p)
    else publishedSnapshot().orElse {
      // A manifest store mid-FIRST-build has files on disk but nothing
      // published yet: a concurrent reader must see the empty store
      // (atomic batches), never a listing of half-merged files. A
      // LEGACY store (map_results but no manifest pointer) keeps its
      // listing-read + seqlock path via None.
      if (p != null || (config.manifests && !exists(mapResultsPath)))
        Some(Snapshot(-1L, Map.empty, None, Vector.empty))
      else None
    }
  }

  // ---- model mutators (writer-side, under the lease) -------------------

  private def modelAddFiles(rels: Seq[String]): Unit = if (rels.nonEmpty) {
    val byTable = rels.groupBy(tableOf)
    val live = byTable.foldLeft(pending.live) { case (acc, (t, fs)) =>
      acc.updated(t, acc.getOrElse(t, Vector.empty) ++ fs)
    }
    pending = pending.copy(live = live)
    pendingRev += 1; pendingDirty = true
  }

  /** Retire every live file under one partition directory (store-relative,
    * e.g. "reduce_tree/level=1/part=3"). The files stay on disk for
    * retained snapshots; GC removes them at publish time once both
    * retention conditions pass. */
  private def modelRetireDir(dirRel: String): Unit = {
    val table = tableOf(dirRel)
    val prefix = dirRel + "/"
    val (dead, keep) =
      pending.live.getOrElse(table, Vector.empty).partition(_.startsWith(prefix))
    retirePaths(dead, keepLive = pending.live.updated(table, keep))
  }

  private def modelRetireTable(table: String): Unit =
    retirePaths(pending.live.getOrElse(table, Vector.empty),
      keepLive = pending.live - table)

  private def retirePaths(dead: Seq[String],
      keepLive: Map[String, Vector[String]]): Unit = {
    pendingDirty = true
    if (dead.isEmpty) { pending = pending.copy(live = keepLive); return }
    val now = System.currentTimeMillis()
    pending = pending.copy(
      live = keepLive,
      retired = pending.retired ++
        dead.map(Retired(_, pending.version + 1, now)))
    pendingRev += 1
  }

  private def modelSetTombLocal(ref: Option[String]): Unit = {
    val old = pending.tombLocal
    pending = pending.copy(tombLocal = ref)
    pendingRev += 1; pendingDirty = true
    old.filter(o => !ref.contains(o)).foreach(o =>
      retirePaths(Seq(o), keepLive = pending.live))
  }

  /** Land the pending generation: GC retired files old enough that no
    * retained snapshot can reference them, write `m<version+1>`, flip
    * `_current`. No-op when nothing changed since the last publish. */
  private def publishPending(): Unit = {
    if (pending == null || !pendingDirty) return
    val v = pending.version + 1
    val now = System.currentTimeMillis()
    val (drop, keep) = pending.retired.partition(r =>
      v - r.version >= config.manifestRetention &&
        now - r.millis >= config.manifestGraceMs)
    drop.foreach { r =>
      try fs.delete(new Path(s"$storePath/${r.path}"), false)
      catch { case _: java.io.IOException => () }
    }
    val next = pending.copy(version = v, retired = keep)
    writeManifest(next)
    writeLocalAtomic(currentPath)(_.writeLong(v))
    // Old manifest files: unreferenced once no retained snapshot can
    // resolve them; same double condition as data files.
    if (exists(manifestsPath)) fs.listStatus(new Path(manifestsPath)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("m") && !name.contains(".")) {
        val mv = try name.drop(1).toLong catch { case _: NumberFormatException => v }
        if (v - mv >= math.max(config.manifestRetention.toLong, 4L) &&
            now - st.getModificationTime >= config.manifestGraceMs)
          fs.delete(st.getPath, false)
      }
    }
    pending = next
    pendingRev += 1
    pendingDirty = false
    manifestCache.put(v, next)
  }

  /** Rename every data file under `<destPath>.staging` into the
    * destination (additive — existing files untouched), delete the
    * staging dir, and return the new files' store-relative paths. */
  /** Hadoop `FileSystem.rename` reports many failures (destination
    * exists, source vanished, some HDFS permission/quota cases) by
    * returning FALSE rather than throwing. Every rename in a mutation
    * path must abort on false: proceeding would delete the staging dir
    * (silently destroying the un-renamed file) or publish a manifest
    * naming a file that never landed. */
  private def renameOrFail(src: Path, dest: Path): Unit =
    if (!fs.rename(src, dest))
      throw new java.io.IOException(s"rename failed: $src -> $dest")

  private def mergeStagedDir(destPath: String): Vector[String] = {
    val staging = new Path(s"$destPath.staging")
    val table = new Path(destPath).getName
    def walk(p: Path, rel: String): Vector[String] =
      fs.listStatus(p).toVector.flatMap { st =>
        val childRel =
          if (rel.isEmpty) st.getPath.getName else s"$rel/${st.getPath.getName}"
        if (st.isDirectory) walk(st.getPath, childRel)
        else if (st.getPath.getName.endsWith(".parquet")) Vector(childRel)
        else Vector.empty
      }
    val rels = if (fs.exists(staging)) walk(staging, "") else Vector.empty
    // Driver-side FS round trips, batched and parallelized (VERDICT r6
    // #2: the sandboxed driver's FS latency amplified the per-file
    // sequential loop 5-7×): mkdirs once per DIRECTORY, then the
    // renames — independent by construction (distinct sources, distinct
    // destinations) — fan out on the common pool. Any failure still
    // aborts BEFORE the staging delete below: the file would otherwise
    // be destroyed with the staging dir while the pending generation
    // already names its destination.
    rels.map(r => new Path(s"$destPath/$r").getParent).distinct
      .foreach(fs.mkdirs)
    val firstErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def rename(r: String): Unit =
      // Short-circuit once a rename failed: the whole merge aborts on
      // firstErr anyway, and each remaining blocking FS call would only
      // delay surfacing it.
      if (firstErr.get == null) {
        try renameOrFail(new Path(s"$destPath.staging/$r"), new Path(s"$destPath/$r"))
        catch { case t: Throwable => firstErr.compareAndSet(null, t) }
      }
    // Dedicated bounded pool, NOT the JVM-wide commonPool (ADVICE r7):
    // these are blocking filesystem calls, and parking them on
    // ForkJoinPool.commonPool could starve any other common-pool user
    // on the driver for the duration of the fan-out. Small batches
    // rename inline — thread startup would cost more than it saves.
    if (rels.size <= 4) rels.foreach(rename)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, rels.size))
      try {
        rels.foreach(r => pool.execute(() => rename(r)))
        pool.shutdown()
        // A timeout MUST abort (code-review r8): proceeding would delete
        // the staging dir with un-renamed files still in it while the
        // pending generation names their destinations — exactly the
        // destruction renameOrFail exists to prevent.
        if (!pool.awaitTermination(1L, java.util.concurrent.TimeUnit.HOURS))
          firstErr.compareAndSet(null, new java.io.IOException(
            s"mergeStagedDir: rename fan-out timed out for $destPath"))
      } finally pool.shutdownNow()
    }
    if (firstErr.get != null) throw firstErr.get
    fs.delete(staging, true)
    rels.map(r => s"$table/$r")
  }

  /** Stage-write `df` and merge its data files into `destPath`; returns
    * the new store-relative paths (NOT yet added to the model — callers
    * retire replaced dirs first, then add). */
  private def stagedWriteIn(df: DataFrame, destPath: String,
      partitionCols: Seq[String], clustered: Boolean): Vector[String] = {
    val staging = s"$destPath.staging"
    val pcols = partitionCols.map(col)
    val arranged =
      if (partitionCols.isEmpty) df
      else if (clustered) df.sortWithinPartitions(pcols :+ $"reduce_key": _*)
      else df.repartition(pcols: _*)
        .sortWithinPartitions(pcols :+ $"reduce_key": _*)
    val w = arranged.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging)
    mergeStagedDir(destPath)
  }

  /** Run tiny maintenance queries with 1-partition, non-adaptive
    * shuffles. In the driver-pruned path every shuffle moves ≤
    * [[DriverDirtyLimit]] rows by construction, but at the session's
    * defaults each action still fans out into one Spark job per AQE
    * stage at the full shuffle width — measured 25 jobs (~6 s of pure
    * scheduler/commit latency) for a 1-document update. With AQE off and
    * one shuffle partition the same update is a handful of single-stage
    * jobs; the update cost becomes O(dirty), not O(session width).
    * Safe to scope via session conf: the store lease guarantees no
    * concurrent maintenance, and reads (query/queryAll) never pass
    * through here. */
  /** Shuffle width for the distributed maintenance branch. Narrow
    * (8-wide, AQE off) ONLY when both hold: the store declares a small
    * shape (fanIn ≤ 32 parents), AND the batch itself is driver-small
    * (`idsSmall`: ≤ driverDirtyLimit documents — the branch is reached
    * when the dirty PAIR set overflowed, which a few hundred docs with
    * wide key fan-out do, q77's shingle updates being the measured
    * case: most of its wall clock was scheduling 32-wide stages over
    * kilobyte partitions). A batch that is large in DOCUMENTS is the
    * unbounded path by definition and keeps the session width and
    * AQE's skew handling regardless of the store declaration
    * (code-review r7). */
  private def distributedWidth[A](batchSmall: Boolean)(f: => A): A =
    if (batchSmall && config.fanIn <= 32)
      withTinyShuffle(8, codegenOff = false)(f)
    else f

  private def withTinyShuffle[A](
      parts: Int = 1, codegenOff: Boolean = true)(f: => A): A = {
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> parts.toString,
      // Whole-stage codegen compiles a new class per plan, and the
      // maintenance plans embed per-batch pruning literals — so a TINY
      // update would pay Janino compilation for rows it can count on one
      // hand; interpreted execution wins there. A multi-hundred-doc batch
      // rewrites enough rows that compiled row processing wins instead —
      // the caller picks per batch size.
      "spark.sql.codegen.wholeStage" -> (!codegenOff).toString,
      // Keep partition discovery of the (≤ fanIn-directory) state tables
      // on the driver: below this threshold no listing Spark job is
      // launched, and listing ≤256 directories driver-side is microseconds
      // on any filesystem worth running on.
      "spark.sql.sources.parallelPartitionDiscovery.threshold" -> "4096"
    ).map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try f finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def fs: FileSystem =
    FileSystem.get(URI.create(storePath), spark.sparkContext.hadoopConfiguration)

  /** Checksum-free filesystem for the tiny driver-local STATE files
    * (`_epoch`, `_mod`, `_seq`, `_current`, manifests, tombstone sets,
    * the local dirty WAL). Hadoop's local ChecksumFileSystem renames a
    * file and its `.crc` sidecar as two separate metadata ops, so a
    * reader could open a just-renamed state file against the stale
    * sidecar and die with ChecksumException — a spurious retriable error
    * under churn (and the one error class manifest reads would otherwise
    * still have). State files are single-block and atomically renamed;
    * checksums buy nothing there. Data files (parquet) keep checksums.
    * Shared per (scheme, authority) across Executer instances — the ops
    * layer creates many short-lived instances per process, and a
    * per-instance `FileSystem.newInstance` would leak a client (DFS
    * socket caches etc.) for each. */
  private lazy val stateFs: FileSystem = Executer.stateFsFor(
    URI.create(storePath), spark.sparkContext.hadoopConfiguration)

  private def exists(path: String): Boolean = fs.exists(new Path(path))

  /** Write a small driver-local state file atomically: write a sibling
    * `.tmp`, close, then rename over the destination with
    * `FileContext.rename(OVERWRITE)` — atomic on HDFS and on the local
    * FS. The destination is always either the previous complete file or
    * the new complete file, never a truncation: an in-place
    * `create(overwrite=true)` rewrite (the previous spelling) could be
    * interrupted mid-write, after which every read of the file throws
    * EOFException (store bricked) and deleting it by hand would silently
    * resurrect invalidated rows (tombstones) or lose the dirty set. */
  private def writeLocalAtomic(path: String)(
      write: java.io.DataOutputStream => Unit): Unit = {
    val tmp = fs.makeQualified(new Path(path + ".tmp"))
    val dest = fs.makeQualified(new Path(path))
    val out = new java.io.DataOutputStream(stateFs.create(tmp, true))
    try write(out) finally out.close()
    val scheme = dest.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // FileContext.rename(OVERWRITE) on the local FS is delete-then-
      // rename — a concurrent reader could observe the destination
      // MISSING between the two. POSIX rename(2) replaces atomically.
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dest.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // HDFS (and HDFS-like) implement overwrite renames atomically
      // server-side.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Document ids are case-insensitive (`Executer.cs:246-247,302`):
    * normalize once at the boundary — with `UTF8String.toUpperCase`,
    * the SAME uppercase the write path stores (SQL `upper()` and the
    * driver-local map both use it). JDK `String.toUpperCase` diverges
    * from it on non-ASCII under some default locales (tr-TR dotted i),
    * which would make [[deleteDocuments]]/[[contributionsOf]] silently
    * miss stored ids. */
  private def normId(id: String): String = Executer.normDocId(id)

  // ---------------------------------------------------------------------
  // Ingest / update — mirrors `Executer.Execute` (`Executer.cs:31-45`)
  // ---------------------------------------------------------------------

  /** One ingest-or-update batch: delete-and-invalidate prior contributions
    * of the incoming document ids (`Executer.cs:240-261`), persist new map
    * output, then incrementally re-reduce only the dirty subtrees.
    *
    * Job-count discipline (the incremental-latency contract): an update
    * must cost O(dirty) *plus a bounded number of Spark actions* — fixed
    * per-job scheduler/commit latency, not data volume, dominates a small
    * update, so the batch is organized as few, pushdown-pruned actions:
    * the incoming docs are persisted once and every downstream scan of
    * existing state uses driver-side `isin` pruning (partition values +
    * doc ids + reduce keys), which parquet row-group stats can skip. */
  def execute(docs: Dataset[D]): Unit = withLease {
    configChecked
    // A surviving WAL from a crashed batch must be replayed BEFORE new
    // work, or this batch's WAL write would silently discard it and the
    // crashed batch's dirty subtrees would never be repaired (the
    // reference replays pending Schedule markers on every Execute,
    // `Executer.cs:35`). No-op on a clean store.
    recoverLocked()
    val t0 = System.nanoTime()
    var jobs = 0
    val t = task // local val: closures must not capture `this`
    val batchSeq = bumpSeq()
    // A batch submitted as a small LOCAL dataset (createDataset — the
    // shape of every maintenance loop feeding driver-collected
    // micro-batches) needs no persist: its rows live on the driver, and
    // skipping the persist keeps `docs.collect()` a driver-side row
    // decode (LocalTableScanExec short-circuit, no Spark job) for the
    // ids probe below — persisting would cache-substitute the plan and
    // turn that collect into a job.
    val localSmall = docs.queryExecution.logical match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if lr.data.length <= DriverDirtyLimit => true
      case _ => false
    }
    val docsP = if (localSmall) docs else docs.persist()
    try {
      // For a local batch the user's map runs ON THE DRIVER, once — the
      // reference's single-node update model (`Executer.cs:31-45`)
      // applied where it is genuinely cheaper: the output becomes a
      // LocalRelation plan (no persist, no materialization job), the
      // batch's new dirty pairs are computable without any Spark job,
      // and the cluster never re-executes the map function for it.
      // `UTF8String.toUpperCase` matches the SQL `upper()` exactly
      // (JDK-locale upper would diverge on e.g. dotted-I).
      val localDocRows: Option[Seq[D]] =
        if (localSmall) Some(docs.collect().toSeq) else None
      // One version per document per batch — REJECTED LOUDLY otherwise.
      // Tombstones only invalidate seq < batchSeq, so two versions of a
      // doc in one batch would BOTH survive and silently double-count
      // its contributions forever (the reference's per-doc Execute
      // can't express this state; a batch is our extension, and its
      // contract is delete-and-invalidate per id). Callers coalescing
      // micro-batches dedupe last-wins first (as ChurnProps does).
      // Local batches check free on the driver; distributed update
      // batches detect in the existing ids-probe job below.
      def dupIdError(id: String): Nothing =
        throw new IllegalArgumentException(
          s"batch contains multiple documents with id '$id': submit one " +
            "version per document per batch (dedupe last-wins upstream)")
      // Map-output CONTRACT GUARD (VERDICT r12 #2): a task's map must emit
      // `(documentId(doc), entry)` pairs (`MapReduceTask.scala:9`; the
      // reference emits `person.Id`, `PeopleCountByState.cs:11-16`). The
      // engine persists map rows under the EMITTED id but invalidates by
      // `documentId(doc)` (deliberately — zero-emit docs must still
      // invalidate), so an id outside the batch silently corrupts the
      // store: new-doc updates lose prior contributions, existing-doc
      // updates double-count. Reject it LOUDLY instead. Local batches
      // check the exact batch id set on the driver (free); distributed
      // batches check inside the map pipeline itself — emitted id ∈ the
      // partition's consumed-so-far ids — which is job-free, throws in
      // the FIRST action that materializes the map output (before any
      // mutation lands on the update path), and is sound for any
      // physically-realizable task (an id can only be known by reading
      // its document). Both sides compare post-normalization (the same
      // UTF8String upper-casing the engine stores under).
      def contractError(id: String): Nothing =
        throw new IllegalArgumentException(
          s"map output emitted document id '$id' which is not the " +
            "documentId of any document in this batch: MapReduceTask.map " +
            "must emit (documentId(doc), entry) pairs — any other id " +
            "corrupts delete-and-invalidate (rows persist under the " +
            "emitted id, invalidation keys on documentId)")
      localDocRows.foreach { ds =>
        val ids = ds.map(d => org.apache.spark.unsafe.types.UTF8String
          .fromString(t.documentId(d)).toUpperCase.toString)
        val seen = scala.collection.mutable.HashSet.empty[String]
        ids.foreach(id => if (!seen.add(id)) dupIdError(id))
      }
      val localMapped: Option[Seq[(String, String, R)]] = localDocRows.map { ds =>
        val batchIds = ds.iterator.map(d => org.apache.spark.unsafe.types
          .UTF8String.fromString(t.documentId(d)).toUpperCase.toString).toSet
        t.map(ds.iterator).map { case (id, r) =>
          val norm = org.apache.spark.unsafe.types.UTF8String.fromString(id)
            .toUpperCase.toString
          if (!batchIds.contains(norm)) contractError(id)
          (norm, t.reduceKey(r), r)
        }.toSeq
      }
      val mappedBase: DataFrame = localMapped match {
        case Some(rows) =>
          spark.createDataset(rows)(encKR).toDF("doc_id", "reduce_key", "payload")
        case None => docsP
          .mapPartitions { it =>
            // Streaming guard: record each consumed doc's id, check each
            // emitted id against the recorded set at emit time. The set
            // holds 64-bit composite hashes in a primitive open table,
            // not strings — 8–16 bytes per document instead of ~100, so
            // a dense 128 MB scan partition costs a couple of MB. The
            // error is ONE-SIDED: a legal emit's own hash is always
            // present (same string, same hash), so conforming tasks are
            // never flagged; a violating id escapes only on a 64-bit
            // collision with some consumed id (~n·2⁻⁶⁴ per emit).
            def h64(s: String): Long = {
              val norm = org.apache.spark.unsafe.types.UTF8String
                .fromString(s).toUpperCase.toString
              (scala.util.hashing.MurmurHash3.stringHash(norm).toLong << 32) |
                (norm.hashCode.toLong & 0xffffffffL)
            }
            val seen = new org.apache.spark.util.collection.OpenHashSet[Long]()
            val recorded = it.map { d => seen.add(h64(t.documentId(d))); d }
            // Memoize the last verified id: tasks emit their rows in
            // per-document runs (a shingle index emits hundreds per doc),
            // so the steady-state guard cost is one string equals, not a
            // normalize+hash per emitted row.
            var lastOk: String = null
            t.map(recorded).map { case (id, r) =>
              if (id != lastOk) {
                if (!seen.contains(h64(id)))
                  throw new IllegalArgumentException(
                    s"map output emitted document id '$id' which is not " +
                      "the documentId of any document consumed in this " +
                      "partition: MapReduceTask.map must emit " +
                      "(documentId(doc), entry) pairs — any other id " +
                      "corrupts delete-and-invalidate")
                lastOk = id
              }
              (id, t.reduceKey(r), r)
            }
          }
          .toDF("doc_id", "reduce_key", "payload")
      }
      val mapped: DataFrame = mappedBase
        .withColumn("doc_id", upper($"doc_id")) // no-op for local rows: one spelling
        .withColumn(
          "bucket",
          StableBucketHash.stableBucket($"doc_id", config.buckets))
        .withColumn("parent", $"bucket" / lit(config.fanIn) cast "int")
        .withColumn("seq", lit(batchSeq))
        .select("parent", "bucket", "reduce_key", "doc_id", "seq", "payload")

      // Incoming ids come from documentId over the *documents*, not from
      // map output: a doc that now maps to zero entries must still
      // invalidate its previous contributions (`Executer.cs:89-91`).
      // ONE spelling of the id projection (normalization included) —
      // the dup probes below derive from it, so the ids the guards
      // check are by construction the ids the engine stores.
      val incomingIdsRaw = docsP
        .map(d => t.documentId(d)).toDF("doc_id")
        .select(upper($"doc_id") as "doc_id")
      val incomingIds = incomingIdsRaw.distinct()

      val firstBuild =
        if (pending != null)
          pending.live.getOrElse("map_results", Vector.empty).isEmpty
        else !exists(mapResultsPath)
      if (firstBuild) {
        // The duplicate-id contract holds on the initial build too
        // (ADVICE r6): local batches were checked driver-side above, but
        // a DISTRIBUTED first build used to skip the ids-probe entirely —
        // two versions of one doc would both land under the same seq and
        // double-count forever (tombstones only invalidate seq <
        // batchSeq, so delete-and-invalidate never repairs intra-batch
        // dups). One narrow aggregation job over the ids is O(data) like
        // the build itself and catches the state the guard documents as
        // rejected loudly.
        // The probe doubles as a batch-size measurement: the same single
        // job returns (distinct ids, total docs, max versions per id),
        // so dup detection AND the small-build decision below cost one
        // aggregation. The failure path re-queries to NAME the dup id —
        // an error path may be expensive.
        val batchDocs: Long =
          if (localSmall) localDocRows.get.length.toLong
          else {
            jobs += 1
            val r = incomingIdsRaw
              .groupBy($"doc_id").agg(count(lit(1)) as "n")
              .agg(count(lit(1)), sum($"n"), max($"n")).collect()(0)
            // sum/max are NULL over an empty batch (zero groups).
            if (!r.isNullAt(2) && r.getLong(2) > 1L) {
              val dup = incomingIdsRaw
                .groupBy($"doc_id").agg(count(lit(1)) as "n")
                .where($"n" > 1L).limit(1).collect()
              dupIdError(dup(0).getString(0))
            }
            if (r.isNullAt(1)) 0L else r.getLong(1)
          }
        // Initial build fast path: everything is dirty, so skip the dirty
        // set entirely — no WAL round-trip, no semi-join pruning, no
        // staging renames (the partials/finals tables don't exist yet).
        // Crash safety: a one-row sentinel in the driver-local WAL marks
        // "full rebuild pending" (a single create+close, not a Spark
        // write job), written BEFORE the map write like every other WAL
        // (a crash at any point replays rereduceAll over whatever map
        // state committed — empty or complete, both consistent).
        // SMALL builds run their two write jobs at a narrow shuffle
        // width with AQE off (same rationale as the update path's
        // withTinyShuffle: at a few thousand docs the session-width
        // shuffle and AQE re-planning are pure scheduler latency).
        // Doc count alone does not bound what the jobs SHUFFLE — map
        // output amplifies per doc (a shingle index emits hundreds of
        // rows each) — so the narrow width also requires the DECLARED
        // small store shape (fanIn ≤ 32, the author's statement that
        // total state is small); wide stores keep session width + AQE
        // regardless of batch size (code-review r7).
        val smallBuild = config.fanIn <= 32 && batchDocs <= 100000
        def buildWrites(): Unit = {
          writeDirtyLogLocal(Seq(("", FullRebuild)))
          buildFromMapOutput(mapped); jobs += 2
          clearDirtyLog()
        }
        if (smallBuild) withTinyShuffle(8, codegenOff = false)(buildWrites())
        else buildWrites()
        _lastStats = Some(MaintenanceStats("build", jobs, -1, -1, -1,
          (System.nanoTime() - t0) / 1000000))
      } else {
        // ---- probe 1: the incoming ids (bounded collect) --------------
        // Local batches decode their ids on the driver (no job);
        // `UTF8String.toUpperCase` matches the SQL `upper()` the
        // distributed probe applies (JDK-locale upper would diverge on
        // e.g. dotted-I). Distributed batches keep the bounded collect.
        val idsProbe: Array[String] =
          if (localSmall)
            localDocRows.get.iterator
              .map(d => org.apache.spark.unsafe.types.UTF8String
                .fromString(t.documentId(d)).toUpperCase.toString)
              .toArray.distinct
          else {
            jobs += 1
            // Same single job as the old distinct-collect, but grouped
            // WITH counts so intra-batch duplicate ids are detected for
            // free (see dupIdError above; past the driver limit the
            // check covers only the collected prefix — documented
            // best-effort on huge batches).
            val counts = incomingIdsRaw
              .groupBy($"doc_id").agg(count(lit(1)) as "n")
              .limit(DriverDirtyLimit + 1).collect()
            counts.find(_.getLong(1) > 1L)
              .foreach(r => dupIdError(r.getString(0)))
            counts.map(_.getString(0))
          }
        val idsSmall = idsProbe.length <= DriverDirtyLimit

        // A document's bucket (hence `parent` partition) is a pure
        // function of its id — so every prior contribution of the
        // incoming ids lives in the parents of the incoming ids
        // (≤ fanIn values). Small batches compute them driver-side from
        // the probed ids (zero extra jobs); large batches pay one
        // bounded distinct/collect. This replaces the reference's
        // per-doc directory lookup (`Executer.cs:245-250`).
        val incomingParents: Seq[Int] =
          if (idsSmall)
            idsProbe.map(id =>
              StableBucketHash.hash(id, config.buckets) / config.fanIn)
              .distinct.sorted.toSeq
          else {
            jobs += 1
            incomingIds
              .select((StableBucketHash.stableBucket($"doc_id", config.buckets)
                / lit(config.fanIn)).cast("int") as "parent")
              .distinct().as[Int].collect().sorted.toSeq
          }
        val existing = readMapResults()
          .where($"parent".isin(incomingParents.map(Integer.valueOf): _*))

        // ---- probe 2: the dirty (key, parent) set ---------------------
        // Prior contributions of incoming ids — across ALL reduce keys
        // the doc previously mapped to (`Executer.cs:253-258`) — plus the
        // pairs of the new map output. Small batches find stale rows with
        // pushed-down id filters (no join, no shuffle); this action also
        // materializes `mapped` into the block cache so the map function
        // runs exactly once per batch. The provenance flag (pair seen on
        // a stale row vs only on new map output) picks the append fast
        // path below.
        val mappedP = if (localSmall) mapped else mapped.persist()
        def maintain(): Unit = {
          val stale =
            if (idsSmall) existing.where($"doc_id".isin(idsProbe.toIndexedSeq: _*))
            else existing.join(incomingIds, Seq("doc_id"), "left_semi")
          val dirtyDF = stale
            .select($"reduce_key", $"parent", lit(true) as "is_stale")
            .union(mappedP.select($"reduce_key", $"parent", lit(false) as "is_stale"))
            .distinct()
          // A "tiny" batch (couple dozen docs) also runs interpreted and
          // single-partition; larger driver-pruned batches keep codegen
          // and a narrow fixed width.
          val tinyBatch = idsSmall && idsProbe.length <= 64
          // Width policy for the small-PAIRS branch: narrow fixed-width
          // non-adaptive shuffles are right only when the BATCH is
          // driver-small too. A batch large in documents (idsSmall
          // false) can collapse to a small dirty pair set (few reduce
          // keys) while its level-0 re-reduce still reads a
          // corpus-scale slice — running THAT at 8-wide with AQE off
          // under-parallelized the session 4× and forced sort-merge
          // where AQE would broadcast the id set (measured: the 10k-doc
          // lineitem update at 17.5s, most of it this; session width
          // takes it to ~1/3). Such batches keep session width + AQE.
          def smallBatchWidth[A](f: => A): A =
            if (idsSmall)
              withTinyShuffle(if (tinyBatch) 1 else 8, codegenOff = tinyBatch)(f)
            else f
          // The map-output append and the reduce-tree rewrite are
          // independent by construction: the tree job's level-0 input
          // is the PRE-append file snapshot (`existing`) plus the
          // block-cached new map output, never the appended files. So
          // the append runs as a concurrent action and the update's
          // wall clock pays max(append, tree-rewrite) instead of their
          // sum. Crash ordering is unchanged — WAL first, tombstones
          // before either write, and a failure of either leaves the
          // WAL in place for recovery to replay (recovery re-reduces
          // from whatever map state committed: rows present → batch
          // applied; rows absent → the documented "docs deleted"
          // state, re-submitting the batch completes it).
          def startAppend(): () => Unit = {
            val session = spark
            val manifest = pending != null
            val fut = java.util.concurrent.CompletableFuture.supplyAsync { () =>
              // SQLConf.get in the job thread resolves via the active-
              // session thread-local; a fresh pool thread has none.
              org.apache.spark.sql.SparkSession.setActiveSession(session)
              val w = mappedP.repartition($"parent")
                .sortWithinPartitions($"parent", $"reduce_key")
                .write.partitionBy("parent")
              // Manifest stores append via staging too: the merge's
              // file renames are what tells the model EXACTLY which
              // files this batch added — no listing diff that could
              // adopt a crashed batch's orphans. The rename fan-out is
              // pure filesystem work and merged files stay invisible
              // until the model names them at publish, so it runs here,
              // overlapping the tree rewrite, instead of serializing at
              // join; only the model mutation stays on the writer
              // thread. A crash between the renames and the publish
              // leaves orphans compact() sweeps — the same contract as
              // a crash before the renames.
              if (manifest) {
                w.mode("overwrite").parquet(s"$mapResultsPath.staging")
                mergeStagedDir(mapResultsPath)
              } else {
                w.mode("append").parquet(mapResultsPath)
                Vector.empty[String]
              }
            }
            () => {
              val rels = fut.join()
              if (manifest) modelAddFiles(rels)
            }
          }
          // The probe: (distinct dirty pairs, any stale row seen, probe
          // overflowed past the driver limit). Local batches know their
          // NEW pairs already (the map ran driver-side), so the probe job
          // scans only the STALE side — filter + distinct on the incoming
          // parents, no union with map output, no cache materialization.
          // Distributed batches keep the combined probe, which also
          // materializes `mappedP` into the block cache so the map
          // function runs exactly once per batch.
          val (pairs, anyStale, probeOverflow) =
            if (localSmall) {
              val newPairs = localMapped.get.map { case (id, key, _) =>
                (key, StableBucketHash.hash(id, config.buckets) / config.fanIn)
              }.distinct
              val staleRows = withTinyShuffle(if (tinyBatch) 1 else 8,
                  codegenOff = tinyBatch)(
                stale.select($"reduce_key", $"parent").distinct()
                  .limit(DriverDirtyLimit + 1).collect())
              jobs += 1
              val all = (staleRows.iterator.map(r => (r.getString(0), r.getInt(1)))
                ++ newPairs.iterator).toSeq.distinct
              (all, staleRows.nonEmpty,
                staleRows.length > DriverDirtyLimit || all.length > DriverDirtyLimit)
            } else {
              val pairsProbe =
                if (idsSmall)
                  withTinyShuffle(if (tinyBatch) 1 else 8, codegenOff = tinyBatch)(
                    dirtyDF.limit(DriverDirtyLimit + 1).collect())
                else dirtyDF.limit(DriverDirtyLimit + 1).collect()
              jobs += 1
              val overflowed = pairsProbe.length > DriverDirtyLimit
              val sampledStale = pairsProbe.exists(_.getBoolean(2))
              // An OVERFLOWED probe is a truncated sample: a large batch
              // of mostly-new docs plus a few resubmitted ones can fill
              // the whole sample with is_stale=false rows while stale
              // rows exist past the cutoff. Staleness gates tombstoning
              // and old-row negation in the delta path below — trusting
              // the sample there silently skips retraction (ADVICE r8,
              // high). One bounded existence probe (limit-1 over the
              // semi-joined stale side) makes it exact; non-overflowed
              // probes saw the complete set and stay job-free. The
              // localSmall branch is already exact: its stale scan's
              // limit can only truncate NON-empty results.
              val staleExact = sampledStale ||
                (overflowed && { jobs += 1; !stale.isEmpty })
              (pairsProbe.map(r => (r.getString(0), r.getInt(1))).distinct.toSeq,
                staleExact, overflowed)
            }

          // Rebuild-fallback decision (full rationale at its branch
          // below): dirty pair count vs live level-1 pairs, manifest
          // stores only, never for driver-small batches. Computed FIRST
          // because it gates both the delta and the recompute paths.
          val dirtyLower: Long =
            if (probeOverflow) DriverDirtyLimit.toLong + 1L else pairs.size.toLong
          val rebuildChosen = anyStale && pending != null && !idsSmall &&
            dirtyLower >= RebuildCheckFloor && {
              jobs += 1
              val totalPairs = readPartials().count()
              val threshold = config.rebuildDirtyFraction * totalPairs
              if (totalPairs == 0L) false
              else if (dirtyLower >= threshold) true
              else if (!probeOverflow) false
              else {
                // Overflowed probe whose lower bound did not decide:
                // one exact count (bounded by the stale scan the
                // distributed path would run anyway).
                jobs += 1
                dirtyDF.select("reduce_key", "parent").distinct().count() >=
                  threshold
              }
            }

          // ---- delta maintenance (abelian-group tasks) ----------------
          // The task declared a group inverse (MapReduceTask.negate):
          // the tree is maintained by merging reduce(old⁻ ++ new) into
          // the stored partials/finals — the engine reads the incoming
          // docs' OLD map rows and the touched partials, never the
          // other documents sharing the touched keys. Sibling
          // recomputation pays O(size of touched groups) (a hot
          // shingle's group is the whole corpus); the delta pays
          // O(batch + touched partials). The WAL is written FIRST and
          // recovery replays it through the RECOMPUTE path (rereduce /
          // rereducePruned) — the group laws make the two equivalent,
          // so deltas are a steady-state optimization, never the
          // durability story (DeltaUpdateSpec pins equivalence, zero
          // disappearance, and the crash window).
          // The REBUILD fallback below preempts the delta when its
          // trigger fires: with few reduce keys the delta's savings
          // (not re-reducing untouched contributors) cannot offset the
          // probe + tombstone + append machinery, while the rebuild
          // skips all three and leaves a debt-free store (measured,
          // 456k-doc lineitem store, 10k-doc bulk update: rebuild 7.4s,
          // delta 8.8s, sibling recompute 9.1s). Hot-keyed stores with
          // driver-small batches — the delta's home turf — never meet
          // the rebuild trigger (it requires !idsSmall).
          if (t.deltaReducible && t.singleOutput && !rebuildChosen) {
            def deltaBody(): Unit = {
              if (!probeOverflow) writeDirtyLogLocal(pairs)
              else { writeDirtyLog(dirtyDF); jobs += 1 }
              if (anyStale) {
                // Merge-on-read invalidation, same two spellings as the
                // recompute paths (tombstone BEFORE append — the crash
                // between them recovers to "docs deleted").
                if (idsSmall) addTombstonesLocal(idsProbe.toIndexedSeq, batchSeq)
                else {
                  val tdf = incomingIds.withColumn("tomb_seq", lit(batchSeq))
                  if (pending != null)
                    modelAddFiles(stagedWriteIn(tdf, tombDistPath, Nil, clustered = false))
                  else {
                    tdf.write.mode("append").parquet(tombDistPath)
                    bumpStoreVersion()
                  }
                  jobs += 1
                }
              }
              val appendJoin = startAppend(); jobs += 1
              // The incoming docs' live pre-batch rows — `existing`'s
              // plan predates this batch's tombstones and append, so no
              // read-back races the concurrent writes.
              val oldRows =
                if (!anyStale) existing.limit(0)
                else if (idsSmall)
                  existing.where($"doc_id".isin(idsProbe.toIndexedSeq: _*))
                else existing.join(incomingIds, Seq("doc_id"), "left_semi")
              try rereduceDelta(oldRows, mappedP,
                if (probeOverflow) None else Some(pairs))
              finally appendJoin()
              jobs += 2
              bumpStoreVersion()
              _lastStats = Some(MaintenanceStats("delta",
                jobs, if (idsSmall) idsProbe.length else -1,
                if (probeOverflow) -1 else pairs.size, -1,
                (System.nanoTime() - t0) / 1000000))
            }
            if (!probeOverflow) smallBatchWidth(deltaBody())
            else distributedWidth(idsSmall)(deltaBody())
            clearDirtyLog()
            return
          }

          // ---- cost-based rebuild fallback (VERDICT r7 #2) ------------
          // When the dirty pair set approaches the whole reduce tree —
          // a bulk re-submit, a corpus-wide reprocess — incremental
          // maintenance costs MORE than a from-scratch rebuild: it pays
          // the tombstone append, a near-total sibling re-reduce, and
          // leaves a merge-on-read overlay behind, where the rebuild is
          // one clean write per table (measured: 10k-doc update 17.5s vs
          // 6.2s full build on a 456k-doc corpus, BENCH_r07). Decision
          // inputs: the dirty pair count (exact when the probe fit the
          // driver, else lower-bounded by the overflow itself) vs the
          // live level-1 pair count (one metadata-only count job, gated
          // behind RebuildCheckFloor so steady-state small updates never
          // pay it). MANIFEST STORES ONLY: writePartitioned stages the
          // replacement table and retires the old files in the pending
          // generation, so a crash anywhere leaves the published
          // generation intact — the same atomic-batch contract as any
          // update. A legacy store's in-place overwrite would open a
          // destructive window on map_results (source state, not
          // reconstructible from the WAL), so legacy stores keep the
          // incremental path unconditionally.
          // Calibration (measured on the 456k-doc lineitem store, 32
          // threads): a 10k-doc bulk update dirtying every pair costs
          // 9.1s incrementally (tombstone + append + near-total
          // re-reduce, leaving 10k live tombstones) vs 8.2s as a
          // rebuild (leaving a compact tombstone-free store) — past the
          // threshold the rebuild is both faster and debt-free. A
          // DRIVER-SMALL batch (idsSmall) never takes the fallback:
          // its invalidation is O(batch) pushdown predicates and its
          // append is tiny, so rewriting the whole map table cannot pay
          // for itself even when the pair set is 100% dirty (measured:
          // q41's 1546-doc orders update, 5.6s fallback vs ~2s
          // incremental).
          if (rebuildChosen) {
            // The first-build sequence, applied to (survivors + batch):
            // FullRebuild WAL sentinel, then one clustered pass whose
            // cached output feeds the whole-table map write and the
            // whole-tree reduce concurrently (buildFromMapOutput). A
            // crash replays rereduceAll over whatever generation is
            // PUBLISHED (the old one until clearDirtyLog's publish) —
            // idempotent, batch invisible, re-submitting completes it
            // (RebuildFallbackSpec pins the kill-mid-fallback window).
            stageRebuildOldKeys()
            writeDirtyLogLocal(Seq(("", FullRebuild)))
            // The trigger requires !idsSmall, so the batch's ids are an
            // anti-join, never a driver isin (code-review r8: a dead
            // driver-small arm here implied support the decision logic
            // forbids).
            val survivors = readMapResults()
              .join(incomingIds, Seq("doc_id"), "left_anti")
            // The rewrite physically excludes every tombstoned row and
            // every prior row of the incoming ids (`survivors`' plan was
            // resolved against the pre-batch snapshot, tombstone overlay
            // included): clear (retire) the tombstone state up front,
            // exactly as a fold would — readers holding pre-rebuild
            // snapshots keep resolving the old tombstone files until GC.
            modelRetireTable("tombstones")
            modelSetTombLocal(None)
            buildFromMapOutput(survivors.unionByName(mappedP)); jobs += 2
            _lastStats = Some(MaintenanceStats("rebuild-fallback",
              jobs, -1, dirtyLower.toInt, -1,
              (System.nanoTime() - t0) / 1000000))
          } else if (!probeOverflow)
            smallBatchWidth {
            // Small dirty set — the common incremental case. Everything
            // downstream is derived from the probe: the WAL is written
            // from driver rows (a no-scan local-relation write), and all
            // state scans use pushed-down isin filters.
            val dirtyParents = pairs.map(_._2).distinct.sorted
            // The dirty set is on the driver — write the WAL directly to
            // the store filesystem (no Spark job, no commit protocol).
            writeDirtyLogLocal(pairs)

            // The post-update map rows of the dirty parents, as an
            // in-memory plan over the PRE-update file snapshot plus the
            // cached new map output — rereducePruned reduces from this
            // instead of re-reading (and re-listing) the just-rewritten
            // table.
            var appendJoin: () => Unit = () => ()
            var level0Source: DataFrame = null
            if (!anyStale) {
              // Pure insert: nothing to invalidate — the new rows become
              // additional files in their partition directories. No
              // read-rewrite of existing state at all.
              appendJoin = startAppend(); jobs += 1
              level0Source = existing
                .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
                .unionByName(mappedP)
            } else {
              // Merge-on-read invalidation (the reference's per-doc file
              // delete, `Executer.cs:253-258`, at O(batch) write cost):
              // tombstone the incoming ids — their pre-batch rows die at
              // read time — and APPEND the new map output, instead of
              // rewriting every dirty parent partition in full. Tombstone
              // BEFORE append: a crash between the two recovers to a
              // consistent "docs deleted" state (re-running the batch
              // completes the update); append-first could leave doubled
              // rows that recovery alone cannot see.
              if (idsSmall) addTombstonesLocal(idsProbe.toIndexedSeq, batchSeq)
              else {
                // Incoming ids exceed the driver limit even though the
                // dirty pair set collapsed (many docs, few keys): write
                // the tombstones distributed instead — still O(batch).
                val tdf = incomingIds.withColumn("tomb_seq", lit(batchSeq))
                if (pending != null)
                  modelAddFiles(stagedWriteIn(tdf, tombDistPath, Nil, clustered = false))
                else {
                  tdf.write.mode("append").parquet(tombDistPath)
                  bumpStoreVersion()
                }
                jobs += 1
              }
              appendJoin = startAppend(); jobs += 1
              // The appended files are invisible to `existing` (its file
              // snapshot predates the append) and the new tombstones are
              // not in its plan — so the post-update view is exactly the
              // old snapshot minus incoming docs, plus the cached map
              // output. No read-back of the just-written files at all.
              val retained = existing
                .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
              val retainedMinusIncoming =
                if (idsSmall)
                  retained.where(!$"doc_id".isin(idsProbe.toIndexedSeq: _*))
                else retained.join(incomingIds, Seq("doc_id"), "left_anti")
              level0Source = retainedMinusIncoming.unionByName(mappedP)
            }
            // Join the append before leaving the tiny-shuffle scope even
            // when the tree rewrite throws: its plan must not outlive
            // the restored session conf or race a later batch's swap.
            try rereducePruned(pairs, level0Source,
              clustered = tinyBatch)
            finally appendJoin()
            jobs += 1
            bumpStoreVersion()
            _lastStats = Some(MaintenanceStats(
              if (anyStale) "incremental-pruned" else "append",
              jobs, if (idsSmall) idsProbe.length else -1,
              pairs.size, dirtyParents.size,
              (System.nanoTime() - t0) / 1000000))
          } else distributedWidth(idsSmall) {
            // Large dirty set: distributed path (joins against the WAL).
            writeDirtyLog(dirtyDF); jobs += 1
            val dirty = readDirtyLog().select("reduce_key", "parent").distinct()
            // Merge-on-read invalidation, distributed spelling: tombstone
            // the incoming ids as a parquet append (O(batch)), append the
            // new map output, and let rereduce read the post-update view
            // through readMapResults (new files + new tombstones — on a
            // manifest store, via the pending generation).
            val tdf = incomingIds.withColumn("tomb_seq", lit(batchSeq))
            val mapAppend = mappedP.repartition($"parent")
              .sortWithinPartitions($"parent", $"reduce_key")
              .write.partitionBy("parent")
            if (pending != null) {
              modelAddFiles(stagedWriteIn(tdf, tombDistPath, Nil, clustered = false)); jobs += 1
              mapAppend.mode("overwrite").parquet(s"$mapResultsPath.staging"); jobs += 1
              modelAddFiles(mergeStagedDir(mapResultsPath))
            } else {
              tdf.write.mode("append").parquet(tombDistPath); jobs += 1
              mapAppend.mode("append").parquet(mapResultsPath); jobs += 1
              bumpStoreVersion()
            }
            // One collect (≤ fanIn values) shared with rereduce — the
            // stats figure must not pay a second identical Spark job.
            val dirtyParents = dirty.select("parent").distinct()
              .as[Int].collect().sorted; jobs += 1
            rereduce(dirty, Some(dirtyParents)); jobs += 2
            _lastStats = Some(MaintenanceStats("incremental-distributed",
              jobs, -1, -1, dirtyParents.length,
              (System.nanoTime() - t0) / 1000000))
          }
          clearDirtyLog()
        }
        // Shuffle-width policy lives inside maintain(): the pairs probe
        // and the small-pairs branch run at tiny-shuffle settings
        // (1 partition for tiny batches, a fixed narrow width for larger
        // batches whose dirty pair set still collapsed); the distributed
        // branch keeps the session's AQE planning on WIDE stores and
        // narrows on small-shaped ones (see distributedWidth).
        try maintain() finally mappedP.unpersist()
        // Bound the merge-on-read overhead: past `tombstoneLimit` live
        // tombstones, fold them into the data files now (amortized — the
        // fold is itself O(tombstoned partitions), and resets the clock).
        if (tombstoneEstimate() > config.tombstoneLimit) foldTombstonesLocked()
      }
    } finally if (!localSmall) docsP.unpersist()
    _lastStats.foreach(s => log.info(s"execute: $s"))
  }

  /** Delta spelling of the two-level re-reduce, for tasks declaring the
    * abelian-group structure ([[MapReduceTask.deltaReducible]]): merge
    * `reduce(negate(oldRows) ++ newRows)` into the stored partials and
    * finals instead of recomputing each touched group from all its
    * surviving level-0 rows. Inputs are O(batch); state reads are the
    * touched partials/finals only. Rows that reach the group identity
    * ([[MapReduceTask.isZero]]) are dropped at both levels — matching
    * the recompute semantics where an empty group disappears.
    *
    * Key membership is pruned with driver `isin` predicates when the
    * dirty pairs fit the driver (`driverPairs`), else with semi/anti
    * joins against the delta itself. Untouched keys inside a dirty
    * parent pass through `reduce` as singletons, which re-reducibility
    * guarantees is the identity — so no exact pair-level anti-join is
    * ever needed. Both levels land in the same single staged tree write
    * as the recompute paths. */
  private def rereduceDelta(oldRows: DataFrame, newRows: DataFrame,
      driverPairs: Option[Seq[(String, Int)]]): Unit = {
    val t = task
    implicit val encIn: Encoder[(String, Int, R)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, encR)
    implicit val encKV: Encoder[(String, R)] =
      Encoders.tuple(Encoders.STRING, encR)
    val negOld = oldRows.select($"reduce_key", $"parent", $"payload")
      .as[(String, Int, R)]
      .map { case (k, p, r) => (k, p, t.negate(r)) }
      .toDF("reduce_key", "parent", "payload")
    val delta0 = negOld.unionByName(
      newRows.select($"reduce_key", $"parent", $"payload"))
    // The per-(key, parent) delta — reused by the partials merge AND the
    // finals merge below, which land in ONE write job; persisted so the
    // two branches of that job's union share the shuffle. Inputs are
    // O(batch), so the clustered streaming spelling applies (same
    // shuffle the groupByKey would pay, minus the AppendColumns churn
    // and the object-hash sort fallback past 128 keys per partition —
    // a wide-fan-out batch like a shingle index's always exceeds it).
    val deltaPartials = reduceByKeyParentSmall(delta0)
      .select("parent", "reduce_key", "payload").persist()
    try {
      // Dirty partition sets: free from the driver pairs, else one
      // bounded collect (≤ fanIn × finalParts distinct combinations).
      val (dirtyParents, dirtyFparts) = driverPairs match {
        case Some(ps) =>
          (ps.map(_._2).distinct.sorted,
            ps.map(p => fpartOf(p._1)).distinct.sorted)
        case None =>
          val rows = deltaPartials.select($"parent",
            pmod(hash($"reduce_key"), lit(config.finalParts)) as "fpart")
            .distinct().collect()
          (rows.map(_.getInt(0)).distinct.sorted.toSeq,
            rows.map(_.getInt(1)).distinct.sorted.toSeq)
      }
      if (dirtyParents.isEmpty) return
      lazy val dirtyKeysDF = deltaPartials.select("reduce_key").distinct()
      val driverKeys = driverPairs.map(_.map(_._1).distinct)
      def matchKeys(df: DataFrame): DataFrame = driverKeys match {
        case Some(ks) => df.where($"reduce_key".isin(ks: _*))
        case None => df.join(dirtyKeysDF, Seq("reduce_key"), "left_semi")
      }
      def excludeKeys(df: DataFrame): DataFrame = driverKeys match {
        case Some(ks) => df.where(!$"reduce_key".isin(ks: _*))
        case None => df.join(dirtyKeysDF, Seq("reduce_key"), "left_anti")
      }

      val oldPartials = readPartials()
        .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      val mergedPartials = reduceByKeyParentSmall(
          matchKeys(oldPartials).unionByName(deltaPartials))
        .select($"reduce_key", $"parent", $"payload").as[(String, Int, R)]
        .filter(x => !t.isZero(x._3))
        .toDF("reduce_key", "parent", "payload")
        .select("parent", "reduce_key", "payload")
      val partialsOut = excludeKeys(oldPartials).unionByName(mergedPartials)

      val deltaByKey = reduceByKey(deltaPartials)
      val oldFinals = readFinals()
        .where($"fpart".isin(dirtyFparts.map(Integer.valueOf): _*))
      val mergedFinals = reduceByKey(
          matchKeys(oldFinals).select("reduce_key", "payload")
            .unionByName(deltaByKey.select("reduce_key", "payload")))
        .as[(String, R)]
        .filter(x => !t.isZero(x._2))
        .toDF("reduce_key", "payload")
        .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
        .select("fpart", "reduce_key", "payload")
      val finalsOut = excludeKeys(oldFinals).unionByName(mergedFinals)

      stageAndOverwriteTree(
        tagLevel1(partialsOut).unionByName(tagLevel2(finalsOut)),
        dirtyParents.map(p => s"level=1/part=$p") ++
          dirtyFparts.map(fp => s"level=2/part=$fp"),
        clustered = false)
    } finally deltaPartials.unpersist()
  }

  /** Driver-pruned incremental re-reduce for small dirty sets: the exact
    * (key, parent) pairs are known on the driver, so scans filter with
    * pushed-down predicates instead of joins. Semantics identical to
    * [[rereduce]] (sibling inclusion per parent, empty groups disappear,
    * finals rebuilt per dirty key). */
  /** @param level0Source the post-update map rows of the dirty parents
    *   (either an in-memory plan over still-live file snapshots + cached
    *   map output, or a pruned re-read of the rewritten table). */
  private def rereducePruned(
      pairs: Seq[(String, Int)], level0Source: DataFrame,
      clustered: Boolean = true): Unit = {
    if (pairs.isEmpty) return
    val dirtyParents = pairs.map(_._2).distinct.sorted
    val dirtyKeys = pairs.map(_._1).distinct.sorted
    // Superset pruning: rebuild (key ∈ dirtyKeys) × (parent ∈
    // dirtyParents) ⊇ the exact dirty pairs. Rebuilding a clean group is
    // idempotent (level-1 partials are always rebuilt from scratch from
    // all their children), and two isin filters push down to parquet
    // row-group stats — where the exact pair set would need a deep
    // Or-tree that neither pushes down nor survives Catalyst's analyzer
    // recursion (observed StackOverflowError at ~600 pairs).
    val keyPred = $"reduce_key".isin(dirtyKeys: _*)

    val level0 = level0Source.where(keyPred)
    val newPartials = reduceByKeyParentSmall(level0)
      .select("parent", "reduce_key", "payload")
    val partialsOut = readPartials()
      .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .where(!keyPred)
      .unionByName(newPartials)
    // Finals for the dirty keys take their level-1 inputs from the
    // non-dirty parents ON DISK plus the just-computed in-memory
    // partials (no write/read-back barrier between the two reduce
    // levels): both levels land in ONE staged write below.
    val level1ForKeys = readPartials()
      .where(!$"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .where(keyPred)
      .unionByName(newPartials)
    val newFinals = reduceByKey(level1ForKeys)
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .select("fpart", "reduce_key", "payload")
    val dirtyFparts = dirtyKeys.map(fpartOf).distinct.sorted
    val finalsOut = readFinals()
      .where($"fpart".isin(dirtyFparts.map(Integer.valueOf): _*))
      .where(!keyPred)
      .unionByName(newFinals)
    stageAndOverwriteTree(
      tagLevel1(partialsOut).unionByName(tagLevel2(finalsOut)),
      dirtyParents.map(p => s"level=1/part=$p") ++
        dirtyFparts.map(fp => s"level=2/part=$fp"),
      clustered)
  }

  /** Incrementally rebuild level-1 partials for the dirty (key, parent)
    * pairs, then finals for the dirty keys — the reference's two-pass
    * reduce driver (`Executer.cs:37-43,47-85`) as two partition-pruned
    * groupBy passes. Dirty level-1 parents are rebuilt from scratch from
    * all their children (sibling inclusion, `Executer.cs:323-333`), never
    * diffed. */
  /** Full (re)build of both reduce levels from the whole map_results
    * table — the initial-build path, and crash recovery for it. Both
    * levels land in ONE overwrite job (same shape as the incremental
    * path's single staged write): partials are persisted in memory —
    * they are the already-reduced data, ≤ keys × fanIn rows — so the
    * level-2 branch of the union reuses them instead of a write +
    * read-back barrier, and the tree is never visible with only one
    * level present. */
  private def rereduceAll(clusteredMapOut: Option[DataFrame] = None): Unit = {
    val newPartials = (clusteredMapOut match {
      case Some(arranged) => partialsFromClustered(arranged)
      case None => reduceByKeyParent(readMapResults())
    }).select("parent", "reduce_key", "payload").persist()
    try {
      clusteredMapOut match {
        case Some(_) =>
          // The partials inherit the map pass's parent clustering, so
          // the level-1 leg of the tree write needs no shuffle; the
          // finals' one shuffle is keyed by `fpart` — the exact layout
          // the write wants — so the union lands with clustered=true:
          // the whole tree write shares the finals' single exchange
          // instead of re-shuffling both levels by (level, part).
          val newFinals = finalsFromFpartClustered(newPartials)
          writePartitioned(
            tagLevel1(newPartials).unionByName(tagLevel2(newFinals)),
            treePath, Seq("level", "part"), clustered = true)
        case None =>
          val newFinals = reduceByKey(newPartials)
            .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
            .select("fpart", "reduce_key", "payload")
          writePartitioned(
            tagLevel1(newPartials).unionByName(tagLevel2(newFinals)),
            treePath, Seq("level", "part"))
      }
    } finally newPartials.unpersist()
  }

  /** Finals from level-1 partials via ONE shuffle keyed by `fpart` (the
    * final table's own partition column), sorted by (fpart, reduce_key)
    * so each key's partials form a contiguous run — reduced by the same
    * streaming pass as [[partialsFromClustered]], and already laid out
    * for the tree write. A key never spans fparts (fpart is a function
    * of the key), so runs are exact groups. */
  private def finalsFromFpartClustered(partials: DataFrame): DataFrame = {
    val t = task // local val: the closure must not capture `this`
    implicit val encIn: Encoder[(Int, String, R)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.STRING, encR)
    partials
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .repartition($"fpart")
      .sortWithinPartitions($"fpart", $"reduce_key")
      .select($"fpart", $"reduce_key", $"payload")
      .as[(Int, String, R)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Int, String, R)] {
          private var outs: Iterator[R] = Iterator.empty
          private var curF: Int = _
          private var curKey: String = _
          private def advance(): Unit =
            while (!outs.hasNext && buf.hasNext) {
              val f = buf.head._1
              val key = buf.head._2
              val run = new Iterator[R] {
                def hasNext: Boolean = buf.hasNext && buf.head._2 == key
                def next(): R = buf.next()._3
              }
              val reduced = t.reduce(run).toVector
              while (run.hasNext) run.next()
              curF = f; curKey = key
              outs = reduced.iterator
            }
          def hasNext: Boolean = { advance(); outs.hasNext }
          def next(): (Int, String, R) = {
            advance(); val r = outs.next(); (curF, curKey, r)
          }
        }
      }
      .toDF("fpart", "reduce_key", "payload")
  }

  /** Whole-table map write + whole-tree re-reduce from ONE clustered,
    * cached pass over the batch's map output (initial builds and the
    * rebuild fallback). The legacy spelling wrote `map_results`, then
    * re-read and re-listed the just-written table to build the tree — a
    * full extra scan plus a fresh file index — and ran the two table
    * writes sequentially. Here one shuffle clusters the map output by
    * `parent` (sorted by reduce_key inside each parent, the layout both
    * consumers need), the pass is cached, and the map-results write —
    * needing no further shuffle — runs CONCURRENTLY with the tree
    * computation, so the build's wall clock pays max(map write, tree)
    * instead of write + re-read + tree. Crash contract unchanged: the
    * caller's FullRebuild WAL sentinel precedes both writes, each write
    * commits atomically on its own, and recovery replays rereduceAll
    * over whatever map state committed. Model mutations stay on the
    * calling (writer) thread — the async thread only runs the staged
    * parquet job, exactly like the update path's startAppend. */
  private def buildFromMapOutput(mapOut: DataFrame): Unit = {
    val arranged = mapOut
      .repartition($"parent")
      .sortWithinPartitions($"parent", $"reduce_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val session = spark
      val manifest = pending != null
      val fut = java.util.concurrent.CompletableFuture.supplyAsync { () =>
        // SQLConf.get in the job thread resolves via the active-session
        // thread-local; a fresh pool thread has none.
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        val w = arranged.write.partitionBy("parent").mode("overwrite")
        if (manifest) {
          w.parquet(s"$mapResultsPath.staging")
          // The rename fan-out is pure filesystem work (no model
          // mutation) and merged files stay invisible until the model
          // names them at publish — run it here so it overlaps the tree
          // write instead of serializing after it. A crash between the
          // renames and the publish leaves orphans compact() sweeps,
          // the same contract as a crash before the renames.
          mergeStagedDir(mapResultsPath)
        } else { w.parquet(mapResultsPath); Vector.empty[String] }
      }
      try rereduceAll(Some(arranged))
      finally {
        val rels = fut.join()
        if (manifest) {
          modelRetireTable("map_results")
          modelAddFiles(rels)
        } else bumpStoreVersion()
      }
    } finally arranged.unpersist(false)
  }

  /** The driver-small update paths' (key, parent) reduce: cluster by
    * parent, sort, and reduce the contiguous runs via
    * [[partialsFromClustered]]. Same single narrow shuffle the
    * groupByKey spelling pays, without the AppendColumns key
    * serialization or the object-hash sort fallback. The DISTRIBUTED
    * large-batch path ([[rereduce]]) deliberately keeps the Aggregator
    * spelling: its map-side combine shrinks what a corpus-sized level-0
    * slice ships across the exchange, which matters there and not in
    * the O(batch)/O(dirty) inputs this serves. */
  private def reduceByKeyParentSmall(df: DataFrame): DataFrame =
    partialsFromClustered(
      df.select($"reduce_key", $"parent", $"payload")
        .repartition($"parent")
        .sortWithinPartitions($"parent", $"reduce_key"))

  /** Level-1 partials from map output already clustered by `parent` and
    * sorted by (parent, reduce_key) within partitions: every (key,
    * parent) group is a contiguous run, so one streaming pass reduces
    * each group in place — no shuffle, no hash map, no sort (the
    * groupByKey spelling re-shuffles rows the build just clustered, and
    * its object-hash aggregation falls back to a full sort past 128
    * distinct keys per partition). Serves single- and multi-output
    * reduces alike; groups stream through the user's reduce as lazy
    * iterators, same as the flatMapGroups path. */
  private def partialsFromClustered(arranged: DataFrame): DataFrame = {
    val t = task // local val: the closure must not capture `this`
    implicit val encIn: Encoder[(String, Int, R)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, encR)
    arranged.select($"reduce_key", $"parent", $"payload")
      .as[(String, Int, R)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, Int, R)] {
          private var outs: Iterator[R] = Iterator.empty
          private var curKey: String = _
          private var curParent: Int = _
          private def advance(): Unit =
            while (!outs.hasNext && buf.hasNext) {
              val key = buf.head._1
              val par = buf.head._2
              val run = new Iterator[R] {
                def hasNext: Boolean = buf.hasNext &&
                  buf.head._2 == par && buf.head._1 == key
                def next(): R = buf.next()._3
              }
              // Force the user's (possibly lazy) outputs while the run
              // iterator is still valid, then drain any unconsumed
              // remainder of the run. Outputs per group are small by the
              // reduce contract; the inputs stream.
              val reduced = t.reduce(run).toVector
              while (run.hasNext) run.next()
              curKey = key; curParent = par
              outs = reduced.iterator
            }
          def hasNext: Boolean = { advance(); outs.hasNext }
          def next(): (String, Int, R) = {
            advance(); val r = outs.next(); (curKey, curParent, r)
          }
        }
      }
      .toDF("reduce_key", "parent", "payload")
  }

  private def rereduce(dirty: DataFrame,
      collectedParents: Option[Array[Int]] = None): Unit = {
    val dirtyParents = collectedParents.getOrElse(
      dirty.select("parent").distinct().as[Int].collect().sorted)
    if (dirtyParents.isEmpty) return

    // ---- level 0 → level 1: rebuild dirty (key, parent) partials -------
    val level0 = readMapResults()
      .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .join(dirty, Seq("reduce_key", "parent"), "left_semi")
    val newPartials = reduceByKeyParent(level0)
      .select("parent", "reduce_key", "payload")

    val retainedPartials = readPartials()
      .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .join(dirty, Seq("reduce_key", "parent"), "left_anti")
    // Retained = partials in the dirty parent partitions whose (key,
    // parent) pair is NOT being rebuilt; dirty pairs that produced no
    // output simply disappear (doc remapped away, empty group).
    val partialsOut = retainedPartials.unionByName(newPartials)

    // ---- level 1 -> final: rebuild finals for dirty keys, reading
    // level-1 inputs from non-dirty parents on disk plus the in-memory
    // post-update partials of the dirty parents ------------------------
    val dirtyKeys = dirty.select("reduce_key").distinct()
    val level1ForKeys = readPartials()
      .where(!$"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .join(dirtyKeys, Seq("reduce_key"), "left_semi")
      .unionByName(partialsOut.join(dirtyKeys, Seq("reduce_key"), "left_semi"))
    val newFinals = reduceByKey(level1ForKeys)
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .select("fpart", "reduce_key", "payload")

    val dirtyFparts = dirtyKeys
      .select(pmod(hash($"reduce_key"), lit(config.finalParts)) as "fpart")
      .distinct().as[Int].collect().sorted // bounded by finalParts
    val finalsOut = readFinals()
      .where($"fpart".isin(dirtyFparts.map(Integer.valueOf): _*))
      .join(dirtyKeys, Seq("reduce_key"), "left_anti")
      .unionByName(newFinals)
    stageAndOverwriteTree(
      tagLevel1(partialsOut).unionByName(tagLevel2(finalsOut)),
      dirtyParents.toSeq.map(p => s"level=1/part=$p") ++
        dirtyFparts.toSeq.map(fp => s"level=2/part=$fp"),
      clustered = false)
  }

  /** Run the user's re-reducible `reduce` over each (key, parent) group.
    * Two strategies:
    *   - `singleOutput` tasks (SURVEY §7.2.5): a native [[ReduceAggregator]]
    *     typed aggregation — Spark plans it partial+final, so each map-side
    *     task pre-combines its rows and only per-group partials cross the
    *     shuffle (valid exactly because reduce is re-reducible).
    *   - general path: `flatMapGroups`, because the full contract is
    *     `R* => R*` (multi-output), which `Aggregator` cannot express
    *     (`MapReduceTask.cs:10`). */
  private def reduceByKeyParent(df: DataFrame): DataFrame = {
    val t = task
    implicit val encIn: Encoder[(String, Int, R)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, encR)
    val grouped = df.select($"reduce_key", $"parent", $"payload")
      .as[(String, Int, R)]
      .groupByKey(x => (x._1, x._2))
    if (t.singleOutput) {
      implicit val encKP: Encoder[(String, Int)] =
        Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
      implicit val encOut: Encoder[((String, Int), R)] =
        Encoders.tuple(encKP, encR)
      grouped.mapValues(_._3)
        .agg(new ReduceAggregator[R](t.reduce(_)).toColumn)
        .map { case ((k, p), r) => (k, p, r) }
        .toDF("reduce_key", "parent", "payload")
    } else {
      grouped.flatMapGroups {
        (kp: (String, Int), rows: Iterator[(String, Int, R)]) =>
          t.reduce(rows.map(_._3)).map(r => (kp._1, kp._2, r))
      }.toDF("reduce_key", "parent", "payload")
    }
  }

  private def reduceByKey(df: DataFrame): DataFrame = {
    val t = task
    implicit val encIn: Encoder[(String, R)] =
      Encoders.tuple(Encoders.STRING, encR)
    val grouped = df.select($"reduce_key", $"payload").as[(String, R)]
      .groupByKey(_._1)
    if (t.singleOutput) {
      implicit val encOut: Encoder[(String, R)] = encIn
      grouped.mapValues(_._2)
        .agg(new ReduceAggregator[R](t.reduce(_)).toColumn)
        .toDF("reduce_key", "payload")
    } else {
      grouped.flatMapGroups { (k, rows) =>
        t.reduce(rows.map(_._2)).map(r => (k, r))
      }.toDF("reduce_key", "payload")
    }
  }

  // ---------------------------------------------------------------------
  // Reads — mirror `Executer.Query` (`Executer.cs:370-377`)
  // ---------------------------------------------------------------------

  /** Final reduced values for one key; empty if absent
    * (`Executer.cs:373-375`). Prunes to a single `fpart` partition. */
  def query(key: String): Dataset[R] = consistentRead {
    configChecked
    if (!exists(treePath)) spark.emptyDataset[R]
    else readFinals()
      .where($"fpart" === fpartOf(key) && $"reduce_key" === key)
      .select("payload.*").as[R]
  }

  /** Final reduced values for SEVERAL keys in one partition-pruned scan
    * (the multi-key generalization of [[query]]): reads at most
    * |distinct fparts of keys| ≤ |keys| of the `finalParts` partitions,
    * where a [[queryAll]] fallback would scan them all. Returned as
    * (reduce_key, payload fields) rows — several keys' values
    * interleave, so the key column disambiguates; absent keys simply
    * contribute no rows. */
  def queryKeys(keys: Seq[String]): DataFrame = consistentRead {
    configChecked
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val outCols = $"reduce_key" +:
      encR.schema.fieldNames.toSeq.map(f => col(s"payload.$f"))
    if (keys.isEmpty || !exists(treePath)) {
      val schema = StructType(
        StructField("reduce_key", StringType) +: encR.schema.fields)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val fparts = keys.map(fpartOf).distinct
      readFinals()
        .where($"fpart".isin(fparts.map(Integer.valueOf): _*) &&
          $"reduce_key".isin(keys: _*))
        .select(outCols: _*)
    }
  }

  /** The currently-published snapshot generation of a manifest store, or
    * −1 on legacy stores. Pair with [[queryAllAt]] for stable time-travel
    * reads: capture the version before a mutation, read that exact
    * generation after it. */
  def snapshotVersion(): Long = readCurrentVersion()

  /** [[queryAll]] as of an earlier published generation — the manifest
    * layer's time-travel read (SURVEY §14): a generation's file list is
    * immutable, and its replaced files survive on disk for
    * `manifestRetention` generations AND `manifestGraceMs` after
    * retirement (longer if no further mutations land; `compact()`
    * reclaims immediately). Reading a generation whose manifest or data
    * files have been GC'd fails with a file-not-found error — never a
    * silently wrong answer. Legacy stores have no generations. */
  /** The CDC invalidation surface: DISTINCT reduce keys touched by any
    * mutation published in generations `(sinceVersion, current]` — the
    * set a downstream consumer holding results as of `sinceVersion`
    * must refetch (and only that set). "Touched" means a document
    * contributed to the key before or after the mutation — the same
    * dirty set the engine's own incremental maintenance re-reduces, so
    * the record costs one local write (driver-known batches) or one
    * keys-only parquet write (distributed ones) per published
    * generation, never a state diff. A key that VANISHED is in the set
    * (its deletion must invalidate); a rebuilt store records old ∪ new
    * final keys. `compact()` prunes records older than
    * `manifestRetention` generations — asking past the pruning horizon
    * fails loudly, never silently under-reports. Manifest stores only
    * (generations are the manifest layer's construct). */
  def changedKeysSince(sinceVersion: Long): DataFrame = {
    configChecked
    val cur = readCurrentVersion()
    if (cur < 0) throw new UnsupportedOperationException(
      "changedKeysSince: not a manifest store (no published generations)")
    changedKeysIn(sinceVersion, cur)
  }

  /** The oldest base generation [[changedKeysSince]]/[[diffSince]] can
    * still answer from: records for generations BELOW this have been
    * pruned by `compact()` (asking throws, by contract). −1 on a
    * never-compacted store. A CDC consumer whose cursor fell below this
    * must full-resync ([[graft.streaming.CdcConsumer]]'s documented
    * fallback) — this accessor is what lets it decide BEFORE the loud
    * failure. */
  def changedHorizonVersion(): Long = {
    configChecked
    changedHorizon()
  }

  /** [[changedKeysSince]] with the upper generation PINNED by the caller
    * — so a read path that snapshots the store at entry ([[diffSince]])
    * derives its key set from exactly the generations its images cover,
    * never from a generation a concurrent writer published mid-read. */
  private def changedKeysIn(sinceVersion: Long, cur: Long): DataFrame = {
    require(sinceVersion >= -1 && sinceVersion <= cur,
      s"sinceVersion must be in [-1, $cur], got $sinceVersion")
    val h = changedHorizon()
    if (sinceVersion < h) throw new IllegalStateException(
      s"changed-keys records up to generation $h have been pruned by " +
        s"compact(); cannot answer since=$sinceVersion — refetch everything")
    val vs = (sinceVersion + 1) to cur
    val localKeys = vs.flatMap(readChangedLocal)
    val localDF = spark.createDataset(localKeys.toSeq)(Encoders.STRING)
      .toDF("reduce_key")
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("reduce_key", StringType)))
    // ONE multi-path scan over every generation's distributed record:
    // folding unionByName per directory built a plan with one scan node
    // (and one file index) per generation — O(polled generations)
    // driver-side analysis for a reader that may span hundreds of
    // generations at scale. The dirs are flat same-schema parquet, so a
    // single relation is semantically identical under the distinct.
    val dirs = vs.map(changedDistPath).filter(exists)
    (if (dirs.isEmpty) localDF
     else localDF.unionByName(
       spark.read.schema(schema).parquet(dirs: _*)))
      .distinct()
  }

  def queryAllAt(version: Long): DataFrame = {
    configChecked
    require(version >= 0, s"snapshot generations are >= 0, got $version")
    val snap = Some(manifestAt(version))
    relFor(treePath, treeReadSchema, snap)
      .where($"level" === 2)
      .select($"reduce_key" +: encR.schema.fieldNames.toSeq
        .map(f => col(s"payload.$f")): _*)
  }

  /** The CDC surface with BEFORE/AFTER IMAGES — [[changedKeysSince]]
    * upgraded from an invalidation set to a Debezium-style change feed:
    * one row per touched key with `change_type` ('insert' | 'update' |
    * 'delete'), the key's payload as of generation `sinceVersion`
    * (`old_*` columns, NULL on insert), and its current payload
    * (`new_*` columns, NULL on delete). Consumers that can apply
    * retractions directly (a downstream delta-reducible index, an
    * external OLAP sink) read this instead of refetching via
    * [[queryKeys]] — the before-image IS the retraction.
    *
    * Semantics follow the invalidation set exactly: "touched" means a
    * document contributed to the key before or after some mutation in
    * `(sinceVersion, current]` — so a key whose documents were
    * resubmitted with identical payloads still appears, as an 'update'
    * whose old and new images are equal (the consumer's idempotent
    * apply makes it a no-op). Both sides are snapshot reads (the old
    * side time-travels to `sinceVersion`, within the same GC-retention
    * contract as [[queryAllAt]]); the join is pruned to the changed
    * keys — O(churn) rows move, never O(keys). */
  def diffSince(sinceVersion: Long): DataFrame = consistentRead {
    configChecked
    require(sinceVersion >= 0,
      s"diffSince needs a published base generation, got $sinceVersion")
    // The full_outer join below pairs old and new images BY KEY — sound
    // only when a key has exactly one output row per side. A
    // multi-output task (singleOutput=false is a legal shape) would pair
    // arbitrary old/new rows with no error; fail loudly instead
    // (ADVICE r10). Such consumers use changedKeysSince + queryKeys.
    require(task.singleOutput,
      "diffSince requires a singleOutput task: the before/after images " +
        "are keyed by reduce_key, which is only unambiguous when each " +
        "key has one output row — use changedKeysSince + queryKeys for " +
        "multi-output stores")
    // Pin BOTH generations at entry (ADVICE r10): the key set, the
    // before side, and the after side must all resolve the same pair of
    // manifests, or a concurrent writer could mix keys from one
    // generation with after-images from a later one.
    val cur = readCurrentVersion()
    if (cur < 0) throw new UnsupportedOperationException(
      "diffSince: not a manifest store (no published generations)")
    val keysDF = changedKeysIn(sinceVersion, cur) // distinct reduce_key
    val fields = encR.schema.fieldNames.toSeq
    // Prune both snapshot reads to the changed keys' final partitions —
    // the same one-job-per-poll shape as [[queryKeys]]: when the churn
    // fits the driver (the normal poll; the bound every CDC consumer
    // already lives under), both sides read |distinct fparts| ≤ |keys|
    // partitions with pushed-down key predicates; a poll with more
    // churn than fits the driver falls back to semi-joins against the
    // key set (O(keys-scan) IO — at that churn a full resync is the
    // better consumer strategy anyway, see [[CdcConsumer]]).
    val keysProbe = keysDF.limit(DriverDirtyLimit + 1).collect()
      .map(_.getString(0))
    val driverSmall = keysProbe.length <= DriverDirtyLimit
    def pruned(df: DataFrame, partCol: String): DataFrame =
      if (driverSmall) {
        val fparts = keysProbe.map(fpartOf).distinct.toSeq
        df.where(col(partCol).isin(fparts.map(Integer.valueOf): _*) &&
          $"reduce_key".isin(keysProbe.toSeq: _*))
      } else df.join(keysDF, Seq("reduce_key"), "left_semi")
    // A zero-churn window needs NO old images: resolve the before side
    // from the CURRENT manifest instead of time-travelling to a
    // generation compact() may have reclaimed. Non-empty churn DOES
    // need them, and they must come from DISK-resolvable state: this
    // instance's manifest cache can outlive a compact() that reclaimed
    // m<since>, which would make the poll's outcome depend on WHICH
    // process asks (the writer answers from cache, a fresh handle
    // throws FileNotFound). Refuse deterministically instead — the
    // same loud-refusal class as the changed-records horizon (both
    // found by StoreReaderChurnProps).
    val snapB = Some(
      if (keysProbe.isEmpty) manifestAt(cur)
      else {
        if (!exists(manifestFile(sinceVersion)))
          throw new IllegalStateException(
            s"diffSince: generation $sinceVersion's manifest was " +
              "reclaimed by compact() — old images unavailable; consume " +
              "changedKeysSince + queryKeys, or full-resync from finals")
        manifestAt(sinceVersion)
      })
    val before = pruned(
        relFor(treePath, treeReadSchema, snapB).where($"level" === 2), "part")
      .select((col("reduce_key") +: fields.map(f =>
        col(s"payload.$f") as s"old_$f")) :+ lit(true).as("_was"): _*)
    // After side reads the manifest captured at entry, not the live
    // pointer — same snapshot discipline as the before side.
    val snapA = Some(manifestAt(cur))
    val after = pruned(
        relFor(treePath, treeReadSchema, snapA).where($"level" === 2), "part")
      .select((col("reduce_key") +: fields.map(f =>
        col(s"payload.$f") as s"new_$f")) :+ lit(true).as("_is"): _*)
    before.join(after, Seq("reduce_key"), "full_outer")
      .withColumn("change_type",
        when(col("_was").isNull, lit("insert"))
          .when(col("_is").isNull, lit("delete"))
          .otherwise(lit("update")))
      .drop("_was", "_is")
  }

  /** [[query]] as of an earlier published generation — the point-read
    * sibling of [[queryAllAt]]: the same immutable-snapshot semantics,
    * pruned to the key's single final partition exactly like a live
    * point read (the snapshot's file list still carries partition
    * paths, so the `part` filter prunes before any IO). */
  def queryAt(key: String, version: Long): Dataset[R] = {
    configChecked
    require(version >= 0, s"snapshot generations are >= 0, got $version")
    val snap = Some(manifestAt(version))
    relFor(treePath, treeReadSchema, snap)
      .where($"level" === 2 && $"part" === fpartOf(key) &&
        $"reduce_key" === key)
      .select("payload.*").as[R]
  }

  /** Register generation `version` of this store as temp view `name` —
    * the SQL spelling of [[queryAllAt]]. Unlike [[registerStore]]'s
    * views this one is deliberately NOT refreshed after mutations: a
    * published generation is immutable, so the pinned plan IS the
    * correct semantics for as long as the generation stays within the
    * GC retention window. */
  def registerStoreAt(name: String, version: Long): Unit =
    queryAllAt(version).createOrReplaceTempView(name)

  /** Roll the store back to published generation `targetVersion` — the
    * manifest layer's time travel made WRITABLE. The restored state
    * lands as a NEW forward generation (never a history rewrite): a new
    * manifest is published whose live file list and tombstone pointer
    * are the target generation's, files the current generation added
    * are retired on the normal GC schedule, and files the target holds
    * live leave the retired list (they are referenced again). No data
    * file is copied, moved, or rewritten — the whole operation is one
    * changed-keys record plus one manifest write, O(manifest), at any
    * store size.
    *
    * Because generations only move FORWARD, every concurrent-read and
    * CDC contract survives unchanged: pinned [[queryAllAt]] reads of
    * intermediate generations stay valid until ordinary GC retention,
    * and a [[changedKeysSince]]/[[diffSince]] consumer at any cursor
    * converges through the rollback — the new generation's invalidation
    * record is exactly the keys touched in `(targetVersion, current]`,
    * a superset of the keys whose value changes back for every possible
    * cursor position (superset invalidation is always safe; equal
    * old/new images are the documented no-op 'update' shape).
    *
    * Fails loudly, mutating nothing, when the rollback cannot be
    * answered exactly: the target manifest or any of its data files
    * already GC'd (same retention contract as [[queryAllAt]]), the
    * changed-keys records for `(targetVersion, current]` pruned by
    * `compact()` (same horizon contract as [[changedKeysSince]]), an
    * unrecovered WAL from an interrupted batch (call [[recover]] first
    * — flipping the layout under a pending replay would apply the
    * replay to the wrong generation), or a legacy (non-manifest) store.
    *
    * Crash contract: the changed-keys record is written BEFORE the
    * manifest flip (the same order every mutation uses — the record
    * belongs to the generation the publish is about to land). A crash
    * between the two leaves an orphan record for a never-published
    * generation; the next successful mutation overwrites it, or — if it
    * records distributed while the orphan was local (or vice versa) —
    * the union is read, which can only over-invalidate, never miss.
    *
    * Returns the new current generation (`current + 1`); rolling back
    * to the current generation is a published no-op returning
    * `current`. */
  def rollbackTo(targetVersion: Long): Long = withLease {
    configChecked
    if (pending == null) throw new UnsupportedOperationException(
      "rollbackTo: not a manifest store (no published generations)")
    val cur = pending.version
    require(targetVersion >= 0 && targetVersion <= cur,
      s"rollbackTo: target must be a published generation in [0, $cur], " +
        s"got $targetVersion")
    if (targetVersion == cur) cur
    else {
      if (exists(dirtyLocalPath) || exists(dirtyPath))
        throw new IllegalStateException(
          "rollbackTo: an interrupted batch's WAL is pending — call " +
            "recover() first, then roll back")
      val target = manifestAt(targetVersion) // loud if the manifest was GC'd
      val targetRels =
        target.live.valuesIterator.flatten.toVector ++ target.tombLocal
      val missing = targetRels.filterNot(rel => exists(s"$storePath/$rel"))
      if (missing.nonEmpty) throw new IllegalStateException(
        s"rollbackTo: generation $targetVersion is past GC retention — " +
          s"${missing.size} of its data files no longer exist " +
          s"(first: ${missing.head})")
      // The invalidation record: every key touched between the target
      // and now — computed BEFORE the flip, from the same records a CDC
      // consumer reads (throws past the compact() horizon).
      val changed = changedKeysIn(targetVersion, cur)
      val newV = cur + 1
      val keysProbe = changed.limit(DriverDirtyLimit + 1).collect()
        .map(_.getString(0))
      if (keysProbe.length <= DriverDirtyLimit)
        writeLocalAtomic(changedLocalPath(newV)) { out =>
          out.writeInt(keysProbe.length)
          keysProbe.foreach(writeStr(out, _))
        }
      else changed.write.mode("overwrite").parquet(changedDistPath(newV))
      // Flip the layout model; publishPending (withLease's epilogue)
      // lands m<newV> and the `_current` pointer atomically.
      val targetLiveSet = targetRels.toSet
      val nowMs = System.currentTimeMillis()
      val reRetired =
        (pending.live.valuesIterator.flatten.toVector ++ pending.tombLocal)
          .filterNot(targetLiveSet)
          .map(Retired(_, newV, nowMs))
      pending = pending.copy(
        live = target.live,
        tombLocal = target.tombLocal,
        retired = pending.retired.filterNot(r => targetLiveSet(r.path)) ++
          reRetired)
      pendingRev += 1; pendingDirty = true
      newV
    }
  }

  /** Fork published generation `version` into a NEW independent store at
    * `newStorePath` — the branching half of writable time travel
    * ([[rollbackTo]] is the in-place half). The branch copies ONLY the
    * generation's live files (not the source's full history), publishes
    * them as its own generation 0 with a full-key-set invalidation
    * record (the same record an initial build writes, so CDC consumers
    * bootstrap off the branch exactly like off a fresh build), and
    * inherits the source's batch-sequence floor so tombstone seqs in the
    * copied map rows can never collide with the branch's future batches
    * (the [[reshapeTo]] discipline). Source and branch share NOTHING on
    * disk afterwards: either side's updates, GC, or compact() cannot
    * touch the other.
    *
    * Cost is O(live bytes of one generation) — a data copy, not a
    * recompute: the map pass never re-runs and the reduce tree is taken
    * as-is. Same loud-failure contract as [[rollbackTo]] for a target
    * past GC retention; the destination must not already hold a store.
    * The SOURCE is not locked and not mutated — a published generation
    * is immutable, so concurrent source writers are harmless (its files
    * survive at least `manifestRetention`/`manifestGraceMs` past
    * retirement; branch within that window, like any time-travel
    * read). */
  def branchAt(version: Long, newStorePath: String,
      dstLease: Option[LeaseProvider] = None): Executer[D, R] = {
    configChecked
    require(version >= 0, s"snapshot generations are >= 0, got $version")
    if (readCurrentVersion() < 0) throw new UnsupportedOperationException(
      "branchAt: not a manifest store (no published generations)")
    val target = manifestAt(version) // loud if the manifest was GC'd
    val rels = target.live.valuesIterator.flatten.toVector ++ target.tombLocal
    val missing = rels.filterNot(rel => exists(s"$storePath/$rel"))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"branchAt: generation $version is past GC retention — " +
        s"${missing.size} of its data files no longer exist " +
        s"(first: ${missing.head})")
    val seqFloor = currentSeq
    val dst = new Executer[D, R](task, newStorePath, config, dstLease)
    dst.withLease {
      dst.configChecked
      require(!dst.exists(dst.mapResultsPath) &&
        dst.readCurrentVersion() < 0,
        s"branchAt destination $newStorePath already holds a store")
      // The copy is a DISTRIBUTED job, not a driver loop: one task per
      // partition of the file list, each opening its filesystems from
      // the executor's own Hadoop config — at 100 TB the branch copy is
      // the operation's entire cost, and it parallelizes perfectly
      // (immutable source files, disjoint destinations). A single-file
      // store skips the job. Any task's failed copy fails the job and
      // the branch is stillborn (no manifest was published).
      val srcRoot = storePath; val dstRoot = newStorePath
      if (rels.size <= 1) {
        val conf = spark.sparkContext.hadoopConfiguration
        rels.foreach { rel =>
          val to = new Path(s"$dstRoot/$rel")
          dst.fs.mkdirs(to.getParent)
          if (!org.apache.hadoop.fs.FileUtil.copy(fs,
              new Path(s"$srcRoot/$rel"), dst.fs, to, false, conf))
            throw new java.io.IOException(s"branchAt: copy failed for $rel")
        }
      } else {
        val par = math.min(rels.size,
          math.max(2, spark.sparkContext.defaultParallelism))
        // Roots are qualified HERE, against the driver's filesystems, so
        // a scheme-less store path ("/data/store") reaches the tasks as
        // an absolute URI of the intended filesystem, and the session's
        // Hadoop config rides along broadcast (ADVICE r13).
        val qSrc = fs.makeQualified(new Path(srcRoot)).toString
        val qDst = dst.fs.makeQualified(new Path(dstRoot)).toString
        val bconf = spark.sparkContext.broadcast(
          Executer.confEntries(spark.sparkContext.hadoopConfiguration))
        try spark.sparkContext.parallelize(rels, par)
          .foreachPartition(Executer.copyBranchFiles(qSrc, qDst, bconf))
        finally bconf.destroy()
      }
      if (seqFloor >= 0)
        dst.writeLocalAtomic(dst.seqPath)(_.writeInt(seqFloor))
      // Adopt the copied layout as the branch's generation 0, then
      // derive its invalidation record from its OWN pending snapshot
      // (the writer thread resolves `pending`, so readFinals sees the
      // adopted files before the publish in withLease's epilogue).
      dst.pending = dst.pending.copy(
        live = target.live, tombLocal = target.tombLocal,
        retired = Vector.empty)
      dst.pendingRev += 1; dst.pendingDirty = true
      dst.readFinals().select("reduce_key").distinct()
        .write.mode("overwrite").parquet(dst.changedDistPath(0L))
    }
    dst
  }

  /** The whole index as a DataFrame — strictly more capable than the
    * reference's point read: range scans, joins, further aggregation. */
  def queryAll(): DataFrame = consistentRead {
    configChecked
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    if (!exists(treePath)) {
      val schema = StructType(
        StructField("reduce_key", StringType) +: encR.schema.fields)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else readFinals().select($"reduce_key" +: encR.schema.fieldNames.toSeq
      .map(f => col(s"payload.$f")): _*)
  }

  /** Provenance: which documents feed reduce key `key`, and through which
    * map bucket — the reference's by-key map-result enumeration
    * (`Executer.cs:305-334`, directory scan of `MapResults/<key>`) as a
    * reduce_key-filtered scan of `map_results`. Every data file is
    * written sorted by `reduce_key` within its partition, so parquet
    * row-group min/max stats skip the bulk of each file (same cost shape
    * as [[delete]], documented there). */
  def contributors(key: String): DataFrame = consistentRead {
    configChecked
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    if (!exists(mapResultsPath)) {
      val schema = StructType(Seq(
        StructField("doc_id", StringType), StructField("bucket", IntegerType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else readMapResults().where($"reduce_key" === key)
      .select("doc_id", "bucket")
  }

  /** Reverse provenance: every (reduce key, bucket) a document feeds —
    * the engine-internal per-doc lookup of the reference
    * (`Executer.cs:245-250`) as a public surface. Unlike [[contributors]]
    * this prunes to ONE partition: a doc's parent is a pure function of
    * its id, so the scan reads 1/fanIn of the table regardless of size. */
  def contributionsOf(docId: String): DataFrame = consistentRead {
    configChecked
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    if (!exists(mapResultsPath)) {
      val schema = StructType(Seq(
        StructField("reduce_key", StringType), StructField("bucket", IntegerType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      val id = normId(docId)
      val parent = Executer.parentOf(id, config.fanIn)
      readMapResults()
        .where($"parent" === parent && $"doc_id" === id)
        .select("reduce_key", "bucket")
    }
  }

  /** True while the store has no persisted map state (nothing ever
    * ingested) — the cheap existence probe consumers use to skip work
    * that is provably empty on a fresh store. */
  def isEmptyStore: Boolean = {
    configChecked
    !exists(mapResultsPath)
  }

  /** Every LIVE document id in the store (distinct, post-normalization,
    * tombstoned docs excluded) — the inventory a CDC consumer needs on a
    * re-bootstrap to find downstream documents the new snapshot no
    * longer covers ([[graft.streaming.CdcConsumer]]). One distinct over
    * `map_results`; the caller bounds any collect. */
  def documentIds(): DataFrame = consistentRead {
    configChecked
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    if (!exists(mapResultsPath))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", StringType))))
    else readMapResults().select("doc_id").distinct()
  }

  // ---------------------------------------------------------------------
  // SQL surface — maintained state as named views (VERDICT r5 #7)
  // ---------------------------------------------------------------------

  private val registeredViews =
    scala.collection.mutable.LinkedHashSet[String]()

  /** Expose this store's maintained state to SQL-only consumers as temp
    * views: `<name>` = the final results ([[queryAll]]'s shape),
    * `<name>_finals` = the same rows WITH the physical `fpart` partition
    * column — a SQL point query prunes partitions exactly like [[query]]
    * does, because Spark SQL's `hash()` is the same Murmur3/seed-42 the
    * writer buckets by: `WHERE fpart = pmod(hash(k), finalParts) AND
    * reduce_key = k` — and `<name>_provenance` = (reduce_key, doc_id,
    * bucket), the contributors table. The reference exposes state only
    * as `Query(key)` (`Executer.cs:370-377`); this widens the read
    * surface to any SQL client of the session. Views are re-registered
    * after every mutation THIS instance performs, so SQL reads through
    * them always resolve the current file layout (a temp view pins its
    * plan — and with it the parquet file listing — at registration). */
  def registerStore(name: String): Unit = {
    registeredViews += name
    refreshViews()
  }

  private def refreshViews(): Unit = registeredViews.foreach { n =>
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    queryAll().createOrReplaceTempView(n)
    consistentRead {
      if (exists(treePath))
        readFinals().select($"fpart" +: $"reduce_key" +:
          encR.schema.fieldNames.toSeq.map(f => col(s"payload.$f")): _*)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(StructField("fpart", IntegerType) +:
          StructField("reduce_key", StringType) +: encR.schema.fields))
    }.createOrReplaceTempView(s"${n}_finals")
    consistentRead {
      if (exists(mapResultsPath))
        readMapResults().select("reduce_key", "doc_id", "bucket")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("reduce_key", StringType),
          StructField("doc_id", StringType),
          StructField("bucket", IntegerType))))
    }.createOrReplaceTempView(s"${n}_provenance")
  }

  /** Drop all stored state for one reduce key — the reference's public
    * utility `Delete` (`Executer.cs:222-238`).
    *
    * Deliberate cost note: finding the key's map rows scans `map_results`
    * with only a `reduce_key` filter — there is no key→parents index.
    * Every data file is written sorted by `reduce_key` within its
    * partition, so parquet row-group min/max stats skip the bulk of each
    * file; what remains is one footer+stats pass over the table, which is
    * the right trade for an operation as rare as a whole-key purge (vs
    * maintaining another state table on every update). */
  def delete(key: String): Unit = withLease {
    configChecked
    recoverLocked()
    if (exists(mapResultsPath)) {
      val t = readMapResults()
      val parts = t.where($"reduce_key" === key)
        .select("parent").distinct().as[Int].collect()
      if (parts.nonEmpty) {
        // WAL before mutation: a crash between the map rewrite and the
        // tree rewrite would otherwise leave the key queryable from the
        // tree with its map rows gone, with nothing to repair it.
        // recover() replays the pruned re-reduce for these pairs, which
        // rebuilds the key from whatever map state committed — rows
        // still present (no-op) or already deleted (key disappears,
        // completing this delete). Both consistent.
        writeDirtyLogLocal(parts.map(p => (key, p)).toSeq)
        val kept = t.where($"parent".isin(parts.map(Integer.valueOf): _*))
          .where($"reduce_key" =!= key)
        stageAndOverwrite(kept, mapResultsPath, "parent", parts.toSeq,
          clustered = true)
      }
    }
    if (exists(treePath)) {
      val pparts = readPartials().where($"reduce_key" === key)
        .select("parent").distinct().as[Int].collect().sorted
      val fp = fpartOf(key)
      val keptPartials = readPartials()
        .where($"parent".isin(pparts.map(Integer.valueOf): _*))
        .where($"reduce_key" =!= key)
      val keptFinals = readFinals()
        .where($"fpart" === fp).where($"reduce_key" =!= key)
      stageAndOverwriteTree(
        tagLevel1(keptPartials).unionByName(tagLevel2(keptFinals)),
        pparts.toSeq.map(p => s"level=1/part=$p") :+ s"level=2/part=$fp",
        clustered = true)
    }
    clearDirtyLog()
  }

  /** Remove documents from the index entirely — the update path with an
    * empty insert: tombstone the ids (O(docs) write), re-reduce only the
    * (key, parent) pairs they fed. The reference has no doc-level delete
    * (only the whole-key utility), but update-as-delete+insert implies
    * it; at scale this is the "purge these records" compliance op,
    * costing O(changed docs), never a table rewrite. Ids are a
    * driver-side Seq by contract (a purge list, not a dataset). */
  def deleteDocuments(docIds: Seq[String]): Unit = withLease {
    configChecked
    recoverLocked()
    val t0 = System.nanoTime()
    var jobs = 0
    val ids = docIds.map(normId).distinct
    if (ids.nonEmpty && exists(mapResultsPath)) {
      val batchSeq = bumpSeq()
      val parents = ids
        .map(id => StableBucketHash.hash(id, config.buckets) / config.fanIn)
        .distinct.sorted
      val existing = readMapResults()
        .where($"parent".isin(parents.map(Integer.valueOf): _*))
      val tiny = ids.length <= 64
      val pairs = withTinyShuffle(if (tiny) 1 else 8, codegenOff = tiny) {
        existing.where($"doc_id".isin(ids: _*))
          .select($"reduce_key", $"parent").distinct().collect()
          .map(r => (r.getString(0), r.getInt(1))).toSeq
      }; jobs += 1
      if (pairs.nonEmpty) {
        // WAL first, then tombstones — same crash ordering as execute.
        writeDirtyLogLocal(pairs)
        addTombstonesLocal(ids, batchSeq)
        withTinyShuffle(if (tiny) 1 else 8, codegenOff = tiny) {
          val dirtyParents = pairs.map(_._2).distinct.sorted
          val level0 = existing
            .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
            .where(!$"doc_id".isin(ids: _*))
          rereducePruned(pairs, level0, clustered = tiny); jobs += 1
        }
        clearDirtyLog()
        _lastStats = Some(MaintenanceStats("delete-docs", jobs, ids.length,
          pairs.size, pairs.map(_._2).distinct.size,
          (System.nanoTime() - t0) / 1000000))
        if (tombstoneEstimate() > config.tombstoneLimit) foldTombstonesLocked()
      }
    }
  }

  private def fpartOf(key: String): Int =
    Executer.fpartHash(key, config.finalParts)

  // ---------------------------------------------------------------------
  // Storage plumbing
  // ---------------------------------------------------------------------

  // Explicit schemas on every state read: schema inference would read a
  // parquet footer per table open (several opens per maintenance batch),
  // and the payload struct schema is statically known from the task's
  // result encoder anyway.
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType, StructField, StructType}

  private lazy val mapReadSchema = StructType(Seq(
    StructField("bucket", IntegerType), StructField("reduce_key", StringType),
    StructField("doc_id", StringType), StructField("seq", IntegerType),
    StructField("payload", encR.schema), StructField("parent", IntegerType)))
  private lazy val treeReadSchema = StructType(Seq(
    StructField("reduce_key", StringType), StructField("payload", encR.schema),
    StructField("level", IntegerType), StructField("part", IntegerType)))

  // ---- base-relation cache -------------------------------------------
  // Creating `spark.read.parquet(path)` lists the table's partition
  // directories into a fresh InMemoryFileIndex every call. A 1-doc
  // update issues several independent state reads (map_results once,
  // reduce_tree three times inside rereducePruned, tombstones), so the
  // fixed per-update driver overhead was dominated by repeated identical
  // listings + reader analysis (VERDICT r4 #2 "what's wrong"). The plan
  // for each table path is cached and keyed on a persisted store
  // CONTENT VERSION (`_mod`), bumped after every file mutation — append,
  // staged swap, tombstone fold, trash restore. Keying on the persisted
  // counter (not an in-memory flag) makes reuse safe across Executer
  // INSTANCES sharing a store (writer handoff, crash-recovery re-open):
  // a stale instance re-reads `_mod` (one tiny metadata read, orders of
  // magnitude cheaper than a listing) and rebuilds its plan. Within one
  // batch, plans captured BEFORE a mutation (e.g. the pre-append
  // `existing` snapshot in execute) hold their own file index by
  // reference and are deliberately unaffected — the bump only governs
  // what a NEW read sees. Pinned by StaleListingSpec.
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, DataFrame)]()

  /** Store content version; missing file reads as 0 (fresh store, or a
    * store written before versioning — first mutation creates it). */
  private def storeVersion(): Long =
    if (!exists(modPath)) 0L
    else {
      val in = new java.io.DataInputStream(stateFs.open(new Path(modPath)))
      try in.readLong() finally in.close()
    }

  /** Advance the content version. Called after every mutation of store
    * files, under the writer lease (so increments never race). */
  private def bumpStoreVersion(): Unit =
    writeLocalAtomic(modPath)(_.writeLong(storeVersion() + 1L))

  private def cachedRel(path: String, schema: StructType): DataFrame = {
    val v = storeVersion()
    val hit = relCache.get(path)
    if (hit != null && hit._1 == v) hit._2
    else {
      val df = spark.read.schema(schema).parquet(path)
      relCache.put(path, (v, df))
      df
    }
  }

  /** Plans keyed by (table path, snapshot identity) — a published
    * manifest's file list is immutable, so its plan never goes stale;
    * pending-generation plans are keyed by the model revision instead. */
  private val manifestRelCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def snapKey(s: Snapshot): String =
    if (pending eq s) s"p$pendingRev" else s"v${s.version}"

  /** The table relation under a resolved snapshot (manifest stores), or
    * the listing-based cached relation (legacy stores). Explicit file
    * list + basePath keeps partition-column derivation — and with it
    * partition pruning — identical to a directory read. */
  private def relFor(path: String, schema: StructType,
      snap: Option[Snapshot]): DataFrame = snap match {
    case Some(s) =>
      val table = new Path(path).getName
      val files = s.live.getOrElse(table, Vector.empty)
      val key = s"$path#${snapKey(s)}"
      val hit = manifestRelCache.get(key)
      if (hit != null) hit
      else {
        val df =
          if (files.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          else spark.read.schema(schema).option("basePath", path)
            .parquet(files.map(f => s"$storePath/$f"): _*)
        if (manifestRelCache.size > 64) manifestRelCache.clear()
        manifestRelCache.put(key, df)
        df
      }
    case None => cachedRel(path, schema)
  }

  private def readMapResults(): DataFrame = {
    // One snapshot resolution for BOTH the data files and the tombstone
    // overlay: resolving them separately could mix generations (old map
    // files + newer tombstones ⇒ docs transiently vanish).
    val snap = snapshotNow()
    applyTombstones(relFor(mapResultsPath, mapReadSchema, snap), snap)
      .select("parent", "bucket", "reduce_key", "doc_id", "seq", "payload")
  }

  private def readTree(): DataFrame =
    relFor(treePath, treeReadSchema, snapshotNow())

  private def readPartials(): DataFrame =
    readTree().where($"level" === 1)
      .select($"part" as "parent", $"reduce_key", $"payload")

  private def readFinals(): DataFrame =
    readTree().where($"level" === 2)
      .select($"part" as "fpart", $"reduce_key", $"payload")

  private def tagLevel1(partials: DataFrame): DataFrame =
    partials.select($"reduce_key", $"payload",
      lit(1) as "level", $"parent".cast("int") as "part")

  private def tagLevel2(finals: DataFrame): DataFrame =
    finals.select($"reduce_key", $"payload",
      lit(2) as "level", $"fpart".cast("int") as "part")

  /** Partition-level overwrite via a scratch staging dir: the rewritten
    * content of the affected partitions is fully materialized to staging
    * *before* the destination partitions are replaced, so we never
    * overwrite a Parquet path while a lazy plan is still reading it.
    *
    * NOT Spark's `partitionOverwriteMode=dynamic`: dynamic overwrite only
    * replaces partitions *present in the new data*, so a partition whose
    * rewritten content is EMPTY (last doc of a key deleted / remapped
    * away) would keep its stale files. Here the caller names the exact
    * partition set being rewritten; those directories are dropped and the
    * staged ones renamed in — an O(#partitions) metadata operation, no
    * data copy. A crash mid-swap is covered by the dirty-set WAL
    * (`recover()` re-runs the re-reduce; SURVEY.md §2.3.4). */
  /** Partitioned write that first clusters rows BY the partition column
    * (and sorts by reduce_key inside each cluster): each task then writes
    * only its own partition directories — file count stays O(#partition
    * values), not O(tasks × values) — and parquet row-group min/max stats
    * on reduce_key let key-filtered scans skip row groups. */
  private def writePartitioned(
      df: DataFrame, destPath: String, partitionCols: Seq[String],
      clustered: Boolean = false): Unit = {
    if (pending != null) {
      // Whole-table replacement, manifest spelling: stage + merge in, then
      // retire every previously-live file of the table (they stay on disk
      // for retained snapshots — a full rebuild over an existing store
      // must not physically overwrite what a reader may be scanning).
      val table = new Path(destPath).getName
      val newRels = stagedWriteIn(df, destPath, partitionCols, clustered)
      modelRetireTable(table)
      modelAddFiles(newRels)
      return
    }
    val pcols = partitionCols.map(col)
    val arranged =
      if (clustered) df.sortWithinPartitions(pcols :+ $"reduce_key": _*)
      else df.repartition(pcols: _*)
        .sortWithinPartitions(pcols :+ $"reduce_key": _*)
    arranged.write.partitionBy(partitionCols: _*).mode("overwrite")
      .parquet(destPath)
    bumpStoreVersion()
  }

  /** @param clustered pass true only when the input's task partitioning
    *   already clusters rows by the partition column (narrow
    *   filter-on-scan plans, or single-partition tiny-shuffle plans):
    *   then the repartition shuffle is skipped and each task writes the
    *   directories its rows already belong to. A plan with a join or a
    *   wide shuffle in it must keep the repartition, or every task
    *   writes a sliver of every directory (task-count × dir-count tiny
    *   files). */
  private def stageAndOverwrite(
      df: DataFrame, destPath: String, partitionCol: String,
      partitions: Seq[Int], clustered: Boolean = false): Unit =
    stageAndOverwriteDirs(df, destPath, Seq(partitionCol),
      partitions.map(p => s"$partitionCol=$p"), clustered)

  /** Both reduce levels in one staged write + swap (see `reduce_tree`
    * layout note in the class doc). */
  private def stageAndOverwriteTree(
      df: DataFrame, dirs: Seq[String], clustered: Boolean): Unit =
    stageAndOverwriteDirs(df, treePath, Seq("level", "part"), dirs, clustered)

  private def stageAndOverwriteDirs(
      df: DataFrame, destPath: String, partitionCols: Seq[String],
      dirs: Seq[String], clustered: Boolean): Unit = {
    if (pending != null) {
      // Manifest spelling of the partition swap: stage, merge the new
      // files in ADDITIVELY, retire (not move) the replaced directories'
      // previously-live files. No trash, no rename-aside window — a
      // reader's snapshot keeps resolving the retired files until GC.
      val table = new Path(destPath).getName
      val newRels = stagedWriteIn(df, destPath, partitionCols, clustered)
      dirs.foreach(d => modelRetireDir(s"$table/$d"))
      modelAddFiles(newRels)
      return
    }
    val staging = s"$destPath.staging"
    val pcols = partitionCols.map(col)
    val arranged =
      if (clustered) df.sortWithinPartitions(pcols :+ $"reduce_key": _*)
      else df.repartition(pcols: _*)
        .sortWithinPartitions(pcols :+ $"reduce_key": _*)
    arranged.write.partitionBy(partitionCols: _*).mode("overwrite")
      .parquet(staging)
    fs.mkdirs(new Path(destPath))
    // Swap the exact caller-named partition directories: stale content is
    // dropped even when the rewritten partition came out EMPTY (staging
    // has no dir for it), which dynamic partition overwrite cannot do.
    // The old content is RENAMED aside rather than deleted in place, so
    // the window in which a concurrent reader can observe a missing
    // directory is two O(1) metadata renames, not an O(files) recursive
    // delete; the trash (like `.staging`) is a sibling of the table path
    // and invisible to readers, deleted once after the swap. Leftover
    // trash from a previous crashed swap is restored first (not deleted
    // blindly — it may hold the only copy of a partition whose swap was
    // interrupted between the two renames).
    val trash = s"$destPath.trash"
    restoreFromTrash(destPath)
    dirs.foreach { d =>
      val dest = new Path(s"$destPath/$d")
      if (fs.exists(dest)) {
        val aside = new Path(s"$trash/$d")
        fs.mkdirs(aside.getParent)
        // A false rename aborts the swap loudly; the trash + WAL make
        // the partial state recoverable (restoreFromTrash + replay).
        renameOrFail(dest, aside)
      }
      val staged = new Path(s"$staging/$d")
      if (fs.exists(staged)) {
        fs.mkdirs(dest.getParent)
        renameOrFail(staged, dest)
      }
    }
    fs.delete(new Path(trash), true)
    fs.delete(new Path(staging), true)
    bumpStoreVersion()
  }

  /** Restore partition directories stranded by a crash inside a previous
    * swap: anything still under `<dest>.trash` whose destination is
    * missing is renamed back (recursively, so the nested `level=/part=`
    * layout restores at the deepest missing point). This closes the
    * crash window between "dest renamed aside" and "staged renamed in"
    * (ADVICE r3): without it a map_results parent partition could be
    * PERMANENTLY lost — map output is source state, not reconstructible
    * from the WAL. Restoring is safe for both swap users: a crashed
    * reduce_tree swap leaves the dirty WAL in place, so recovery
    * re-reduces and rewrites whatever was restored; a crashed tombstone
    * fold leaves the tombstone files in place, so restored stale rows
    * stay filtered at read time and the next fold re-drops them. Dirs
    * whose swap completed (destination present) are old content — left
    * in the trash and deleted with it. */
  private def restoreFromTrash(destPath: String): Unit = {
    val trash = new Path(s"$destPath.trash")
    if (!fs.exists(trash)) return
    def restore(src: org.apache.hadoop.fs.FileStatus, dest: Path): Unit = {
      if (!fs.exists(dest)) {
        fs.mkdirs(dest.getParent)
        // A failed restore rename must be loud — the trash may hold the
        // only copy of this partition.
        renameOrFail(src.getPath, dest)
      } else if (src.isDirectory) {
        // The destination exists. Partition-directory renames are atomic
        // and whole-dir, so an existing destination is COMPLETE — either
        // the swap for this partition finished (its trash copy is stale)
        // or it was never renamed aside (trash holds nothing for it).
        // Recurse only into nested partition DIRECTORIES (e.g.
        // `level=1/part=N` under a shared `level=1` parent); loose FILES
        // under an existing destination are always the stale pre-swap
        // copy and must be dropped with the trash, never merged — merging
        // would duplicate every live row of a completed swap (and the
        // fold/compact/delete swaps have no WAL that would ever repair
        // that).
        fs.listStatus(src.getPath).filter(_.isDirectory)
          .foreach(c => restore(c, new Path(dest, c.getPath.getName)))
      }
    }
    fs.listStatus(trash)
      .foreach(c => restore(c, new Path(destPath, c.getPath.getName)))
    fs.delete(trash, true)
    bumpStoreVersion()
    log.info(s"recovered stranded partition directories from $trash")
  }

  // ---------------------------------------------------------------------
  // Merge-on-read tombstones — the reference invalidates a changed doc by
  // deleting exactly its per-doc files (`Executer.cs:253-258`, cost ∝
  // changed docs). At parquet scale a physical per-doc delete would be a
  // partition rewrite (O(partition) write amplification — a 1-doc update
  // rewriting 1/fanIn of a 100 TB table). Instead, every map row carries
  // the `seq` of the batch that wrote it; invalidation WRITES a tombstone
  // (doc_id → batch seq, "rows of this doc older than seq are dead") and
  // APPENDS the new rows — write cost O(batch). Reads apply tombstones
  // with a broadcast join (zero plan change when none exist); compact()
  // folds them back into the data files, and execute() auto-folds past
  // `config.tombstoneLimit` entries so read overhead stays bounded.
  //
  // Two spellings, mirroring the dirty WAL: driver-known batches write a
  // single merged local file (one create+close, no Spark job); large
  // batches append the incoming-id set as parquet (one O(batch) job).
  // ---------------------------------------------------------------------

  private lazy val tombSchema = StructType(Seq(
    StructField("doc_id", StringType), StructField("tomb_seq", IntegerType)))

  private def currentSeq: Int =
    if (!exists(seqPath)) -1
    else {
      val in = new java.io.DataInputStream(stateFs.open(new Path(seqPath)))
      try in.readInt() finally in.close()
    }

  /** Monotonic batch sequence, persisted so it survives re-opens. The
    * write happens before any state mutation; a crash after the bump
    * burns a seq, which is harmless. */
  private def bumpSeq(): Int = {
    val n = currentSeq + 1
    writeLocalAtomic(seqPath)(_.writeInt(n))
    n
  }

  // Length-prefixed raw UTF-8 for USER-derived strings (document ids,
  // reduce keys) in the local binary records: `writeUTF` throws
  // UTFDataFormatException past 65535 modified-UTF-8 bytes, and a batch
  // carrying such a key would fail at archive time — after publish
  // (ADVICE r8). Manifest serialization keeps writeUTF: its strings are
  // store-relative file paths the engine itself generates, bounded by
  // construction.
  private def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }
  private def readStr(in: java.io.DataInputStream): String =
    Executer.decodeStr(in)

  private def readTombFile(path: String): Seq[(String, Int)] = {
    val in = new java.io.DataInputStream(stateFs.open(new Path(path)))
    try Executer.decodeTombFile(in) finally in.close()
  }

  private def readTombLocal(): Seq[(String, Int)] = readTombFile(tombLocalPath)

  /** The local tombstone entries of a snapshot (manifest: the immutable
    * versioned file the manifest references; legacy: tombstones.bin). */
  private def tombLocalEntries(snap: Option[Snapshot]): Seq[(String, Int)] =
    snap match {
      case Some(s) =>
        s.tombLocal.map(rel => readTombFile(s"$storePath/$rel")).getOrElse(Nil)
      case None => if (exists(tombLocalPath)) readTombLocal() else Nil
    }

  private def tombDistNonEmpty(snap: Option[Snapshot]): Boolean = snap match {
    case Some(s) => s.live.getOrElse("tombstones", Vector.empty).nonEmpty
    case None => exists(tombDistPath)
  }

  /** Merge new tombstones into the local state (newer seq wins — and the
    * incoming seq is always the largest yet). Rewriting the whole set is
    * O(entries); the auto-fold bound keeps that a few MB at most.
    * Manifest stores write a NEW immutable `_tomb/t<seq>.bin` and re-point
    * the pending generation at it (snapshot stability: a reader's resolved
    * manifest keeps referencing the previous file); legacy stores rewrite
    * `tombstones.bin` atomically in place. */
  private def addTombstonesLocal(ids: Seq[String], seq: Int): Unit = {
    val prev =
      if (pending != null) tombLocalEntries(Some(pending))
      else if (exists(tombLocalPath)) readTombLocal()
      else Nil
    val merged = prev.toMap ++ ids.map(_ -> seq)
    def writeTo(path: String): Unit = writeLocalAtomic(path) { out =>
      out.writeInt(merged.size)
      merged.foreach { case (k, s) => writeStr(out, k); out.writeInt(s) }
    }
    if (pending != null) {
      val rel = s"_tomb/t$seq.bin"
      writeTo(s"$storePath/$rel")
      modelSetTombLocal(Some(rel))
    } else writeTo(tombLocalPath)
  }

  /** The live tombstone set as (doc_id, tomb_seq), max-merged per doc;
    * None when empty (the common steady state after a fold). */
  private def tombstoneDF(snap: Option[Snapshot]): Option[DataFrame] = {
    val local = tombLocalEntries(snap)
    val hasDist = tombDistNonEmpty(snap)
    (local.nonEmpty, hasDist) match {
      case (false, false) => None
      case (true, false) => Some(local.toDF("doc_id", "tomb_seq"))
      case _ =>
        val dist = relFor(tombDistPath, tombSchema, snap)
        val all =
          if (local.isEmpty) dist
          else local.toDF("doc_id", "tomb_seq").unionByName(dist)
        Some(all.groupBy("doc_id").agg(max($"tomb_seq") as "tomb_seq"))
    }
  }

  /** A map row survives iff no tombstone for its doc is newer than the
    * batch that wrote it. Two spellings by live-set size:
    *
    *   - SMALL sets living only in the driver-local file (the steady
    *     state of a maintenance loop between folds): an exact predicate
    *     — `¬(doc_id ∈ ids(s) ∧ seq < s)` per distinct tombstone seq —
    *     instead of a join. A broadcast join here costs a broadcast-
    *     exchange job (+ its ~100ms driver round trip) per state read
    *     and deepens every downstream plan, which dominated the fixed
    *     cost of a 1-doc update; the predicate adds zero jobs and its
    *     `isin` pushes into the parquet scan. The local file is already
    *     max-merged per doc, so the predicate is exact, not heuristic.
    *   - Larger or distributed sets: broadcast join, broadcast-safe by
    *     construction — the set is bounded by `tombstoneLimit`
    *     (auto-fold), so the big map-side scan is never shuffled. */
  private val TombPredicateLimit = 512

  private def applyTombstones(df: DataFrame, snap: Option[Snapshot]): DataFrame = {
    val local = tombLocalEntries(snap)
    val hasDist = tombDistNonEmpty(snap)
    if (!hasDist && local.isEmpty) return df
    // One OR clause per distinct seq: cap the clause count too — a deep
    // Or-tree neither pushes down nor survives the analyzer's recursion
    // (same failure shape as the dirty-pair Or-tree, rereducePruned).
    if (!hasDist && local.size <= TombPredicateLimit &&
        local.iterator.map(_._2).toSet.size <= 16) {
      val dead = local.groupBy(_._2).toSeq.map { case (s, entries) =>
        $"doc_id".isin(entries.map(_._1): _*) && $"seq" < lit(s)
      }.reduce(_ || _)
      return df.where(!dead)
    }
    tombstoneDF(snap) match {
      case None => df
      case Some(t) =>
        df.join(broadcast(t), Seq("doc_id"), "left")
          .where($"tomb_seq".isNull || $"seq" >= $"tomb_seq")
          .drop("tomb_seq")
    }
  }

  /** EXACT entries in the live tombstone set, without a Spark job: the
    * local file stores its count in its header; the parquet part is
    * summed from file footers — driver-side metadata reads, no data
    * pages touched. (The previous bytes/20 estimate undercounted
    * dictionary/snappy-compressed files, which could let the live set
    * exceed `tombstoneLimit` without triggering the auto-fold that
    * keeps [[applyTombstones]] broadcastable — ADVICE r3.) Docs
    * re-tombstoned across batches count once per batch, which only
    * triggers the fold earlier — conservative in the right direction. */
  private def tombstoneEstimate(): Long = {
    val snap = snapshotNow()
    var n = 0L
    val localFile: Option[String] = snap match {
      case Some(s) => s.tombLocal.map(rel => s"$storePath/$rel")
      case None => Some(tombLocalPath).filter(exists)
    }
    localFile.foreach { p =>
      val in = new java.io.DataInputStream(stateFs.open(new Path(p)))
      try n += in.readInt() finally in.close()
    }
    val distFiles: Seq[Path] = snap match {
      case Some(s) => s.live.getOrElse("tombstones", Vector.empty)
        .map(rel => new Path(s"$storePath/$rel"))
      case None =>
        if (!exists(tombDistPath)) Nil
        else fs.listStatus(new Path(tombDistPath))
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath).toSeq
    }
    n + distFiles.map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          p, spark.sparkContext.hadoopConfiguration))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Fold tombstones into the data files: rewrite exactly the parent
    * partitions that hold tombstoned docs (a doc's parent is a pure
    * function of its id) with dead rows dropped, then clear the tombstone
    * state. Idempotent — a crash mid-fold leaves tombstones in place and
    * reads stay correct; a crash inside the partition swap itself is
    * repaired by [[restoreFromTrash]] on the next recover/execute (the
    * stranded directory is renamed back and its dead rows are still
    * filtered by the not-yet-cleared tombstones). Caller must hold the
    * lease. */
  private def foldTombstonesLocked(): Unit = {
    val snap = if (pending != null) Some(pending) else None
    val local = tombLocalEntries(snap)
    val hasLocal =
      if (pending != null) pending.tombLocal.isDefined else exists(tombLocalPath)
    val hasDist = tombDistNonEmpty(snap)
    if (!hasLocal && !hasDist) return
    val localParents = local.map(t =>
      StableBucketHash.hash(t._1, config.buckets) / config.fanIn)
    val distParents =
      if (hasDist)
        relFor(tombDistPath, tombSchema, snap)
          .select((StableBucketHash.stableBucket($"doc_id", config.buckets)
            / lit(config.fanIn)).cast("int") as "parent")
          .distinct().as[Int].collect().toSeq
      else Nil
    // A tombstone for a doc that never produced map rows has no partition
    // content to rewrite.
    val parents = (localParents ++ distParents).distinct.sorted.filter { p =>
      if (pending != null)
        pending.live.getOrElse("map_results", Vector.empty)
          .exists(_.startsWith(s"map_results/parent=$p/"))
      else exists(s"$mapResultsPath/parent=$p")
    }
    if (parents.nonEmpty) {
      val rows = readMapResults()
        .where($"parent".isin(parents.map(Integer.valueOf): _*))
      stageAndOverwrite(rows, mapResultsPath, "parent", parents)
      log.info(s"foldTombstones: rewrote ${parents.size} map partitions")
    }
    if (pending != null) {
      // Retire the tombstone state instead of deleting it: readers holding
      // a pre-fold snapshot still resolve the old tombstone files against
      // the old (dead-row-bearing) data files until GC.
      modelRetireTable("tombstones")
      modelSetTombLocal(None)
    } else {
      if (hasLocal) fs.delete(new Path(tombLocalPath), false)
      if (hasDist) fs.delete(new Path(tombDistPath), true)
      bumpStoreVersion()
    }
  }

  /** WAL for the dirty set — replaces the reference's `Schedules tree`
    * marker files (`Executer.cs:115-151`): written before state mutation,
    * cleared after the re-reduce completes.
    *
    * Two spellings: large dirty sets are written distributed as parquet;
    * small (driver-known) dirty sets are written directly to the store
    * filesystem ([[writeDirtyLogLocal]]) — a single create+close, no
    * Spark job, no commit protocol. */
  private def writeDirtyLog(dirty: DataFrame): Unit =
    dirty.write.mode("overwrite").parquet(dirtyPath)

  private val dirtyLocalPath = s"$storePath/dirty.pairs"

  private def writeDirtyLogLocal(pairs: Seq[(String, Int)]): Unit =
    writeLocalAtomic(dirtyLocalPath) { out =>
      out.writeInt(pairs.length)
      pairs.foreach { case (k, p) => writeStr(out, k); out.writeInt(p) }
    }

  private def readDirtyLogLocal(): Seq[(String, Int)] = {
    val in = new java.io.DataInputStream(stateFs.open(new Path(dirtyLocalPath)))
    try {
      val n = in.readInt()
      (0 until n).map(_ => (readStr(in), in.readInt()))
    } finally in.close()
  }

  private def readDirtyLog(): DataFrame = spark.read.parquet(dirtyPath)

  private def clearDirtyLog(): Unit = {
    // Publish BEFORE clearing the WAL (manifest stores): a crash between
    // the two replays an idempotent re-reduce of the just-published
    // state; clearing first would make a crash lose the batch's dirty
    // set while its data was already visible.
    // Whether this call actually lands a generation — a no-op batch
    // (nothing staged, nothing dirty) must NOT archive: pending.version
    // would still be the PREVIOUS generation and an empty record would
    // clobber its real one, silently under-reporting invalidations
    // (code-review r8).
    // Archive the WAL's key set as the ABOUT-to-publish generation's
    // changed-keys record ([[changedKeysSince]]) BEFORE the `_current`
    // flip (ADVICE r8): readers never query (since, cur] past the
    // published cur, so a pre-publish record for v+1 is invisible until
    // the flip — whereas archiving after the flip opened a crash window
    // where generation v's data was visible while changedKeysSince
    // reported an empty set for it (a consumer polling in that window
    // cached stale values until the recovery's next generation). A
    // crash BETWEEN archive and publish leaves an orphan record for an
    // unpublished version; the surviving WAL replays through recovery,
    // whose own pre-publish archive overwrites it for the version that
    // actually lands — never read meanwhile, never leaked.
    if (pending != null && pendingDirty) archiveChangedKeys()
    publishPending()
    if (exists(dirtyPath)) fs.delete(new Path(dirtyPath), true)
    if (exists(dirtyLocalPath)) fs.delete(new Path(dirtyLocalPath), false)
  }

  // ---- changed-keys (CDC invalidation) log --------------------------
  // One record per published generation that mutated logical state:
  // `changed/c<v>` (driver-known key list, single local write — no
  // Spark job on the small-update hot path) or `changed/v<v>` (parquet,
  // distributed dirty sets). The FullRebuild sentinel records the union
  // of the PRE-rebuild final keys (staged by the rebuild paths before
  // they overwrite state) and the post-rebuild final keys — the honest
  // invalidation set of a reprocess-everything batch.
  private val changedDirPath = s"$storePath/changed"
  private def changedLocalPath(v: Long) = s"$changedDirPath/c$v"
  private def changedDistPath(v: Long) = s"$changedDirPath/v$v"
  private val changedRebuildStaging = s"$changedDirPath/rebuild.staging"
  private val changedHorizonPath = s"$changedDirPath/_horizon"

  /** Stage the pre-rebuild final keys so the sentinel archive can name
    * keys the rebuild made DISAPPEAR. Called by the rebuild-fallback
    * branch before any mutation; a crashed rebuild leaves the staging
    * in place for the recovery replay's archive. */
  private def stageRebuildOldKeys(): Unit =
    if (exists(treePath))
      readFinals().select("reduce_key").distinct()
        .write.mode("overwrite").parquet(changedRebuildStaging)

  private def archiveChangedKeys(): Unit = {
    if (pending == null) return // legacy stores have no generations
    // Called BEFORE publishPending flips `_current` (see clearDirtyLog):
    // the record belongs to the version the publish is about to land.
    val v = pending.version + 1
    if (v < 0) return
    def sentinelRecord(): Unit = {
      val newKeys =
        if (exists(treePath)) readFinals().select("reduce_key").distinct()
        else spark.emptyDataFrame.withColumn("reduce_key", lit(""))
          .where(lit(false))
      val all =
        if (exists(changedRebuildStaging))
          newKeys.unionByName(
            spark.read.schema(newKeys.schema).parquet(changedRebuildStaging))
            .distinct()
        else newKeys
      all.write.mode("overwrite").parquet(changedDistPath(v))
      if (exists(changedRebuildStaging))
        fs.delete(new Path(changedRebuildStaging), true)
    }
    if (exists(dirtyLocalPath)) {
      val pairs = readDirtyLogLocal()
      if (pairs.exists(_._2 == FullRebuild)) sentinelRecord()
      else writeLocalAtomic(changedLocalPath(v)) { out =>
        val keys = pairs.map(_._1).distinct
        out.writeInt(keys.length); keys.foreach(writeStr(out, _))
      }
    } else if (exists(dirtyPath)) {
      val dirty = readDirtyLog()
      if (dirty.where($"parent" === FullRebuild).limit(1).count() > 0)
        sentinelRecord()
      else dirty.select($"reduce_key").distinct()
        .write.mode("overwrite").parquet(changedDistPath(v))
    }
  }

  private def readChangedLocal(v: Long): Seq[String] = {
    if (!exists(changedLocalPath(v))) return Nil
    val in = new java.io.DataInputStream(
      stateFs.open(new Path(changedLocalPath(v))))
    try Executer.decodeKeyList(in) finally in.close()
  }

  private def changedHorizon(): Long =
    if (!exists(changedHorizonPath)) -1L
    else {
      val in = new java.io.DataInputStream(
        stateFs.open(new Path(changedHorizonPath)))
      try in.readLong() finally in.close()
    }

  /** Crash recovery: if a dirty log survives from an interrupted execute,
    * re-run the re-reduce for it (idempotent — level-1 parents are rebuilt
    * from scratch, §2.3.3/§2.3.4 of SURVEY.md). A [[FullRebuild]]
    * sentinel replays the whole-build reduce. */
  /** Consolidate fragmented `map_results` partitions. The pure-insert
    * fast path appends one file per batch per touched partition (that is
    * what makes inserts O(batch) — no read-rewrite), so a long
    * append-mostly workload fragments the map table; reads stay correct
    * but pay per-file open costs and lose row-group-skip efficiency
    * (each small file is its own row group). `compact()` rewrites every
    * partition holding more than `maxFilesPerPartition` data files into
    * one file, through the same staged swap as incremental maintenance —
    * an offline ops utility (driver lists ≤ fanIn directories; the data
    * rewrite itself is a distributed job), safe to run between batches
    * under the writer lease. */
  /** Migrate the store to a different tree layout (fanIn / finalParts)
    * by rebuilding from the PERSISTED map output — the user map is never
    * re-run and the source corpus is never touched, which is the point:
    * at scale the map pass over source data dwarfs the re-reduce.
    *
    * Why this exists: the tree shape is a function of corpus size. A
    * 1-doc update re-reduces one whole parent group (sibling
    * recomputation, SURVEY §2.3.3) — O(corpus / fanIn) rows — so a store
    * that grows 100× eventually wants a wider fan-in, and the layout is
    * validated-immutable on an existing store (`configChecked`). This is
    * the supported migration path.
    *
    * Builds the destination NEXT TO the live store (a fresh directory;
    * refuses a non-empty one): the source stays readable and writable
    * throughout, and the caller re-points at the destination when it
    * returns — the online-backfill shape. Live rows are re-bucketed
    * under the new layout with tombstones applied en route, so the
    * destination starts tombstone-free; the batch-seq counter carries
    * over (rows keep their original `seq`, so a destination counter
    * restarting at 0 would write future tombstones that kill nothing).
    * Crash mid-reshape leaves the source untouched and the destination
    * with the standard full-rebuild WAL sentinel; wipe the destination
    * directory and re-run.
    */
  def reshapeTo(newStorePath: String, newConfig: ExecuterConfig,
      dstLease: Option[LeaseProvider] = None): Executer[D, R] = withLease {
    configChecked
    recoverLocked()
    require(exists(mapResultsPath),
      s"$storePath has no built store to reshape")
    // The destination gets its OWN lease (dstLease, or the default
    // atomic-create claim on the new path) — lease providers are bound
    // to one store's lease key, so sharing the source's instance would
    // both double-acquire the already-held source lease and release it
    // mid-reshape when the inner withLease unwinds.
    val dst = new Executer[D, R](task, newStorePath, newConfig, dstLease)
    require(!dst.exists(dst.mapResultsPath),
      s"reshape destination $newStorePath already holds a store")
    val rebucketed = readMapResults()
      .withColumn("bucket",
        StableBucketHash.stableBucket($"doc_id", newConfig.buckets))
      .withColumn("parent", ($"bucket" / lit(newConfig.fanIn)).cast("int"))
      .select("parent", "bucket", "reduce_key", "doc_id", "seq", "payload")
    val seqFloor = currentSeq
    dst.withLease {
      dst.configChecked
      if (seqFloor >= 0) dst.writeLocalAtomic(dst.seqPath)(_.writeInt(seqFloor))
      dst.writeDirtyLogLocal(Seq(("", dst.FullRebuild)))
      dst.writePartitioned(rebucketed, dst.mapResultsPath, Seq("parent"))
      dst.rereduceAll()
      dst.clearDirtyLog()
    }
    dst
  }

  def compact(maxFilesPerPartition: Int = 8): Unit = withLease {
    configChecked
    recoverLocked()
    // Fold tombstones first: dead rows are dropped from their partitions
    // and the merge-on-read join disappears from every subsequent read.
    foldTombstonesLocked()
    // Fragmentation is judged on LIVE files (manifest stores — retired
    // generations awaiting GC are not the read path's cost) or on the
    // directory listing (legacy stores).
    def liveDirCounts(table: String): Map[String, Int] =
      pending.live.getOrElse(table, Vector.empty)
        .groupBy(r => r.substring(0, r.lastIndexOf('/')))
        .map { case (d, files) => d.stripPrefix(s"$table/") -> files.size }
    val fragmentedMap: Seq[Int] =
      if (pending != null)
        liveDirCounts("map_results").collect {
          case (d, n) if d.startsWith("parent=") && n > maxFilesPerPartition =>
            d.stripPrefix("parent=").toInt
        }.toSeq.sorted
      else if (!exists(mapResultsPath)) Nil
      else fs.listStatus(new Path(mapResultsPath))
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("parent="))
        .filter(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >
          maxFilesPerPartition)
        .map(_.getPath.getName.stripPrefix("parent=").toInt).sorted.toSeq
    if (fragmentedMap.nonEmpty) {
      val rows = readMapResults()
        .where($"parent".isin(fragmentedMap.map(Integer.valueOf): _*))
      // repartition(col): one shuffle partition per parent value → one
      // consolidated file per directory.
      stageAndOverwrite(rows, mapResultsPath, "parent", fragmentedMap)
      log.info(s"compact: rewrote ${fragmentedMap.size} map partitions")
    }
    // The reduce tree: incremental writes swap whole (level, part)
    // directories, so fragmentation only appears if a wide write left
    // several task files in one directory; consolidate those too.
    val fragDirs: Seq[(Int, Int)] =
      if (pending != null)
        liveDirCounts("reduce_tree").collect {
          case (d, n) if n > maxFilesPerPartition &&
              d.matches("level=\\d+/part=-?\\d+") =>
            val Array(l, p) = d.split('/')
            (l.stripPrefix("level=").toInt, p.stripPrefix("part=").toInt)
        }.toSeq.sorted
      else if (!exists(treePath)) Nil
      else (1 to 2).flatMap { lvl =>
        val lvlPath = new Path(s"$treePath/level=$lvl")
        if (!fs.exists(lvlPath)) Nil
        else fs.listStatus(lvlPath)
          .filter(d => d.isDirectory && d.getPath.getName.startsWith("part="))
          .filter(d => fs.listStatus(d.getPath)
            .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >
            maxFilesPerPartition)
          .map(d => (lvl, d.getPath.getName.stripPrefix("part=").toInt)).toSeq
      }
    if (fragDirs.nonEmpty) {
      val cond = fragDirs.map { case (l, p) => $"level" === l && $"part" === p }
        .reduce(_ || _)
      stageAndOverwriteTree(
        readTree().where(cond),
        fragDirs.map { case (l, p) => s"level=$l/part=$p" },
        clustered = false)
      log.info(s"compact: rewrote ${fragDirs.size} tree partitions")
    }
    // compact() is the explicit space-reclamation hammer (SURVEY §14.4):
    // reclaim every retired generation NOW (ignoring retention/grace) and
    // sweep orphans a crashed batch may have merged in unpublished. A
    // reader still holding a pre-compact snapshot gets a retriable error,
    // the documented trade of running the hammer.
    if (pending != null) {
      publishPending() // land the fold/consolidation generation first
      if (pending.retired.nonEmpty) {
        pending.retired.foreach { r =>
          try fs.delete(new Path(s"$storePath/${r.path}"), false)
          catch { case _: java.io.IOException => () }
        }
        pending = pending.copy(retired = Vector.empty)
        pendingRev += 1; pendingDirty = true
        publishPending()
      }
      sweepOrphansLocked()
      // Prune changed-keys records past the retention window and advance
      // the horizon so changedKeysSince refuses (loudly) to answer for
      // baselines older than what survives — the same contract as
      // time-traveling to a GC'd generation.
      val cutoff = pending.version - config.manifestRetention
      if (cutoff > changedHorizon() && exists(changedDirPath)) {
        // Horizon BEFORE the deletes (code-review r8): a crash between
        // the two then refuses queries it could still have answered —
        // conservative — instead of silently reading pruned generations
        // as "no changes".
        writeLocalAtomic(changedHorizonPath)(_.writeLong(cutoff))
        fs.listStatus(new Path(changedDirPath)).foreach { st =>
          val name = st.getPath.getName
          val v = name.headOption match {
            case Some('c') | Some('v') =>
              try name.drop(1).toLong catch { case _: NumberFormatException => Long.MaxValue }
            case _ => Long.MaxValue
          }
          if (v <= cutoff) fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** Delete every on-disk data file the current manifest does not
    * reference (crashed-batch leftovers), stray staging dirs, old
    * manifest files, and the distributed-tombstone/_tomb dirs when empty.
    * Caller holds the lease and has just published a retired-free
    * generation, so live files are exactly the published set. */
  private def sweepOrphansLocked(): Unit = {
    val liveSet = pending.live.valuesIterator.flatten.toSet ++ pending.tombLocal
    def sweep(dirPath: String, table: String, ext: String): Unit = {
      val root = new Path(dirPath)
      if (!fs.exists(root)) return
      def walk(p: Path, rel: String): Unit = fs.listStatus(p).foreach { st =>
        val childRel =
          if (rel.isEmpty) st.getPath.getName else s"$rel/${st.getPath.getName}"
        if (st.isDirectory) walk(st.getPath, childRel)
        else if (st.getPath.getName.endsWith(ext) &&
            !liveSet.contains(s"$table/$childRel"))
          fs.delete(st.getPath, false)
      }
      walk(root, "")
    }
    sweep(mapResultsPath, "map_results", ".parquet")
    sweep(treePath, "reduce_tree", ".parquet")
    sweep(tombDistPath, "tombstones", ".parquet")
    sweep(tombDirPath, "_tomb", ".bin")
    Seq(s"$mapResultsPath.staging", s"$treePath.staging",
      s"$tombDistPath.staging").foreach { p =>
      if (exists(p)) fs.delete(new Path(p), true)
    }
    // Empty side dirs: delete so "is there tombstone state" stays
    // answerable by existence checks.
    Seq(tombDistPath, tombDirPath).foreach { p =>
      if (exists(p) && fs.listStatus(new Path(p)).isEmpty)
        fs.delete(new Path(p), true)
    }
    // Manifest files other than the current generation.
    if (exists(manifestsPath))
      fs.listStatus(new Path(manifestsPath)).foreach { st =>
        if (st.getPath.getName != s"m${pending.version}")
          fs.delete(st.getPath, false)
      }
  }

  /** Store-level operational stats — what an operator of a 100 TB
    * deployment watches between batches: per-table file counts and
    * bytes (fragmentation → "time to compact()"), live tombstone count
    * (merge-on-read read overhead), and pending recovery state. Driver
    * lists at most fanIn + 2·finalParts + 2 directories; no Spark job. */
  def storeStats(): Map[String, Long] = {
    val snap = snapshotNow()
    def dirStats(path: String, table: String): (Long, Long) = snap match {
      case Some(s) =>
        // Live files only — the read path's actual cost. Retired
        // generations awaiting GC are reported separately.
        val files = s.live.getOrElse(table, Vector.empty)
        (files.size.toLong, files.map { rel =>
          try fs.getFileStatus(new Path(s"$storePath/$rel")).getLen
          catch { case _: java.io.IOException => 0L }
        }.sum)
      case None =>
        if (!exists(path)) return (0L, 0L)
        def walk(p: Path): (Long, Long) =
          fs.listStatus(p).foldLeft((0L, 0L)) { case ((n, b), st) =>
            if (st.isDirectory) { val (cn, cb) = walk(st.getPath); (n + cn, b + cb) }
            else if (st.getPath.getName.endsWith(".parquet")) (n + 1, b + st.getLen)
            else (n, b)
          }
        walk(new Path(path))
    }
    val (mapFiles, mapBytes) = dirStats(mapResultsPath, "map_results")
    val (treeFiles, treeBytes) = dirStats(treePath, "reduce_tree")
    Map(
      "map_files" -> mapFiles, "map_bytes" -> mapBytes,
      "tree_files" -> treeFiles, "tree_bytes" -> treeBytes,
      "tombstones" -> tombstoneEstimate(),
      "retired_files" -> snap.map(_.retired.size.toLong).getOrElse(0L),
      "generation" -> readCurrentVersion(), // −1 on legacy stores
      "pending_dirty_pairs" -> pendingDirtyPairs())
  }

  /** Maintenance-state visibility (the reference's operators could watch
    * its Schedules tree; ours ask the index): false iff an interrupted
    * batch left a dirty WAL behind — [[recover]] would replay it. Reads
    * ([[query]]/[[queryAll]]) are always served from the last completed
    * reduce either way (`Executer.cs:370-377` semantics). */
  def isClean: Boolean = !exists(dirtyPath) && !exists(dirtyLocalPath)

  /** Number of (reduce key, parent partition) pairs a pending recovery
    * would re-reduce; 0 when [[isClean]]. */
  def pendingDirtyPairs(): Long =
    if (exists(dirtyLocalPath)) readDirtyLogLocal().size.toLong
    else if (exists(dirtyPath))
      readDirtyLog().select("reduce_key", "parent").distinct().count()
    else 0L

  def recover(): Unit = withLease {
    configChecked
    recoverLocked()
  }

  private def recoverLocked(): Unit = {
    // First (LEGACY stores only): put back any partition directory a
    // crashed swap left in a `.trash` sibling (see restoreFromTrash) —
    // folds have no WAL, so this is their entire recovery story, and the
    // WAL replay below must read a complete map_results table. Manifest
    // stores never rename live data aside: a crashed batch leaves only
    // orphan files the published manifest doesn't reference (compact()
    // sweeps them), so there is nothing to restore.
    if (pending == null) {
      restoreFromTrash(mapResultsPath)
      restoreFromTrash(treePath)
    }
    if (exists(dirtyLocalPath)) {
      // Small-update WAL: the exact dirty pairs, replayed through the
      // pruned path against whatever map_results state the crash left
      // (old, new, or partially swapped partitions — each partition is
      // internally consistent, and partials are rebuilt from scratch).
      // A FullRebuild sentinel (interrupted initial build) replays the
      // whole-build reduce instead.
      val pairs = readDirtyLogLocal()
      if (pairs.exists(_._2 == FullRebuild)) rereduceAll()
      else {
        val dirtyParents = pairs.map(_._2).distinct.sorted
        withTinyShuffle(1) {
          rereducePruned(pairs, readMapResults()
            .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*)))
        }
      }
      clearDirtyLog()
    } else if (exists(dirtyPath)) {
      val dirty = readDirtyLog()
      if (dirty.where($"parent" === FullRebuild).limit(1).count() > 0)
        rereduceAll()
      else rereduce(dirty.select("reduce_key", "parent").distinct())
      clearDirtyLog()
    }
  }
}
