package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap

/** Cross-RUN disk cache for the one-time shared-store builds
  * (VERDICT r9, What's missing #3): every SharedBuilds store is a
  * deterministic derivation of static testdata plus a fixed config, yet
  * each bench process rebuilt all of them from scratch — ~84s of the
  * driver's 240s budget in round 9, ahead of the query sweep it then
  * starved. The derived CORPORA were already cached across runs
  * (`Bench.cachedCorpus`); this extends the same mechanism — a source
  * fingerprint key, a process-private build dir, an atomic rename — to
  * whole store DIRECTORIES (an Executer store is self-contained on
  * disk: manifest + parquet, session-free by design).
  *
  * DISABLED by default and enabled only by Bench: the correctness gate
  * (Verify) must always exercise the real build path, never a disk
  * artifact a previous — possibly older — process wrote. Within Bench
  * the restore is honest by construction: restored builds are flagged
  * in the summary (`cached_builds`) and their near-zero restore times
  * never overwrite the committed cold-build costs.
  *
  * Staleness safety: the key folds in (a) a fingerprint of every
  * source parquet in the SF dir (names, sizes, mtimes — regenerated
  * testdata can never be served a stale store) and (b) a DERIVATION
  * VERSION bumped whenever any store-building code changes shape. A
  * forgotten bump can only skew bench timings, never correctness —
  * Verify does not read this cache.
  *
  * Restores COPY the cached directory into the caller's scratch path:
  * callers may mutate their stores (clones, update batches), and the
  * cache must stay pristine for the next run.
  */
private[graft] object StoreCache {
  /** Bump when any shared-store derivation changes its on-disk content:
    * task map/reduce logic, update batch shapes, or sync protocols. The
    * two mechanical staleness axes are folded in AUTOMATICALLY
    * (VERDICT r10 #6): the Executer's on-disk format version
    * ([[graft.core.Executer.FormatVersion]]) and each caller's store
    * config via the `extra` key — this constant covers only derivation
    * LOGIC, the axis no constant can derive. */
  private val version = 3 // r11: cdcbands meta is now the post-bootstrap generation

  /** The canonical `extra` key for an Executer-built store: task
    * identity + the config fields that shape on-disk content. Always
    * derive it from the ACTUAL objects handed to the Executer — a
    * hand-spelled twin string beside the config literal recreates
    * exactly the silent-staleness class this key exists to kill. */
  def keyOf(task: AnyRef, cfg: graft.core.ExecuterConfig): String = {
    // The task component must be the SAME identity the store guard
    // persists in _config (MapReduceTask.taskId): keying on the class
    // name alone would restore a cached store built by a differently-
    // parameterized instance of the same class (e.g. KgramFreqIndex
    // k=3 vs k=5), which the guard then rejects on every run until the
    // disk cache is wiped by hand.
    val id = task match {
      case t: graft.core.MapReduceTask[_, _] => t.taskId
      case other => other.getClass.getName
    }
    s"$id:fanIn=${cfg.fanIn}" +
      s":finalParts=${cfg.finalParts}:driverDirtyLimit=${cfg.driverDirtyLimit}"
  }

  @volatile private var on = false
  def enable(): Unit = on = true
  /** Test hygiene only: specs that exercise the cache restore the
    * disabled default so sibling suites keep the real build path. */
  def disable(): Unit = on = false
  def isEnabled: Boolean = on

  /** Tags restored from cache in this process — the bench's honesty
    * surface (summary `cached_builds`, costs-file exclusion). */
  private val restored = TrieMap.empty[String, Unit]
  def wasRestored(tag: String): Boolean = restored.contains(tag)

  private val fps = TrieMap.empty[String, String]
  private def fingerprint(sfDir: String): String =
    Memo.memo(fps, sfDir) {
      val root = Paths.get(sfDir)
      val parts = collection.mutable.ListBuffer[String]()
      if (Files.exists(root)) {
        val s = Files.walk(root)
        try s.sorted().forEach { p =>
          if (Files.isRegularFile(p))
            parts += s"${root.relativize(p)}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
        } finally s.close()
      }
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"v$version|fmt${graft.core.Executer.FormatVersion}|${parts.mkString("|")}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(6).map(b => f"$b%02x").mkString
    }

  private def cacheDir(tag: String, sfDir: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    s"${System.getProperty("java.io.tmpdir")}/graft-store-$tag-$sfName-${fingerprint(sfDir)}"
  }

  /** `extra` names the caller's store-shape inputs (config fanIn /
    * finalParts, task identity): its hash is stored INSIDE the entry
    * (`_GRAFT_EXTRA`) and validated on restore, so a config change
    * invalidates the entry without a manual version bump. Probes must
    * pass the SAME extra (SharedBuilds carries it as
    * `Build.cacheExtra`): a bare `isCached(tag, sf)` sees a stale
    * pre-layout-change entry as a hit that restore then rejects into
    * an unplanned cold build — the r15 under-planning bug. */
  private def extraHash(extra: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(extra.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString

  private def entryMatches(dir: String, extra: String): Boolean = {
    if (!Files.exists(Paths.get(dir, "_GRAFT_OK"))) return false
    if (extra.isEmpty) return true
    val f = Paths.get(dir, "_GRAFT_EXTRA")
    Files.exists(f) && new String(Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8).trim == extraHash(extra)
  }

  private def copyTree(src: String, dst: String): Unit = {
    val from = Paths.get(src)
    val to = Paths.get(dst)
    Files.createDirectories(to)
    val walk = Files.walk(from)
    try walk.forEach { p =>
      val target = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  private def deleteRec(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  def isCached(tag: String, sfDir: String, extra: String = ""): Boolean =
    on && entryMatches(cacheDir(tag, sfDir), extra)

  /** If a complete cache entry exists, copy its store into `dest` and
    * return its saved meta value; else None (caller builds into `dest`
    * and then calls [[save]]). Race-tolerant (ADVICE r10): a concurrent
    * process's [[save]] sweep can delete the entry mid-copy — clean the
    * partial dest and fall through to a cold build, never fail the run. */
  def restore(tag: String, sfDir: String, dest: String,
      extra: String = ""): Option[Long] = {
    if (!isCached(tag, sfDir, extra)) return None
    val dir = cacheDir(tag, sfDir)
    try {
      val meta = new String(
        Files.readAllBytes(Paths.get(dir, "_GRAFT_META")),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      copyTree(s"$dir/store", dest)
      restored.put(tag, ())
      Some(meta)
    } catch { case scala.util.control.NonFatal(_) =>
      // IO-shaped failures only: an OOM or interrupt must propagate,
      // not silently convert into a full cold rebuild.
      try deleteRec(dest) catch { case scala.util.control.NonFatal(_) => () }
      None
    }
  }

  /** Publish `src` (a just-built pristine store) as the cache entry for
    * `tag`: copy into a process-private dir, then atomic-rename into
    * place — two concurrent benches cannot interleave writes, and the
    * `_GRAFT_OK` marker is only present on complete entries. Saving
    * also sweeps SUPERSEDED entries of the same (tag, sf) under other
    * fingerprints/versions — regenerated testdata or a derivation bump
    * must not accumulate orphaned store copies in the temp dir
    * (the ADVICE-r4 hygiene contract, extended to this cache). */
  def save(tag: String, sfDir: String, src: String, meta: Long,
      extra: String = ""): Unit = {
    if (!on) return
    val dir = cacheDir(tag, sfDir)
    locally {
      val sfName = Paths.get(sfDir).getFileName.toString
      val parent = Paths.get(System.getProperty("java.io.tmpdir"))
      val prefix = s"graft-store-$tag-$sfName-"
      val me = Paths.get(dir).getFileName.toString
      val ls = Files.list(parent)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(prefix) && n != me && !n.contains(".tmp-"))
          try deleteRec(p.toString)
          catch { case scala.util.control.NonFatal(_) => () }
      } finally ls.close()
    }
    if (entryMatches(dir, extra)) return
    // An entry under the same fingerprint but a DIFFERENT extra (a store
    // config change) is stale: replace it.
    if (Files.exists(Paths.get(dir, "_GRAFT_OK")))
      try deleteRec(dir)
      catch { case scala.util.control.NonFatal(_) => return }
    val tmp = dir + ".tmp-" + ProcessHandle.current().pid()
    try {
      deleteRec(tmp)
      copyTree(src, s"$tmp/store")
      Files.write(Paths.get(tmp, "_GRAFT_META"),
        meta.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (extra.nonEmpty)
        Files.write(Paths.get(tmp, "_GRAFT_EXTRA"),
          extraHash(extra).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.write(Paths.get(tmp, "_GRAFT_OK"), Array.emptyByteArray)
      try Files.move(Paths.get(tmp), Paths.get(dir),
        StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        deleteRec(tmp) // lost a concurrent race; winner's entry is live
      }
    } catch { case scala.util.control.NonFatal(_) =>
      // Cache population is best-effort: a full disk or permission
      // error must never fail the build that just succeeded. (Fatals —
      // OOM, interrupts — still propagate.)
      deleteRec(tmp)
    }
  }

  /** Build-or-restore convenience used by the memoized store builders:
    * returns (meta, restoredFromCache). */
  def orBuild(tag: String, sfDir: String, dest: String, extra: String = "")(
      build: String => Long): (Long, Boolean) =
    restore(tag, sfDir, dest, extra) match {
      case Some(meta) => (meta, true)
      case None =>
        val meta = build(dest)
        save(tag, sfDir, dest, meta, extra)
        (meta, false)
    }
}
