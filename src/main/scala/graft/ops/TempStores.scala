package graft.ops

import java.nio.file.{Files, Path, Paths}

/** Process-scoped scratch directories for the ops-level index stores.
  *
  * The index-update queries (q29/q37/q64/q77/q89/q91/q97, the cached
  * read-only stores, the CSV/JSON export round-trips) each materialize
  * an Executer store or export under a temp directory. Deleting it
  * inside the query body would break the contract that the RETURNED
  * DataFrame stays readable (the driver materializes it after the
  * function returns), so cleanup happens at JVM exit instead: every
  * directory created here is registered and recursively deleted by one
  * shutdown hook. A full Verify + Bench sweep therefore strands nothing
  * in /tmp (VERDICT r5 #3 — each sweep leaked several GB of sf0.1
  * map_results/reduce_tree parquet across 14 sites).
  */
private[graft] object TempStores {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Create and register a scratch directory deleted at JVM exit. */
  def scratch(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString
    created.add(dir)
    dir
  }

  /** Recursively copy an existing store into a fresh scratch directory
    * (registered for exit cleanup like every scratch) — the cheap way
    * for a query to mutate a PRIVATE copy of a shared store without
    * perturbing the shared one's semantics. */
  def cloneOf(src: String, prefix: String): String = {
    val dst = scratch(prefix)
    val from = Paths.get(src)
    val to = Paths.get(dst)
    val walk = Files.walk(from)
    try walk.forEach { p =>
      val target = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    dst
  }

  private def deleteRec(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  // Plain Runtime hook (not Spark's ShutdownHookManager): runs during
  // JVM teardown when no query can still be materializing; per-path
  // failures are swallowed — cleanup must never mask a real exit cause.
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { d =>
      try deleteRec(d) catch { case _: Throwable => () }
    }
  }, "graft-tempstore-cleanup"))
}
