package graft.ops

/** Per-phase wall-clock instrumentation for the multi-leg maintained-
  * index pipelines. VERDICT r6 #2: q59b ran 86.9s driver-side vs
  * 12-16s in local runs, and nothing in the bench artifact said which
  * leg — the shared signature/pair rebuild, connected components, the
  * store build, or the ingest update — ate the difference, so the
  * anomaly was undiagnosable from the artifact alone. Bench installs a
  * sink that prints one JSON detail line per completed phase
  * (`{"q":"q59b","phase":"cluster_store_build","sec":…}`); outside
  * Bench the sink is null and a phase costs one volatile read.
  *
  * Phases attributed to `"shared"` are the memoized cross-query
  * artifacts (signature tables, LSH pairs, shingle frequencies): they
  * are built once per process by whichever query needs them first, so
  * their cost lines carry the query-independent attribution the
  * per-query sweep numbers can't express.
  */
object Phases {
  @volatile private var sink: String => Unit = null
  // Structured listener alongside the line sink: Bench records
  // (query, phase, sec) triples into the summary FILE's `phases` map
  // (VERDICT r8 #4 — a 29.6s driver entry must be decomposable from
  // the artifact alone, not just from whatever stdout tail survived).
  @volatile private var recorder: (String, String, Double) => Unit = null

  /** Install a detail-line sink (Bench passes `println`). */
  def enable(f: String => Unit): Unit = sink = f
  def enableRecorder(f: (String, String, Double) => Unit): Unit = recorder = f
  def disable(): Unit = { sink = null; recorder = null }

  private def emit(query: String, phase: String, sec: Double): Unit = {
    val s = sink
    if (s != null) s(f"""{"q":"$query","phase":"$phase","sec":$sec%.3f}""")
    val r = recorder
    if (r != null) r(query, phase, sec)
  }

  private[graft] def timed[T](query: String, phase: String)(body: => T): T = {
    if (sink == null && recorder == null) body
    else {
      val t0 = System.nanoTime()
      val r = body
      emit(query, phase, (System.nanoTime() - t0) / 1e9)
      r
    }
  }

  /** Time an engine mutation AND record which maintenance strategy the
    * engine chose (`MaintenanceStats.mode`: append / incremental-pruned /
    * incremental-distributed / rebuild-fallback / build) — the line that
    * tells a reader of the bench artifact whether an update leg ran the
    * O(dirty) path or crossed the cost-based rebuild threshold
    * (VERDICT r7 #2), without turning Spark logging on. */
  private[graft] def timedUpdate[D, R <: Product](query: String,
      ex: graft.core.Executer[D, R])(body: => Unit): Unit = {
    if (sink == null && recorder == null) body
    else {
      val t0 = System.nanoTime()
      body
      val mode = ex.lastStats.map(_.mode).getOrElse("?")
      emit(query, s"store_update:$mode", (System.nanoTime() - t0) / 1e9)
    }
  }
}
