package graft.core

/** The user contract of the updatable persistent map/reduce index.
  *
  * Mirrors the reference's 4-method abstract task
  * (reference: `MapReduce/MapReduceTask.cs:6-15`):
  *
  *   - `map`: batch-at-a-time flat transform of documents into
  *     `(documentId, reduceEntry)` tuples; may emit 0..n entries per doc
  *     (`MapReduceTask.cs:8`).
  *   - `reduce`: associative aggregation `R* => R*` that MUST be
  *     re-reducible — applicable to its own output:
  *     `reduce(a ++ b) == reduce(reduce(a) ++ reduce(b))` up to set
  *     equality (`MapReduceTask.cs:10`; invoked at two tree levels,
  *     `Executer.cs:53,56,67`). This is exactly Spark's partial/final
  *     aggregation merge contract.
  *   - `reduceKey`: grouping key derived from a reduce entry, not from the
  *     document (`MapReduceTask.cs:12`).
  *   - `documentId`: the document primary key used for invalidation on
  *     update (`MapReduceTask.cs:14`). Document ids are case-insensitive
  *     (`Executer.cs:246-247,302`) — the engine normalizes them once at
  *     the boundary.
  *
  * @tparam D document (map input) type
  * @tparam R reduce entry type — one type serves as both reduce input and
  *           output ("re-reducible" closure property)
  */
trait MapReduceTask[D, R] extends Serializable {
  def map(docs: Iterator[D]): Iterator[(String, R)]
  def reduce(entries: Iterator[R]): Iterator[R]
  def reduceKey(entry: R): String
  def documentId(doc: D): String

  /** Declare that `reduce` emits EXACTLY ONE entry for any non-empty
    * input (the common grouped-aggregate shape, e.g. the reference's
    * sample `PeopleCountByState.cs:20-31`). The engine then runs both
    * reduce levels as a native Spark `Aggregator` — partial aggregation
    * with map-side combine, so only per-key partials cross the shuffle —
    * instead of materializing each group through `flatMapGroups`.
    * Leave false for multi-output reduces (e.g. identity/top-k per key),
    * which need the general `R* => R*` path. */
  def singleOutput: Boolean = false

  /** Declare that the reduce forms an ABELIAN GROUP, not just a
    * commutative semigroup: every entry has an inverse under the merge
    * ([[negate]]), and the group identity is recognizable ([[isZero]]).
    * Sum-shaped reduces (counts, totals, vector sums) qualify; min/max
    * and top-k do not (a retracted minimum is not recoverable by any
    * inverse — those stay on sibling recomputation, SURVEY §2.3.3).
    *
    * When true (requires [[singleOutput]]), the engine maintains the
    * reduce tree by DELTAS on updates: it reads only the incoming
    * documents' OLD map rows, negates them, merges `reduce(old⁻ ++ new)`
    * into the stored partials and finals, and drops rows that reach the
    * identity. Cost is O(batch + touched partials) — independent of how
    * many OTHER documents share the touched keys, which is the term
    * sibling recomputation pays (a hot shingle's group is the whole
    * corpus). This is a deliberate departure from the reference's
    * recompute-from-siblings contract (`Executer.cs:323-333`),
    * OPT-IN per task; crash recovery always replays the WAL through the
    * recompute path, which the group laws make equivalent — deltas are
    * a steady-state optimization, never the durability story. */
  def deltaReducible: Boolean = false

  /** Group inverse: `reduce(r ++ negate(r))` must be [[isZero]]. Only
    * called when [[deltaReducible]] is true. */
  def negate(entry: R): R =
    throw new UnsupportedOperationException("negate: not deltaReducible")

  /** Group identity test: true iff `entry` represents "no contributions"
    * — the engine drops such rows, matching the recompute semantics
    * where an empty group simply disappears. Only consulted when
    * [[deltaReducible]] is true. */
  def isZero(entry: R): Boolean = false

  /** Stable identity of this task's SEMANTICS, persisted in the store's
    * `_config` at first build and validated on every later open: a
    * store's map rows and reduce tree are meaningful only under the
    * task that wrote them, so opening (and especially UPDATING) a store
    * with a different task would silently mix two tasks' outputs in one
    * index. Defaults to the class name — stable for the named
    * `object`/class tasks real deployments use. Override to keep a
    * store openable across a rename/repackage of the task class (pin
    * the OLD spelling), or to force a rebuild when semantics change
    * inside the same class name (bump a suffix). Anonymous classes have
    * no stable identity, so the engine records but never enforces ids
    * containing `$$anon$` — test fixtures keep working, named
    * production tasks get the guard. */
  def taskId: String = getClass.getName
}
