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
    finalParts: Int = 64) {
  val buckets: Int = fanIn * fanIn
}

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
  *   - `reduce_partials/` partitioned by `parent` — replaces
  *     `ReduceResults/One/<key>/<levelBucket>/<seq>`.
  *   - `final_results/`   partitioned by `fpart` (= hash(key) mod
  *     finalParts) — replaces `FinalResults/<key>`.
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
    storePath: String,
    config: ExecuterConfig = ExecuterConfig())(implicit spark: SparkSession) {

  import spark.implicits._

  /** Sentinel `parent` value in the dirty WAL meaning "full rebuild". */
  private val FullRebuild = -1

  /** Above this many dirty (key, parent) pairs, incremental maintenance
    * switches from driver-side pruning (isin pushdown, zero extra jobs)
    * to the distributed join path. */
  private val DriverDirtyLimit = 1000

  implicit private val encR: Encoder[R] = Encoders.product[R]
  implicit private val encKR: Encoder[(String, String, R)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING, encR)

  private val mapResultsPath = s"$storePath/map_results"
  private val partialsPath = s"$storePath/reduce_partials"
  private val finalsPath = s"$storePath/final_results"
  private val dirtyPath = s"$storePath/dirty"

  private def fs: FileSystem =
    FileSystem.get(URI.create(storePath), spark.sparkContext.hadoopConfiguration)

  private def exists(path: String): Boolean = fs.exists(new Path(path))

  /** Document ids are case-insensitive (`Executer.cs:246-247,302`):
    * normalize once at the boundary. */
  private def normId(id: String): String = id.toUpperCase(java.util.Locale.ROOT)

  // ---------------------------------------------------------------------
  // Ingest / update — mirrors `Executer.Execute` (`Executer.cs:31-45`)
  // ---------------------------------------------------------------------

  /** One ingest-or-update batch: delete-and-invalidate prior contributions
    * of the incoming document ids (`Executer.cs:240-261`), persist new map
    * output, then incrementally re-reduce only the dirty subtrees. */
  def execute(docs: Dataset[D]): Unit = {
    val t = task // local val: closures must not capture `this`
    val mapped: DataFrame = docs
      .mapPartitions { it => t.map(it).map { case (id, r) => (id, t.reduceKey(r), r) } }
      .toDF("doc_id", "reduce_key", "payload")
      .withColumn("doc_id", upper($"doc_id"))
      .withColumn(
        "bucket",
        StableBucketHash.stableBucket($"doc_id", config.buckets))
      .withColumn("parent", $"bucket" / lit(config.fanIn) cast "int")
      .select("parent", "bucket", "reduce_key", "doc_id", "payload")

    // Incoming ids come from documentId over the *documents*, not from map
    // output: a doc that now maps to zero entries must still invalidate
    // its previous contributions (`Executer.cs:89-91`).
    val incomingIds = docs
      .map(d => t.documentId(d)).toDF("doc_id")
      .select(upper($"doc_id") as "doc_id").distinct()

    if (!exists(mapResultsPath)) {
      // Initial build fast path: everything is dirty, so skip the dirty
      // set entirely — no WAL round-trip, no semi-join pruning, no
      // staging renames (the partials/finals tables don't exist yet).
      // Crash safety: a one-row sentinel WAL marks "full rebuild
      // pending"; recover() re-runs rereduceAll for it.
      writePartitioned(mapped, mapResultsPath, "parent")
      writeDirtyLog(spark.createDataFrame(Seq(("", FullRebuild)))
        .toDF("reduce_key", "parent"))
      rereduceAll()
      clearDirtyLog()
    } else {
      // A document's bucket (hence `parent` partition) is a pure function
      // of its id — so every prior contribution of the incoming ids lives
      // in the parents of the incoming ids. Partition-prune the stale
      // lookup to those parents (≤ fanIn values collected): a k-doc
      // update scans O(k/fanIn of the table), never all of it. This
      // replaces the reference's per-doc directory lookup
      // (`Executer.cs:245-250`) with a pruned semi join.
      val incomingParents = incomingIds
        .select((StableBucketHash.stableBucket($"doc_id", config.buckets)
          / lit(config.fanIn)).cast("int") as "parent")
        .distinct().as[Int].collect().sorted
      val existing = readMapResults()
        .where($"parent".isin(incomingParents.map(Integer.valueOf): _*))
      // Prior contributions of incoming ids — across ALL reduce keys the
      // doc previously mapped to (`Executer.cs:253-258`). The dirty set
      // is written straight to the WAL and read back — the WAL parquet
      // doubles as the materialization barrier. The WAL carries a
      // provenance flag (pair seen on a stale row vs only on new map
      // output) so the driver can pick the append fast path below.
      val stale = existing.join(incomingIds, Seq("doc_id"), "left_semi")
      writeDirtyLog(
        stale.select($"reduce_key", $"parent", lit(true) as "is_stale")
          .union(mapped.select($"reduce_key", $"parent", lit(false) as "is_stale"))
          .distinct())

      val walProbe = readDirtyLog().limit(DriverDirtyLimit + 1).collect()
      if (walProbe.length <= DriverDirtyLimit) {
        // Small dirty set — the common incremental case. Everything is
        // derived driver-side from the probe: no further joins, distinct
        // jobs, or collects; downstream scans use pushed-down isin
        // filters (which parquet row-group stats can skip, thanks to the
        // reduce_key sort order of writePartitioned).
        val pairs = walProbe.map(r => (r.getString(0), r.getInt(1))).distinct.toSeq
        val anyStale = walProbe.exists(_.getBoolean(2))
        val dirtyParents = pairs.map(_._2).distinct.sorted

        if (!anyStale) {
          // Pure insert: nothing to invalidate — the new rows become
          // additional files in their partition directories. No
          // read-rewrite of existing state at all.
          mapped.repartition($"parent")
            .sortWithinPartitions($"parent", $"reduce_key")
            .write.partitionBy("parent").mode("append").parquet(mapResultsPath)
        } else {
          val ids = incomingIds.limit(DriverDirtyLimit + 1)
            .as[String].collect()
          val retained = existing
            .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
          val retainedMinusIncoming =
            if (ids.length <= DriverDirtyLimit)
              retained.where(!$"doc_id".isin(ids.toIndexedSeq: _*))
            else retained.join(incomingIds, Seq("doc_id"), "left_anti")
          stageAndOverwrite(
            retainedMinusIncoming.unionByName(mapped), mapResultsPath,
            "parent", dirtyParents)
        }
        rereducePruned(pairs)
      } else {
        // Large dirty set: distributed path (joins against the WAL).
        val dirty = readDirtyLog().select("reduce_key", "parent").distinct()
        val dirtyParents = dirty.select("parent").distinct()
          .as[Int].collect().sorted // ≤ fanIn values
        val retained = existing
          .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
          .join(incomingIds, Seq("doc_id"), "left_anti")
        stageAndOverwrite(
          retained.unionByName(mapped), mapResultsPath, "parent",
          dirtyParents.toSeq)
        rereduce(dirty)
      }
      clearDirtyLog()
    }
  }

  /** Driver-pruned incremental re-reduce for small dirty sets: the exact
    * (key, parent) pairs are known on the driver, so scans filter with
    * pushed-down predicates instead of joins. Semantics identical to
    * [[rereduce]] (sibling inclusion per parent, empty groups disappear,
    * finals rebuilt per dirty key). */
  private def rereducePruned(pairs: Seq[(String, Int)]): Unit = {
    if (pairs.isEmpty) return
    val dirtyParents = pairs.map(_._2).distinct.sorted
    val dirtyKeys = pairs.map(_._1).distinct.sorted
    def pairPred = pairs.map { case (k, p) =>
      $"reduce_key" === k && $"parent" === p
    }.reduce(_ || _)

    val level0 = readMapResults()
      .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .where(pairPred)
    val newPartials = reduceByKeyParent(level0)
      .select("parent", "reduce_key", "payload")
    val partialsOut =
      if (!exists(partialsPath)) newPartials
      else readPartials()
        .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
        .where(!pairPred)
        .unionByName(newPartials)
    stageAndOverwrite(partialsOut, partialsPath, "parent", dirtyParents)

    val level1 = readPartials()
      .where($"reduce_key".isin(dirtyKeys: _*))
    val newFinals = reduceByKey(level1)
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .select("fpart", "reduce_key", "payload")
    val dirtyFparts = dirtyKeys.map(fpartOf).distinct.sorted
    val finalsOut =
      if (!exists(finalsPath)) newFinals
      else readFinals()
        .where($"fpart".isin(dirtyFparts.map(Integer.valueOf): _*))
        .where(!$"reduce_key".isin(dirtyKeys: _*))
        .unionByName(newFinals)
    stageAndOverwrite(finalsOut, finalsPath, "fpart", dirtyFparts)
  }

  /** Incrementally rebuild level-1 partials for the dirty (key, parent)
    * pairs, then finals for the dirty keys — the reference's two-pass
    * reduce driver (`Executer.cs:37-43,47-85`) as two partition-pruned
    * groupBy passes. Dirty level-1 parents are rebuilt from scratch from
    * all their children (sibling inclusion, `Executer.cs:323-333`), never
    * diffed. */
  /** Full (re)build of both reduce levels from the whole map_results
    * table — the initial-build path, and crash recovery for it. */
  private def rereduceAll(): Unit = {
    val newPartials = reduceByKeyParent(readMapResults())
      .select("parent", "reduce_key", "payload")
    writePartitioned(newPartials, partialsPath, "parent")
    val newFinals = reduceByKey(readPartials())
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .select("fpart", "reduce_key", "payload")
    writePartitioned(newFinals, finalsPath, "fpart")
  }

  private def rereduce(dirty: DataFrame): Unit = {
    val dirtyParents = dirty.select("parent").distinct()
      .as[Int].collect().sorted
    if (dirtyParents.isEmpty) return

    // ---- level 0 → level 1: rebuild dirty (key, parent) partials -------
    val level0 = readMapResults()
      .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
      .join(dirty, Seq("reduce_key", "parent"), "left_semi")
    val newPartials = reduceByKeyParent(level0)
      .select("parent", "reduce_key", "payload")

    val partialsOut =
      if (!exists(partialsPath)) newPartials
      else {
        // Retain partials in the dirty parent partitions that belong to
        // (key, parent) pairs NOT being rebuilt; dirty pairs that produced
        // no output simply disappear (doc remapped away → empty group).
        val retained = readPartials()
          .where($"parent".isin(dirtyParents.map(Integer.valueOf): _*))
          .join(dirty, Seq("reduce_key", "parent"), "left_anti")
        retained.unionByName(newPartials)
      }
    stageAndOverwrite(partialsOut, partialsPath, "parent", dirtyParents.toSeq)

    // ---- level 1 → final: rebuild finals for dirty keys ----------------
    val dirtyKeys = dirty.select("reduce_key").distinct()
    val level1 = readPartials()
      .join(dirtyKeys, Seq("reduce_key"), "left_semi")
    val newFinals = reduceByKey(level1)
      .withColumn("fpart", pmod(hash($"reduce_key"), lit(config.finalParts)))
      .select("fpart", "reduce_key", "payload")

    val dirtyFparts = dirtyKeys
      .select(pmod(hash($"reduce_key"), lit(config.finalParts)) as "fpart")
      .distinct().as[Int].collect().sorted // ≤ finalParts values
    val finalsOut =
      if (!exists(finalsPath)) newFinals
      else {
        val retained = readFinals()
          .where($"fpart".isin(dirtyFparts.map(Integer.valueOf): _*))
          .join(dirtyKeys, Seq("reduce_key"), "left_anti")
        retained.unionByName(newFinals)
      }
    stageAndOverwrite(finalsOut, finalsPath, "fpart", dirtyFparts.toSeq)
  }

  /** Run the user's re-reducible `reduce` over each (key, parent) group.
    * General path: `flatMapGroups`, because the contract is `R* => R*`
    * (multi-output), which `Aggregator` cannot express
    * (`MapReduceTask.cs:10`). */
  private def reduceByKeyParent(df: DataFrame): DataFrame = {
    val t = task
    implicit val encIn: Encoder[(String, Int, R)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, encR)
    df.select($"reduce_key", $"parent", $"payload").as[(String, Int, R)]
      .groupByKey(x => (x._1, x._2))
      .flatMapGroups { (kp: (String, Int), rows: Iterator[(String, Int, R)]) =>
        t.reduce(rows.map(_._3)).map(r => (kp._1, kp._2, r))
      }
      .toDF("reduce_key", "parent", "payload")
  }

  private def reduceByKey(df: DataFrame): DataFrame = {
    val t = task
    implicit val encIn: Encoder[(String, R)] =
      Encoders.tuple(Encoders.STRING, encR)
    df.select($"reduce_key", $"payload").as[(String, R)]
      .groupByKey(_._1)
      .flatMapGroups { (k, rows) => t.reduce(rows.map(_._2)).map(r => (k, r)) }
      .toDF("reduce_key", "payload")
  }

  // ---------------------------------------------------------------------
  // Reads — mirror `Executer.Query` (`Executer.cs:370-377`)
  // ---------------------------------------------------------------------

  /** Final reduced values for one key; empty if absent
    * (`Executer.cs:373-375`). Prunes to a single `fpart` partition. */
  def query(key: String): Dataset[R] = {
    if (!exists(finalsPath)) return spark.emptyDataset[R]
    val f = readFinals()
    f.where($"fpart" === fpartOf(key) && $"reduce_key" === key)
      .select("payload.*").as[R]
  }

  /** The whole index as a DataFrame — strictly more capable than the
    * reference's point read: range scans, joins, further aggregation. */
  def queryAll(): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    if (!exists(finalsPath)) {
      val schema = StructType(
        StructField("reduce_key", StringType) +: encR.schema.fields)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
    readFinals().select($"reduce_key" +: encR.schema.fieldNames.toSeq
      .map(f => col(s"payload.$f")): _*)
  }

  /** Drop all stored state for one reduce key — the reference's public
    * utility `Delete` (`Executer.cs:222-238`). */
  def delete(key: String): Unit = {
    for ((path, part) <- Seq(
        (mapResultsPath, "parent"), (partialsPath, "parent"))) {
      if (exists(path)) {
        val t = spark.read.parquet(path)
        val parts = t.where($"reduce_key" === key)
          .select(part).distinct().as[Int].collect()
        if (parts.nonEmpty) {
          val kept = t.where(col(part).isin(parts.map(Integer.valueOf): _*))
            .where($"reduce_key" =!= key)
          stageAndOverwrite(kept, path, part, parts.toSeq)
        }
      }
    }
    if (exists(finalsPath)) {
      val kept = readFinals()
        .where($"fpart" === fpartOf(key)).where($"reduce_key" =!= key)
      stageAndOverwrite(kept, finalsPath, "fpart", Seq(fpartOf(key)))
    }
  }

  private def fpartOf(key: String): Int = {
    // Must agree with pmod(hash(reduce_key), finalParts) used on write.
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(key),
      org.apache.spark.sql.types.StringType, 42L).toInt
    val m = h % config.finalParts
    if (m < 0) m + config.finalParts else m
  }

  // ---------------------------------------------------------------------
  // Storage plumbing
  // ---------------------------------------------------------------------

  private def readMapResults(): DataFrame =
    spark.read.parquet(mapResultsPath)
      .select("parent", "bucket", "reduce_key", "doc_id", "payload")

  private def readPartials(): DataFrame =
    spark.read.parquet(partialsPath).select("parent", "reduce_key", "payload")

  private def readFinals(): DataFrame =
    spark.read.parquet(finalsPath).select("fpart", "reduce_key", "payload")

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
      df: DataFrame, destPath: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), $"reduce_key")
      .write.partitionBy(partitionCol).mode("overwrite").parquet(destPath)

  private def stageAndOverwrite(
      df: DataFrame, destPath: String, partitionCol: String,
      partitions: Seq[Int]): Unit = {
    val staging = s"$destPath.staging"
    writePartitioned(df, staging, partitionCol)
    fs.mkdirs(new Path(destPath))
    partitions.foreach { p =>
      fs.delete(new Path(s"$destPath/$partitionCol=$p"), true)
    }
    val stagedParts = fs.listStatus(new Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    stagedParts.foreach { s =>
      fs.rename(s.getPath, new Path(s"$destPath/${s.getPath.getName}"))
    }
    fs.delete(new Path(staging), true)
  }

  /** WAL for the dirty set — replaces the reference's `Schedules tree`
    * marker files (`Executer.cs:115-151`): written before state mutation,
    * cleared after the re-reduce completes. */
  private def writeDirtyLog(dirty: DataFrame): Unit =
    dirty.write.mode("overwrite").parquet(dirtyPath)

  private def readDirtyLog(): DataFrame = spark.read.parquet(dirtyPath)

  private def clearDirtyLog(): Unit =
    if (exists(dirtyPath)) fs.delete(new Path(dirtyPath), true)

  /** Crash recovery: if a dirty log survives from an interrupted execute,
    * re-run the re-reduce for it (idempotent — level-1 parents are rebuilt
    * from scratch, §2.3.3/§2.3.4 of SURVEY.md). A [[FullRebuild]]
    * sentinel replays the whole-build reduce. */
  def recover(): Unit =
    if (exists(dirtyPath)) {
      val dirty = readDirtyLog()
      if (dirty.where($"parent" === FullRebuild).limit(1).count() > 0)
        rereduceAll()
      else rereduce(dirty)
      clearDirtyLog()
    }
}
