package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Executer

/** Lock-free external reads of a PUBLISHED store generation — the
  * recipe any vanilla Spark job (or SQL client via [[registerView]])
  * can run without constructing an [[graft.core.Executer]], taking a
  * lease, or coordinating with the writer. Before this, a reader fleet
  * had to link the engine and construct an `Executer` per store; now a
  * plain `spark.read` client consumes a maintained index like any other
  * parquet dataset, at a consistent snapshot, while the owning process
  * keeps churning.
  *
  * Protocol (SURVEY §14): resolve `_current` → `_manifests/m<v>` → the
  * exact live file list of `reduce_tree` level=2 (the final results).
  * Data files are immutable and never change path, so the resolved plan
  * stays valid no matter how many mutations land after it — the same
  * contract the engine's own snapshot readers rely on. The manifest
  * wire format is decoded by [[graft.core.Executer.decodeManifest]],
  * the ONE codec shared with the engine, so reader and writer cannot
  * drift. GC keeps a replaced file for `manifestRetention` generations
  * AND `manifestGraceMs` after retirement, so a plan resolved from the
  * current generation has at least that long to be consumed; a
  * long-lived client re-resolves (or re-registers its view) to follow
  * the head.
  *
  * Deliberately reads FINAL RESULTS only — the reference's whole query
  * surface (`MapReduce/Executer.cs:370-377`): the map-level tables need
  * the tombstone overlay, which is engine logic; a client that wants
  * provenance links the engine.
  *
  * Legacy (pre-manifest, listing+seqlock) stores are refused loudly:
  * their partition-swap protocol requires the seqlock retry loop that
  * only the engine implements; `Executer.reshapeTo` migrates them.
  */
object StoreReader {
  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def emptyFinals(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("reduce_key", StringType))))

  private def readCurrent(fs: FileSystem, root: Path): Long = {
    val cur = new Path(root, "_current")
    if (!fs.exists(cur)) -1L
    else {
      val in = new java.io.DataInputStream(fs.open(cur))
      try in.readLong() finally in.close()
    }
  }

  /** The store's current published generation, or -1 when none (a
    * never-ingested store, or a legacy listing-based one). */
  def currentVersion(spark: SparkSession, storePath: String): Long = {
    val (fs, root) = fsFor(spark, storePath)
    readCurrent(fs, root)
  }

  /** The generation's live file lists, store-relative: (level-2
    * finals, schema-salvage candidates) — the salvage list backs a
    * generation whose finals came out EMPTY (keys deleted): level-1
    * partials and map_results rows both carry the finals' (reduce_key,
    * payload) column pair. None when the store has no published
    * generation (fresh: reads empty; legacy: refused loudly). */
  private def liveTreeFiles(fs: FileSystem, root: Path, storePath: String,
      version: Long): Option[(Vector[String], Vector[String])] = {
    val v = if (version >= 0L) version else readCurrent(fs, root)
    if (v < 0L) {
      if (fs.exists(new Path(root, "map_results")))
        throw new UnsupportedOperationException(
          s"$storePath is a legacy (listing-based) store with no published " +
            "generations; external lock-free reads need a manifest store " +
            "(Executer.reshapeTo migrates)")
      // Fresh store, nothing ever ingested: empty results, key column
      // only — the payload schema lives in the engine's task type, which
      // an external reader deliberately does not know.
      None
    } else {
      val in = new java.io.DataInputStream(
        fs.open(new Path(root, s"_manifests/m$v")))
      val snap = try Executer.decodeManifest(in) finally in.close()
      val tree = snap.live.getOrElse("reduce_tree", Vector.empty)
      val salvage =
        if (tree.nonEmpty) tree
        else snap.live.getOrElse("map_results", Vector.empty)
      Some((tree.filter(_.startsWith("reduce_tree/level=2/")), salvage))
    }
  }

  private def readFiles(spark: SparkSession, root: Path,
      files: Vector[String]): DataFrame =
    spark.read
      .option("basePath", new Path(root, "reduce_tree").toString)
      .parquet(files.map(f => new Path(root, f).toString): _*)
      .select(col("reduce_key"), col("payload.*"))

  /** EMPTY results with the engine's queryAll column layout, inferred
    * from any live salvage file — level-1 partials and map_results rows
    * both carry the (reduce_key, payload) pair — at `limit(0)` footer
    * cost. A FULLY drained generation (every key deleted, so neither
    * table holds a live file) degrades to the key-only frame: the
    * payload schema exists nowhere on disk an external reader may
    * trust, only in the engine's task type. */
  private def emptyWithSchema(spark: SparkSession, root: Path,
      salvage: Vector[String]): DataFrame =
    if (salvage.isEmpty) emptyFinals(spark)
    else spark.read
      .option("basePath",
        new Path(root, Executer.tableOf(salvage.head)).toString)
      .parquet(salvage.map(f => new Path(root, f).toString): _*)
      .select(col("reduce_key"), col("payload.*"))
      .limit(0)

  /** The final results ([[graft.core.Executer]]`.queryAll`'s shape:
    * `reduce_key` + the reduce output's columns) at `version`,
    * defaulting to the current generation. The returned plan is PINNED
    * to that generation's immutable file list — concurrent writer
    * mutations never tear or shift it, and no lease or lock is taken. */
  def finals(spark: SparkSession, storePath: String,
      version: Long = -1L): DataFrame = {
    val (fs, root) = fsFor(spark, storePath)
    liveTreeFiles(fs, root, storePath, version) match {
      case Some((files, _)) if files.nonEmpty => readFiles(spark, root, files)
      case Some((_, tree)) => emptyWithSchema(spark, root, tree)
      case None => emptyFinals(spark)
    }
  }

  /** One key's final value — the reference's entire query surface
    * (`MapReduce/Executer.cs:370-377`) as an engine-free read that
    * prunes EXACTLY like the engine's own `query`: the key's partition
    * comes from the shared hash ([[graft.core.Executer.fpartHash]])
    * with `finalParts` read from the store's persisted `_config`, and
    * only that partition's files enter the plan — 1/finalParts of the
    * table scanned at any store size, row-group stats pruning the rest.
    * A store predating `_config` falls back to the full file list
    * (still correct, just unpruned). */
  def pointQuery(spark: SparkSession, storePath: String, key: String,
      version: Long = -1L): DataFrame = {
    val (fs, root) = fsFor(spark, storePath)
    liveTreeFiles(fs, root, storePath, version) match {
      case Some((files, _)) if files.nonEmpty =>
        val cfg = new Path(root, "_config")
        val pruned =
          if (!fs.exists(cfg)) files
          else {
            val in = new java.io.DataInputStream(fs.open(cfg))
            val finalParts = try { in.readInt(); in.readInt() }
              finally in.close()
            val fpart = Executer.fpartHash(key, finalParts)
            files.filter(_.startsWith(s"reduce_tree/level=2/part=$fpart/"))
          }
        // An empty pruned list means the key's partition holds no files
        // (provably no rows) — still read via the full list so the
        // result keeps the payload schema; the key filter returns the
        // empty set through row-group stats without a full scan.
        val src = if (pruned.nonEmpty) pruned else files
        readFiles(spark, root, src).where(col("reduce_key") === key)
      case Some((_, tree)) =>
        emptyWithSchema(spark, root, tree).where(col("reduce_key") === key)
      case None => emptyFinals(spark)
    }
  }

  /** Several keys' final values in one pruned scan — the multi-key
    * generalization of [[pointQuery]] (the engine's `queryKeys`): the
    * plan reads at most |distinct fparts of keys| ≤ |keys| of the
    * finalParts partitions. Rows interleave across keys; the
    * `reduce_key` column disambiguates, absent keys contribute none. */
  def keysQuery(spark: SparkSession, storePath: String, keys: Seq[String],
      version: Long = -1L): DataFrame = {
    val (fs, root) = fsFor(spark, storePath)
    liveTreeFiles(fs, root, storePath, version) match {
      case Some((files, _)) if files.nonEmpty && keys.nonEmpty =>
        val cfg = new Path(root, "_config")
        val pruned =
          if (!fs.exists(cfg)) files
          else {
            val in = new java.io.DataInputStream(fs.open(cfg))
            val finalParts = try { in.readInt(); in.readInt() }
              finally in.close()
            val fparts = keys.map(Executer.fpartHash(_, finalParts)).toSet
            files.filter(f => fparts.exists(p =>
              f.startsWith(s"reduce_tree/level=2/part=$p/")))
          }
        val src = if (pruned.nonEmpty) pruned else files
        readFiles(spark, root, src)
          .where(col("reduce_key").isin(keys: _*))
      case Some((_, tree)) =>
        emptyWithSchema(spark, root, tree)
      case None => emptyFinals(spark)
    }
  }

  /** [[finals]] as a named temp view for SQL-only clients — pinned at
    * registration to ONE generation (a temp view captures the plan and
    * with it the file list); re-register to follow the head. */
  def registerView(spark: SparkSession, storePath: String, name: String,
      version: Long = -1L): Unit =
    finals(spark, storePath, version).createOrReplaceTempView(name)
}
