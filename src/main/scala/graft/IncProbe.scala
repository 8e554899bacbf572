package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.ops.IndexQueries
import graft.core.{Executer, ExecuterConfig}

/** Dev-only probe for the incremental-maintenance path: build (or
  * re-open) an IVM store and run 1-doc updates with a per-Spark-job
  * time breakdown, so regressions in the update's fixed job count /
  * per-job cost are attributable. Args: [storeDir [scaleN [fanIn]]] —
  * a storeDir that already exists is re-opened (skipping the build),
  * scaleN unions lineitem with itself N× under offset doc ids exactly
  * like Bench's scale probe.
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Reused across runs when passed explicitly; a fresh default store
    // registers for deletion at exit (round 6 temp hygiene).
    val store = args.headOption.getOrElse(
      graft.ops.TempStores.scratch("graft-probe"))
    val scaleN = args.lift(1).map(_.toInt).getOrElse(1)
    val fanIn = args.lift(2).map(_.toInt).getOrElse(64)
    val preBuilt = new java.io.File(store, "map_results").exists()
    // Dedupe to one version per (orderkey, linenumber) — the engine's
    // batch contract (the synthetic lineitem carries duplicate pairs;
    // same derivation as Bench's base corpus).
    val lineitem = {
      import org.apache.spark.sql.functions.{max, struct}
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy($"l_orderkey", $"l_linenumber")
        .agg(max(struct($"l_returnflag", $"l_linestatus", $"l_quantity")) as "v")
        .select($"l_orderkey", $"l_linenumber",
          $"v.l_returnflag", $"v.l_linestatus", $"v.l_quantity")
        .as[IndexQueries.LineitemDoc]
    }
    val docs =
      if (scaleN <= 1) lineitem
      else (0 until scaleN).map { i =>
        if (i == 0) lineitem
        else lineitem.map(l => l.copy(l_orderkey = l.l_orderkey + i * 1000000000L))
      }.reduce(_ union _)
    val ex = new Executer(IndexQueries.LineitemByFlagStatus, store,
      ExecuterConfig(fanIn = fanIn, finalParts = 16))
    def time(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    val jobTimes = collection.mutable.ArrayBuffer[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = collection.mutable.Map[Int, Long]()
      val descs = collection.mutable.Map[Int, String]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts(j.jobId) = System.currentTimeMillis()
        descs(j.jobId) = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct.mkString(" | ").take(160)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobTimes += ((j.jobId, starts.getOrElse(j.jobId, 0L),
          System.currentTimeMillis(), descs.getOrElse(j.jobId, "?")))
    })
    def dumpJobs(): Unit =
      jobTimes.toSeq.sortBy(_._2).foreach { case (id, s, e, d) =>
        println(f"  job $id: ${(e-s)/1000.0}%.3f s  $d") }
    if (!preBuilt) {
      jobTimes.clear()
      println(f"build(scale=$scaleN%d, fanIn=$fanIn%d): ${time { ex.execute(docs) }}%.1f s  store=$store")
      dumpJobs()
    } else println(s"re-opened $store")
    for (i <- 1 to 3) {
      jobTimes.clear()
      val oneDoc = lineitem.orderBy($"l_orderkey", $"l_linenumber").limit(1)
        .collect().toSeq.map(l => l.copy(l_quantity = l.l_quantity * (1 + i)))
      val t = time { ex.execute(spark.createDataset(oneDoc)) }
      Thread.sleep(200)
      println(f"update$i: $t%.3f s")
      dumpJobs()
    }
    spark.stop()
  }
}
