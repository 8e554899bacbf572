package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.core.{Executer, ExecuterConfig}
import graft.ops.IndexQueries

/** Diagnostic main: where does a COLD store build's wall clock go?
  * Same job/gap breakdown as [[ProfileUpdate]], but for the initial
  * `execute` over a bench-shaped corpus (deduped lineitem, optionally
  * N×-replicated), with the corpus pre-materialized to parquet so the
  * derivation never pollutes the build's own jobs.
  * Usage: `runMain graft.ProfileBuild [sfDir [scaleN]]`.
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaleN = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    case class J(id: Int, submitted: Long, name: String, var ended: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val name = e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          .mkString(" | ").take(120)
        jobs.put(e.jobId, J(e.jobId, e.time, name))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.ended = e.time
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    import org.apache.spark.sql.functions.{max, struct}
    val corpusDir = graft.ops.TempStores.scratch("graft-pb-corpus")
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(max(struct($"l_returnflag", $"l_linestatus", $"l_quantity")) as "v")
      .select($"l_orderkey", $"l_linenumber",
        $"v.l_returnflag", $"v.l_linestatus", $"v.l_quantity")
      .as[IndexQueries.LineitemDoc]
    val scaled =
      if (scaleN <= 1) base
      else (0 until scaleN).map { i =>
        if (i == 0) base
        else base.map(l => l.copy(l_orderkey = l.l_orderkey + i * 1000000000L))
      }.reduce(_ union _)
    scaled.write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir).as[IndexQueries.LineitemDoc]
    println(s"corpus rows=${docs.count()} scale=$scaleN")

    // Warmup build into a throwaway store (pays committer/codegen
    // one-offs exactly like Bench's prewarm), then the measured build.
    locally {
      val warm = graft.ops.TempStores.scratch("graft-pb-warm")
      new Executer(IndexQueries.LineitemByFlagStatus, warm,
        ExecuterConfig(fanIn = 64, finalParts = 16))
        .execute(spark.createDataset(docs.limit(2500).collect().toSeq))
    }

    for (round <- 1 to 2) {
      val store = graft.ops.TempStores.scratch(s"graft-pb-store$round")
      val ex = new Executer(IndexQueries.LineitemByFlagStatus, store,
        ExecuterConfig(fanIn = 64, finalParts = 16,
          driverDirtyLimit = 16384))
      jobs.clear()
      val t0 = System.currentTimeMillis()
      ex.execute(docs)
      val total = System.currentTimeMillis() - t0
      val js = jobs.values().toArray(Array.empty[J]).sortBy(_.submitted)
      println(s"== build $round: total ${total}ms, ${js.length} jobs " +
        s"(stats: ${ex.lastStats})")
      var prevEnd = t0
      for (j <- js) {
        val gapBefore = j.submitted - prevEnd
        println(f"  job ${j.id}%3d: +${j.submitted - t0}%5dms gap=$gapBefore%4dms " +
          f"run=${j.ended - j.submitted}%4dms  ${j.name}")
        prevEnd = math.max(prevEnd, j.ended)
      }
      println(f"  tail after last job end: ${t0 + total - prevEnd}%dms")
    }
    spark.stop()
  }
}
