package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.core.{Executer, ExecuterConfig}
import graft.ops.IndexQueries

/** Diagnostic main: where does a 1-doc incremental update's wall clock
  * go? Prints one line per Spark job (submit offset + duration) and the
  * gaps between jobs (driver-side work: planning, file listings, staged
  * renames) for a handful of updates against a bench-shaped store.
  * Usage: `runMain graft.ProfileUpdate [sfDir]`.
  */
object ProfileUpdate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
        val name = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          .linesIterator.next().take(70)
        jobs.put(e.jobId, J(e.jobId, e.time, name))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.ended = e.time
      }
    })

    // Dedupe to one version per (orderkey, linenumber) — the engine's
    // batch contract, same derivation as Bench's base corpus (the
    // synthetic lineitem carries duplicate pairs).
    val lineitem = {
      import org.apache.spark.sql.functions.{max, struct}
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy($"l_orderkey", $"l_linenumber")
        .agg(max(struct($"l_returnflag", $"l_linestatus", $"l_quantity")) as "v")
        .select($"l_orderkey", $"l_linenumber",
          $"v.l_returnflag", $"v.l_linestatus", $"v.l_quantity")
        .as[IndexQueries.LineitemDoc]
    }
    def batchOf(k: Int) = spark.createDataset(
      lineitem.orderBy($"l_orderkey", $"l_linenumber").limit(k)
        .map(l => l.copy(l_quantity = l.l_quantity * 2)).collect().toSeq)

    val store = graft.ops.TempStores.scratch("graft-profile")
    val ex = new Executer(IndexQueries.LineitemByFlagStatus, store,
      ExecuterConfig(fanIn = 64, finalParts = 16))
    ex.execute(lineitem)
    ex.execute(batchOf(1)) // warmups
    ex.execute(batchOf(1))

    // Poor-man's profiler: sample the main thread's stack during each
    // update so the inter-job gaps (driver-side planning/FS work) are
    // attributable to frames, not guessed at.
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          // First frame inside spark/graft that is not a generic wait.
          val key = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.spark.sql.execution") ||
              c.startsWith("org.apache.hadoop") ||
              c.startsWith("graft.")) && !c.contains("Profile")
          }.map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
            .getOrElse(st.headOption.map(f =>
              s"${f.getClassName.split('.').takeRight(1).mkString}.${f.getMethodName}").getOrElse("?"))
          samples.merge(key, 1, (a, b) => a + b)
        }
        Thread.sleep(10)
      }
    }, "gap-sampler")
    sampler.setDaemon(true)
    sampler.start()

    for (round <- 1 to 3) {
      val b = batchOf(1)
      jobs.clear()
      samples.clear()
      sampling = true
      val t0 = System.currentTimeMillis()
      ex.execute(b)
      sampling = false
      val total = System.currentTimeMillis() - t0
      locally {
        import scala.jdk.CollectionConverters._
        val top = samples.asScala.toSeq.sortBy(-_._2).take(12)
        top.foreach { case (k, n) => println(f"  ${n * 10}%5dms~ $k") }
      }
      val js = jobs.values().toArray(Array.empty[J]).sortBy(_.submitted)
      println(s"== update $round: total ${total}ms, ${js.length} jobs " +
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
