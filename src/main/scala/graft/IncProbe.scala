package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.ops.IndexQueries
import graft.core.{Executer, ExecuterConfig}
object IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    val store = Files.createTempDirectory("graft-probe").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .as[IndexQueries.OrderDoc]
    val ex = new Executer(IndexQueries.OrdersByPriority, store,
      ExecuterConfig(fanIn = 64, finalParts = 16))
    def time(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    println("build: " + time { ex.execute(orders) } + " stats=" + ex.lastStats)
    // Use a job-group listener to see per-job times during 1-doc update
    val jobTimes = collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = collection.mutable.Map[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = System.currentTimeMillis()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobTimes += ((j.jobId, starts.getOrElse(j.jobId, 0L), System.currentTimeMillis()))
    })
    for (i <- 1 to 3) {
      jobTimes.clear()
      val oneDoc = orders.limit(1).collect().toSeq.map(o => o.copy(o_totalprice = o.o_totalprice * (1+i)))
      val t = time { ex.execute(spark.createDataset(oneDoc)) }
      Thread.sleep(200)
      println(f"update$i: $t%.3f stats=" + ex.lastStats)
      jobTimes.toSeq.sortBy(_._2).foreach { case (id, s, e) => println(f"  job $id: ${(e-s)/1000.0}%.3f s") }
    }
    spark.stop()
  }
}
