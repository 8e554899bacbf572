package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core.{Executer, ExecuterConfig}
import graft.ops.IndexQueries

/** Diagnostic main: dump the EXECUTED physical plan of every write/agg
  * action a cold store build and a 1-doc update issue, via a
  * QueryExecutionListener — the engine's internal frames are not
  * reachable from outside, but their executed plans are. Used to commit
  * before/after plan evidence for the r15 build-path restructure.
  * Usage: `runMain graft.PlanDumpBuild <outFile>`.
  */
object PlanDumpBuild {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter(args.headOption.getOrElse("/tmp/plans.txt"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    @volatile var phase = "init"
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = out.synchronized {
        out.println(s"==== [$phase] action=$funcName ${durationNs / 1000000}ms ====")
        out.println(qe.executedPlan.toString.take(12000))
        out.println()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions.{max, struct}
    val corpusDir = graft.ops.TempStores.scratch("graft-pd-corpus")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(max(struct($"l_returnflag", $"l_linestatus", $"l_quantity")) as "v")
      .select($"l_orderkey", $"l_linenumber",
        $"v.l_returnflag", $"v.l_linestatus", $"v.l_quantity")
      .write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir).as[IndexQueries.LineitemDoc]

    val store = graft.ops.TempStores.scratch("graft-pd-store")
    val ex = new Executer(IndexQueries.LineitemByFlagStatus, store,
      ExecuterConfig(fanIn = 64, finalParts = 16, driverDirtyLimit = 16384))
    phase = "cold-build"
    ex.execute(docs)
    phase = "update-1doc"
    val oneDoc = docs.orderBy($"l_orderkey", $"l_linenumber").limit(1)
      .collect().toSeq.map(l => l.copy(l_quantity = l.l_quantity * 2))
    ex.execute(spark.createDataset(oneDoc))
    out.close()
    spark.stop()
  }
}
