package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.{Executer, ExecuterConfig}
import graft.ops.IndexQueries.{OrderDoc, OrdersByPriority, PriorityBands}
import graft.streaming.CdcConsumer

/** Repro harness for the q106 driver-gate hash mismatch (VERDICT r9 #1):
  * runs the EXACT production CDC chain — OrdersByPriority build + %97
  * update, then the PriorityBands downstream synced through
  * [[CdcConsumer.syncOnce]] (since r11 the ONE spelling of the protocol,
  * the same code q106 gates) — in a loop with fresh stores per
  * iteration, comparing the downstream state to a from-scratch two-stage
  * recompute. Odd iterations poll via the refetch path, even ones via
  * the diffSince feed, so both consumer modes get hammered. The
  * divergence was driver-only (judge reproductions passed), so this
  * stresses the suspect path (the downstream's deltaReducible 5-doc
  * driver-local update) many times per JVM to surface a rare race.
  *
  * Usage: tools/run.sh graft.tools.CdcStress [iters] [sfDir]
  */
object CdcStress {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority",
        $"o_totalprice".cast("double") as "o_totalprice").as[OrderDoc]

    // The post-update document state the chain must equal (exact
    // decimal arithmetic, like the DuckDB oracle).
    val model: Map[String, (Long, Long, BigDecimal)] = {
      val post = orders.collect().toSeq.map { o =>
        if (o.o_orderkey % 97 == 0)
          OrderDoc(o.o_orderkey, "1-URGENT", o.o_totalprice * 2) else o
      }
      val pri = post.groupBy(_.o_orderpriority).map { case (p, os) =>
        (p, os.size.toLong, os.map(o => BigDecimal(o.o_totalprice)).sum)
      }.toSeq
      pri.groupBy(p => if (p._1 == "1-URGENT" || p._1 == "2-HIGH") "expedite"
                       else "standard")
        .map { case (b, ps) =>
          b -> ((ps.size.toLong, ps.map(_._2).sum, ps.map(_._3).sum))
        }
    }

    var failures = 0
    for (i <- 1 to iters) {
      val upDir = Files.createTempDirectory("graft-stress-up").toString
      val downDir = Files.createTempDirectory("graft-stress-down").toString
      try {
        val up = new Executer(OrdersByPriority, upDir,
          ExecuterConfig(fanIn = 64, finalParts = 16))
        up.execute(orders)
        val v0 = up.snapshotVersion()
        val updates = orders.filter(_.o_orderkey % 97 == 0)
          .map(o => OrderDoc(o.o_orderkey, "1-URGENT", o.o_totalprice * 2))
        up.execute(updates)

        // strict: an incremental-path regression must FAIL the iteration,
        // not be converged away by the resilient resync fallback.
        val consumer = new CdcConsumer(up, PriorityBands, downDir,
          ExecuterConfig(fanIn = 4, finalParts = 2), strict = true)
        consumer.syncOnce(bootstrapAt = Some(v0))
        consumer.syncOnce(viaDiff = i % 2 == 0)
        val down = consumer.executer
        val h = consumer.health
        require(h.fallbackResyncCount == 0 && h.resyncCount == 1 && h.lag == 0,
          s"ITER $i: unexpected consumer health $h (want bootstrap-only resync, zero fallbacks, caught up)")

        val got = down.queryAll()
          .select($"reduce_key", $"npriorities", $"cnt", $"total")
          .as[(String, Long, Long, BigDecimal)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        val ok = got.keySet == model.keySet && model.forall { case (k, m) =>
          val g = got(k)
          g._1 == m._1 && g._2 == m._2 && (g._3 compare m._3) == 0
        }
        if (!ok) {
          failures += 1
          println(s"ITER $i FAIL")
          println(s"  got   = ${got.toSeq.sortBy(_._1)}")
          println(s"  model = ${model.toSeq.sortBy(_._1)}")
        } else println(s"ITER $i ok")
      } finally {
        def rm(d: String): Unit = {
          val s = Files.walk(java.nio.file.Paths.get(d))
          try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => Files.deleteIfExists(p))
          finally s.close()
        }
        rm(upDir); rm(downDir)
      }
    }
    println(s"DONE failures=$failures/$iters")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
