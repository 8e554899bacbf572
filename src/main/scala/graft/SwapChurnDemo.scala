package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Executer, ExecuterConfig}
import graft.GoldenDemo.{Person, StatePop, PeopleCountByState}

/** Cross-PROCESS validation of the reader-swap epoch contract (round
  * 6): ReaderSwapSpec runs reader and writer in one JVM (two
  * SparkSessions); this main runs them as two real processes sharing
  * only the store directory.
  *
  *   tools/run.sh graft.SwapChurnDemo writer /tmp/swapdemo 20   # churn
  *   tools/run.sh graft.SwapChurnDemo reader /tmp/swapdemo 20   # loop
  *   tools/run.sh graft.SwapChurnDemo external /tmp/swapdemo 20 # no engine
  *   tools/run.sh graft.SwapChurnDemo follow /tmp/swapdemo 20   # ext. CDC
  *
  * The writer builds 240 docs and then churns update batches that move
  * 60 docs between CA and TX for ~N seconds; moves conserve the total,
  * so the reader detects any torn read as a wrong total. The reader
  * prints one line per read: `ok total=240` or `RETRIABLE <error>`;
  * it must NEVER print `TORN`. Exit code 1 on any torn read.
  *
  * `external` (round 14) is the same invariant loop WITHOUT the engine:
  * it reads through [[graft.sources.StoreReader]] — the public
  * lock-free recipe a vanilla Spark client runs (`_current` → manifest
  * → pinned parquet file list) — so a torn or erroring read here would
  * falsify the external-reader contract, not just the engine's own
  * snapshot path. Manifest stores only (it skips until the writer
  * publishes generation 0).
  *
  * `follow` (round 15) is the engine-free CDC CONSUMER: a local cache
  * maintained purely through `changedKeysSince` + generation-pinned
  * `keysQuery`, compared bit-for-bit against a full external read of
  * the same generation after every sync — the cross-process proof that
  * the external invalidation feed is COMPLETE, not just that single
  * reads are untorn. Exit 1 on any `DESYNC` (or zero syncs).
  */
object SwapChurnDemo {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val store = args(1)
    val seconds = args.lift(2).map(_.toInt).getOrElse(20)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-swapchurn-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val N = 240
    def person(i: Int, flip: Boolean): Person =
      Person(s"p-$i", if ((i % 2 == 0) ^ flip) "CA" else "TX")
    // Lazy: the `external` mode must not construct an engine handle at
    // all — proving the recipe needs nothing but the store directory.
    lazy val ex = new Executer(PeopleCountByState, store,
      ExecuterConfig(fanIn = 4, finalParts = 2))
    val deadline = System.nanoTime() + seconds * 1000000000L

    mode match {
      case "writer" =>
        ex.execute(spark.createDataset((1 to N).map(person(_, flip = false))))
        println(s"writer: built $N docs, churning ${seconds}s")
        var round = 0
        while (System.nanoTime() < deadline) {
          round += 1
          val batch = (1 to 60).map(i => person(i * 4 % N + 1, round % 2 == 1))
            .distinctBy(_.id)
          ex.execute(spark.createDataset(batch))
          Thread.sleep(100)
        }
        println(s"writer: done after $round rounds")
      case "reader" =>
        var good = 0; var retriable = 0; var torn = 0
        while (System.nanoTime() < deadline) {
          try {
            val total = ex.queryAll().select("count")
              .collect().map(_.getLong(0)).sum
            if (total == N) { good += 1; println(s"ok total=$total") }
            else if (total == 0) { retriable += 1 } // store not built yet
            else { torn += 1; println(s"TORN total=$total != $N") }
          } catch {
            case e: Throwable =>
              retriable += 1
              println(s"RETRIABLE ${e.getClass.getSimpleName}")
          }
        }
        println(s"reader: good=$good retriable=$retriable torn=$torn")
        spark.stop()
        if (torn > 0 || good == 0) sys.exit(1)
      case "external" =>
        // The engine-free client: no Executer, no lease — only the
        // published-generation recipe. Each loop resolves the head anew
        // (a long-lived client following a churning store), so it reads
        // a DIFFERENT pinned generation most iterations.
        var good = 0; var retriable = 0; var torn = 0
        while (System.nanoTime() < deadline) {
          try {
            if (graft.sources.StoreReader.currentVersion(spark, store) < 0) {
              retriable += 1 // writer has not published generation 0 yet
              Thread.sleep(50)
            } else {
              val total = graft.sources.StoreReader.finals(spark, store)
                .select("count").collect().map(_.getLong(0)).sum
              if (total == N) { good += 1; println(s"ok total=$total") }
              else { torn += 1; println(s"TORN total=$total != $N") }
            }
          } catch {
            case e: Throwable =>
              retriable += 1
              println(s"RETRIABLE ${e.getClass.getSimpleName}")
          }
        }
        println(s"external: good=$good retriable=$retriable torn=$torn")
        spark.stop()
        if (torn > 0 || good == 0) sys.exit(1)
      case "follow" =>
        // The engine-free CDC CONSUMER, cross-process (round 15): a
        // local cache maintained purely through StoreReader's external
        // surface — bootstrap from finals at one pinned generation,
        // then per poll: changedKeysSince(cursor, head) names the
        // invalidations, keysQuery(keys, head) refetches O(churn) rows
        // (a key with no row = delete), and the cache must equal a full
        // external read of the SAME pinned generation bit for bit. A
        // `DESYNC` line falsifies the whole consumption-loop contract
        // (invalidation completeness + snapshot stability together),
        // not just one read.
        import graft.sources.StoreReader
        var synced = 0; var retriable = 0; var desync = 0
        var cursor = -1L
        val cache = scala.collection.mutable.Map[String, Long]()
        while (System.nanoTime() < deadline) {
          try {
            val head = StoreReader.currentVersion(spark, store)
            if (head < 0) { retriable += 1; Thread.sleep(50) }
            else if (head == cursor) Thread.sleep(50)
            else {
              if (cursor < 0) {
                cache.clear()
                cache ++= StoreReader.finals(spark, store, head)
                  .select("reduce_key", "count").collect()
                  .map(r => r.getString(0) -> r.getLong(1))
              } else {
                val keys = StoreReader
                  .changedKeysSince(spark, store, cursor, head)
                  .collect().map(_.getString(0)).toSeq
                val fresh = StoreReader.keysQuery(spark, store, keys, head)
                  .select("reduce_key", "count").collect()
                  .map(r => r.getString(0) -> r.getLong(1)).toMap
                keys.foreach(k => fresh.get(k) match {
                  case Some(v) => cache(k) = v
                  case None => cache.remove(k) // vanished key = delete
                })
              }
              cursor = head
              val truth = StoreReader.finals(spark, store, head)
                .select("reduce_key", "count").collect()
                .map(r => r.getString(0) -> r.getLong(1)).toMap
              if (cache.toMap == truth) {
                synced += 1
                println(s"sync ok gen=$head keys=${cache.size} " +
                  s"total=${cache.values.sum}")
              } else {
                desync += 1
                println(s"DESYNC gen=$head cache=${cache.toMap} truth=$truth")
              }
            }
          } catch {
            case e: Throwable =>
              retriable += 1
              println(s"RETRIABLE ${e.getClass.getSimpleName}")
          }
        }
        println(s"follow: synced=$synced retriable=$retriable desync=$desync")
        spark.stop()
        if (desync > 0 || synced == 0) sys.exit(1)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
