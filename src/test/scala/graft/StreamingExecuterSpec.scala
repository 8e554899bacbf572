package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingExecuter

/** PeopleCountByState with the singleOutput contract declared — the
  * shape [[StreamingExecuter.aggregateStream]] requires. */
object PeopleCountSingle extends graft.core.MapReduceTask[Person, StatePop] {
  def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
    docs.map(p => (p.id, StatePop(p.state, 1L)))
  def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
    entries.toSeq.groupBy(_.state)
      .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
  def reduceKey(e: StatePop): String = e.state
  def documentId(p: Person): String = p.id
  override def singleOutput: Boolean = true
}

class StreamingExecuterSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("micro-batches incrementally maintain the persistent index") {
    val in = TestTmp.dir("graft-stream-in")
    val store = TestTmp.dir("graft-stream-store")
    val ckpt = TestTmp.dir("graft-stream-ckpt")

    // Batch 1: initial documents land in the source directory.
    spark.createDataset(Seq(
      Person("p-1", "CA"), Person("p-2", "CA"), Person("p-3", "TX")))
      .write.mode("append").parquet(in)

    val sx = new StreamingExecuter(PeopleCountByState, store)
    def drain(): Unit = {
      val docs = spark.readStream
        .schema("id STRING, state STRING")
        .parquet(in).as[Person]
      val q = sx.attach(docs, ckpt)
      q.awaitTermination()
    }
    drain()
    assert(sx.query("CA").collect().toSeq == Seq(StatePop("CA", 2L)))
    assert(sx.query("TX").collect().toSeq == Seq(StatePop("TX", 1L)))

    // Batch 2: an update re-submits p-2 as TX; only the new file is
    // processed (checkpointed source), and the index updates in place.
    spark.createDataset(Seq(Person("p-2", "TX")))
      .write.mode("append").parquet(in)
    drain()
    assert(sx.query("CA").collect().toSeq == Seq(StatePop("CA", 1L)))
    assert(sx.query("TX").collect().toSeq == Seq(StatePop("TX", 2L)))
  }

  test("always-on streamed ingest never disturbs a concurrent reader (manifest store)") {
    // The 100 TB ingestion topology end-to-end: a stream delivers
    // update micro-batches (foreachBatch → execute) into a MANIFEST
    // store while a separate-session reader loops over the index. The
    // churn batches only MOVE documents between states, so the total is
    // conserved and any torn read is detectable; the manifest layer must
    // keep every read both consistent AND retry-free (SURVEY §14).
    val in = TestTmp.dir("graft-stream-live-in")
    val store = TestTmp.dir("graft-stream-live-store")
    val ckpt = TestTmp.dir("graft-stream-live-ckpt")
    val N = 120
    def person(i: Int, flip: Boolean): Person =
      Person(s"p-$i", if ((i % 2 == 0) ^ flip) "CA" else "TX")
    spark.createDataset((1 to N).map(person(_, flip = false)))
      .write.mode("append").parquet(in)

    val sx = new StreamingExecuter(PeopleCountByState, store)
    def drain(): Unit = {
      val docs = spark.readStream
        .schema("id STRING, state STRING")
        .parquet(in).as[Person]
      sx.attach(docs, ckpt).awaitTermination()
    }
    drain() // initial build

    val readerEx = new graft.core.Executer(PeopleCountByState, store)(
      implicitly, spark.newSession())
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val good = new java.util.concurrent.atomic.AtomicInteger(0)
    val retriable = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var torn: Option[String] = None
    val reader = new Thread(() => {
      while (!stop.get() && torn.isEmpty) {
        try {
          val total = readerEx.queryAll().collect().map(_.getLong(2)).sum
          if (total != N) torn = Some(s"total $total != $N")
          else good.incrementAndGet()
        } catch { case _: Throwable => retriable.incrementAndGet() }
      }
    }, "stream-live-reader")
    reader.start()
    try {
      for (round <- 1 to 6) {
        spark.createDataset(
          (1 to 30).map(i => person(i * 4 % N + 1, round % 2 == 1))
            .distinctBy(_.id))
          .write.mode("append").parquet(in)
        drain()
        Thread.sleep(100)
      }
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(torn.isEmpty, s"torn read during streamed ingest: $torn")
    assert(good.get() > 0, "reader never completed a read")
    assert(retriable.get() == 0,
      s"manifest reads must be retry-free under streamed ingest, got ${retriable.get()}")
    assert(sx.queryAll().collect().map(_.getLong(2)).sum == N)
  }

  test("native update-mode aggregation equals the Executer on append-only input") {
    // SURVEY §7.2.6's promised state-store path: for singleOutput tasks
    // the stream aggregates per reduce key through ReduceAggregator in
    // Spark's streaming state store — no per-batch store maintenance.
    // Proven against the Executer path on the same append-only docs,
    // and the update-mode contract (only CHANGED keys emitted per
    // trigger) is pinned alongside.
    val in = TestTmp.dir("graft-natagg-in")
    val ckpt = TestTmp.dir("graft-natagg-ckpt")
    val store = TestTmp.dir("graft-natagg-store")
    val batch1 = Seq(Person("p-1", "CA"), Person("p-2", "CA"), Person("p-3", "TX"))
    val batch2 = Seq(Person("p-4", "CA"), Person("p-5", "WA"))
    spark.createDataset(batch1).coalesce(1).write.mode("append").parquet(in)
    spark.createDataset(batch2).coalesce(1).write.mode("append").parquet(in)

    val sx = new StreamingExecuter(PeopleCountSingle,
      TestTmp.dir("graft-natagg-unused"))
    val docs = spark.readStream
      .schema("id STRING, state STRING")
      .option("maxFilesPerTrigger", 1).parquet(in).as[Person]
    val perBatch = collection.mutable.Buffer[(Long, Map[String, Long])]()
    val q = sx.aggregateStream(docs)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.collect()
          .map(r => (r.getString(0), r.getStruct(1).getLong(1))).toMap
        perBatch.synchronized { perBatch += ((id, rows)) }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    // Final streamed state (last emission per key) must equal the
    // Executer built over the same documents.
    val ex = new graft.core.Executer(PeopleCountByState, store)
    ex.execute(spark.createDataset(batch1 ++ batch2))
    val expected = ex.queryAll().collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val streamed = perBatch.sortBy(_._1).foldLeft(Map.empty[String, Long]) {
      case (acc, (_, rows)) => acc ++ rows
    }
    assert(streamed == expected, s"streamed $streamed != batch $expected")
    // Update-mode contract: the second trigger emits only the keys the
    // second file changed (CA grew, WA appeared — TX must NOT re-emit).
    val nonEmpty = perBatch.sortBy(_._1).map(_._2).filter(_.nonEmpty)
    assert(nonEmpty.size == 2)
    assert(nonEmpty.last.keySet == Set("CA", "WA"),
      s"update mode re-emitted unchanged keys: ${nonEmpty.last.keySet}")

    // The aggregator contract gate: multi-output tasks are rejected.
    val multi = new graft.core.MapReduceTask[Person, StatePop] {
      def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
        docs.map(p => (p.id, StatePop(p.state, 1L)))
      def reduce(es: Iterator[StatePop]): Iterator[StatePop] = es
      def reduceKey(e: StatePop): String = e.state
      def documentId(d: Person): String = d.id
    }
    val sxMulti = new StreamingExecuter(multi,
      TestTmp.dir("graft-natagg-multi"))
    intercept[IllegalArgumentException](sxMulti.aggregateStream(docs))
  }

  test("streaming exact dedup with watermark-bounded state") {
    // The streaming spelling of q21 exact dedup for a live ingest
    // pipeline: first document per content hash passes, later
    // duplicates are dropped, and dedup state is EVICTED past the
    // watermark — the bounded-state requirement of a 100 TB
    // always-on ingest (an unbounded dropDuplicates would OOM).
    import org.apache.spark.sql.functions._
    val in = TestTmp.dir("graft-sdedup-in")
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    // Two files = two micro-batches (maxFilesPerTrigger=1). 5 docs, 3
    // distinct content hashes; the cross-batch duplicate (h1 again in
    // file 2) must be suppressed by state, not by in-batch distinct.
    spark.createDataset(Seq(
      (ts(0), "d1", "h1"), (ts(1), "d2", "h2"), (ts(1), "d3", "h1")))
      .toDF("ts", "doc_id", "h").coalesce(1).write.mode("append").parquet(in)
    spark.createDataset(Seq((ts(3), "d4", "h1"), (ts(4), "d5", "h3")))
      .toDF("ts", "doc_id", "h").coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, doc_id STRING, h STRING")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val dedup = stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("h")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT h, count(*) n FROM sdedup_out GROUP BY h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("h1", 1L), ("h2", 1L), ("h3", 1L)),
      s"each content hash must survive exactly once, got $got")
  }

  test("stream-stream watermarked interval join with bounded state") {
    // The remaining core Structured Streaming operator: joining two
    // LIVE streams (impressions ⋈ clicks within an attribution window).
    // Both sides carry watermarks and the join predicate bounds event
    // time on both sides, so Spark can EVICT join state once the
    // watermark passes — the requirement that makes a 100 TB always-on
    // two-stream join feasible (unbounded state would OOM; with these
    // constraints state is O(watermark-window of data), not O(stream)).
    import org.apache.spark.sql.functions._
    val impDir = TestTmp.dir("graft-ssj-imp")
    val clkDir = TestTmp.dir("graft-ssj-clk")
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)

    // Impressions: ads 1-3. Clicks: ad 1 clicked 2min after (inside the
    // 5min attribution window), ad 2 clicked 20min after (OUTSIDE the
    // window — must not match), ad 9 clicked with no impression at all.
    spark.createDataset(Seq((ts(0), 1L), (ts(1), 2L), (ts(2), 3L)))
      .toDF("imp_ts", "ad_id").coalesce(1).write.mode("append").parquet(impDir)
    spark.createDataset(Seq((ts(2), 1L), (ts(21), 2L), (ts(3), 9L)))
      .toDF("clk_ts", "ad_id").coalesce(1).write.mode("append").parquet(clkDir)

    val impressions = spark.readStream
      .schema("imp_ts TIMESTAMP, ad_id BIGINT").parquet(impDir)
      .withWatermark("imp_ts", "10 minutes")
    val clicks = spark.readStream
      .schema("clk_ts TIMESTAMP, ad_id BIGINT").parquet(clkDir)
      .withColumnRenamed("ad_id", "clk_ad_id")
      .withWatermark("clk_ts", "10 minutes")

    val joined = impressions.join(clicks,
      $"ad_id" === $"clk_ad_id" &&
        $"clk_ts" >= $"imp_ts" &&
        $"clk_ts" <= $"imp_ts" + expr("INTERVAL 5 MINUTES"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql(
      "SELECT ad_id, date_format(imp_ts,'HH:mm'), date_format(clk_ts,'HH:mm') FROM ssj_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // Only ad 1 attributes: ad 2's click is outside the interval, ad 9
    // never showed an impression.
    assert(got == Set((1L, "10:00", "10:02")), s"unexpected attribution: $got")
  }

  test("streamed histogram index handles a doc moving bins between micro-batches") {
    // q89's min/max-merging task on the streaming ingest path: a later
    // micro-batch re-submits a document at a different length, so the
    // old bin must retract it (bin row disappears when it was the only
    // member — the state a pure streaming aggregation could never
    // produce, which is why update-capable ingest goes through
    // attach()/Executer) and the new bin's extrema must re-reduce.
    import graft.ops.IncrementalIndexes.{DocLen, LengthHistIndex}
    val in = TestTmp.dir("graft-shist-in")
    val store = TestTmp.dir("graft-shist-store")
    val ckpt = TestTmp.dir("graft-shist-ckpt")
    def doc(id: Long, src: String, n: Int) =
      DocLen(id, src, Seq.fill(n)("w").mkString(" "))

    spark.createDataset(Seq(
      doc(1, "web", 10), doc(2, "web", 40), doc(3, "books", 20)))
      .write.mode("append").parquet(in)
    val sx = new StreamingExecuter(LengthHistIndex, store)
    def drain(): Unit = {
      val docs = spark.readStream
        .schema("doc_id LONG, source STRING, text STRING")
        .parquet(in).as[DocLen]
      sx.attach(docs, ckpt).awaitTermination()
    }
    drain()
    def state() = sx.queryAll()
      .select("source", "len_bin", "docs", "min_toks", "max_toks")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
    assert(state() == Map(
      ("web", 0L) -> ((1L, 10, 10)), ("web", 2L) -> ((1L, 40, 40)),
      ("books", 1L) -> ((1L, 20, 20))))

    // Doc 1 grows 10 → 45 tokens: web bin 0 must vanish (it was the
    // only member), web bin 2's count and extrema must absorb it.
    spark.createDataset(Seq(doc(1, "web", 45)))
      .write.mode("append").parquet(in)
    drain()
    assert(state() == Map(
      ("web", 2L) -> ((2L, 40, 45)), ("books", 1L) -> ((1L, 20, 20))))
  }

  test("watermarked event-time window aggregation over a stream") {
    import org.apache.spark.sql.functions._
    val in = TestTmp.dir("graft-wm-in")
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    spark.createDataset(Seq(
      (ts(0), 1.0), (ts(2), 2.0), (ts(6), 3.0), (ts(11), 4.0)))
      .toDF("ts", "v").write.mode("append").parquet(in)

    val stream = spark.readStream.schema("ts TIMESTAMP, v DOUBLE").parquet(in)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)) as "n", sum($"v") as "sv")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wm_out").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT date_format(window.start, 'HH:mm') s, n, sv FROM wm_out ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("10:00", 2L, 3.0), ("10:05", 1L, 3.0), ("10:10", 1L, 4.0)))
  }
}
