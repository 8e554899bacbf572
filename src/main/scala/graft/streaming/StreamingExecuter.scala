package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{Executer, ExecuterConfig, MapReduceTask, ReduceAggregator}

/** Structured Streaming front-end for the updatable index.
  *
  * The reference's `Execute(docs)` is exactly one micro-batch of a
  * streaming upsert (SURVEY.md §2.2 "the entire engine is a stateful
  * incremental operator"): each incoming micro-batch of documents is an
  * ingest-or-update against the persistent index. `foreachBatch` makes
  * that literal — every micro-batch becomes one `Executer.execute` call,
  * giving end-to-end incremental maintenance of the persisted index from
  * a live stream, queryable between batches (`Executer.cs:370-377`
  * visibility semantics: queries see the last completed reduce).
  *
  * At scale this is the ingestion topology: the stream (files source /
  * Kafka in production) delivers document batches; index maintenance cost
  * per batch is proportional to batch size + dirty subtrees, never to
  * total index size.
  */
class StreamingExecuter[D, R <: Product: TypeTag](
    task: MapReduceTask[D, R],
    storePath: String,
    config: ExecuterConfig = ExecuterConfig())(implicit spark: SparkSession) {

  val executer = new Executer[D, R](task, storePath, config)

  /** Attach the index to a streaming Dataset of documents. Caller starts/
    * stops the returned query (`processAllAvailable()` for tests). */
  def attach(
      docs: Dataset[D],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[D], _: Long) =>
        executer.execute(batch)
      }
      .start()

  def query(key: String): Dataset[R] = executer.query(key)
  def queryAll() = executer.queryAll()

  /** Native update-mode aggregation (SURVEY §7.2.6): map the document
    * stream through the task and aggregate per reduce key in Spark's
    * streaming STATE STORE via the re-reducible [[ReduceAggregator]] —
    * no per-batch store maintenance at all. Start the returned plan
    * with `writeStream.outputMode("update")`: each trigger emits only
    * the keys whose aggregate changed.
    *
    * Scope — the two paths are complements, not alternatives:
    *   - This path is the LIVE VIEW for APPEND-ONLY streams (log/event
    *     ingest): lowest latency, results flow to the sink, state is
    *     the per-key aggregate (O(keys), checkpointed by Spark). It has
    *     no document identity: re-submitting a changed document would
    *     double-count, because delete-and-invalidate (`update = delete
    *     + insert`, `Executer.cs:240-261`) needs the per-doc map rows
    *     that only the persistent store keeps.
    *   - [[attach]] (foreachBatch → [[Executer.execute]]) is the
    *     durable, queryable, UPDATE-CAPABLE index.
    * Valid only for `singleOutput` tasks — the aggregator contract. */
  def aggregateStream(docs: Dataset[D]): DataFrame = {
    require(task.singleOutput,
      "aggregateStream needs a singleOutput task (Aggregator contract); " +
        "multi-output reduces go through attach()/Executer")
    val t = task
    implicit val encR: Encoder[R] = Encoders.product[R]
    implicit val encKR: Encoder[(String, R)] =
      Encoders.tuple(Encoders.STRING, encR)
    docs.mapPartitions(it => t.map(it).map { case (_, r) => (t.reduceKey(r), r) })
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)
      .agg(new ReduceAggregator[R](t.reduce(_)).toColumn)
      .toDF("reduce_key", "payload")
  }
}
