package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{Executer, ExecuterConfig, MapReduceTask}

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
}
