package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fast-path adapter: a re-reducible single-output reduce as a Spark
  * `Aggregator[R, Seq[R], R]`, so simple tasks run as native
  * partial+final aggregation (whole-stage codegen'd hash aggregate with
  * map-side combine) instead of `flatMapGroups`.
  *
  * The reference's reduce contract is `R* => R*` (`MapReduceTask.cs:10`);
  * most real tasks (and its sample, `PeopleCountByState.cs:20-31`) emit
  * exactly one output per key. For those this adapter applies; the
  * general multi-output path stays on `flatMapGroups` in [[Executer]].
  *
  * The buffer folds eagerly in chunks so map-side state is O(chunk), not
  * O(group): `merge`/`reduce` call the user's reduce whenever the pending
  * buffer exceeds `chunk` — valid precisely because of the
  * re-reducibility law `reduce(a ++ b) == reduce(reduce(a) ++ reduce(b))`
  * (SURVEY.md §2.3.1).
  */
class ReduceAggregator[R <: Product: TypeTag](
    reduceFn: Iterator[R] => Iterator[R],
    chunk: Int = 256)
    extends Aggregator[R, Seq[R], R] with Serializable {

  private def compact(buf: Seq[R]): Seq[R] =
    if (buf.size <= chunk) buf else reduceFn(buf.iterator).toSeq

  def zero: Seq[R] = Vector.empty
  def reduce(b: Seq[R], a: R): Seq[R] = compact(b :+ a)
  def merge(b1: Seq[R], b2: Seq[R]): Seq[R] = compact(b1 ++ b2)
  def finish(r: Seq[R]): R = {
    val out = reduceFn(r.iterator).toSeq
    require(out.size == 1,
      s"ReduceAggregator needs a single-output reduce; got ${out.size} — " +
        "use the Executer flatMapGroups path for multi-output reduces")
    out.head
  }
  def bufferEncoder: Encoder[Seq[R]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[R]]()
  def outputEncoder: Encoder[R] = Encoders.product[R]
}
