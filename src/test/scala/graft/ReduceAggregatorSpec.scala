package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ReduceAggregator

case class Acc(key: String, cnt: Long, total: Double)

object AccReduce extends Serializable {
  def reduceFn(it: Iterator[Acc]): Iterator[Acc] =
    it.toSeq.groupBy(_.key).map { case (k, es) =>
      Acc(k, es.map(_.cnt).sum, es.map(_.total).sum)
    }.iterator
}

class ReduceAggregatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._
  import AccReduce.reduceFn

  test("aggregator equals direct reduce (native partial+final path)") {
    val data = (1 to 5000).map(i => Acc(s"k${i % 7}", 1L, (i % 100).toDouble))
    val agg = new ReduceAggregator[Acc](reduceFn, chunk = 64)
    val viaAgg = spark.createDataset(data)
      .groupByKey(_.key)
      .agg(agg.toColumn.name("acc"))
      .collect().map { case (k, a) => k -> ((a.cnt, a.total)) }.toMap
    val direct = reduceFn(data.iterator)
      .map(a => a.key -> ((a.cnt, a.total))).toMap
    assert(viaAgg == direct)
  }

  test("re-reducibility law holds for chunked folding") {
    // reduce(a ++ b) == reduce(reduce(a) ++ reduce(b)) — the contract the
    // chunked buffer exploits (SURVEY.md §2.3.1).
    val rnd = new scala.util.Random(7)
    val xs = (1 to 300).map(_ => Acc(s"k${rnd.nextInt(4)}", rnd.nextInt(10).toLong, rnd.nextInt(50).toDouble))
    val (a, b) = xs.splitAt(137)
    val whole = reduceFn(xs.iterator).toSeq.sortBy(_.key)
    val split = reduceFn((reduceFn(a.iterator).toSeq ++ reduceFn(b.iterator).toSeq).iterator)
      .toSeq.sortBy(_.key)
    assert(whole == split)
  }

  test("multi-output reduce is rejected with a clear error") {
    def multi(it: Iterator[Acc]): Iterator[Acc] = it // identity: n outputs
    val agg = new ReduceAggregator[Acc](multi)
    val ex = intercept[Exception] {
      spark.createDataset((1 to 10).map(i => Acc("k", 1L, i.toDouble)))
        .groupByKey(_.key).agg(agg.toColumn.name("acc")).collect()
    }
    assert(ex.getMessage != null)
  }
}
