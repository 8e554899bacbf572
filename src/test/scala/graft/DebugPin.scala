package graft

import org.apache.spark.sql.SparkSession
import graft.core.{Executer, ExecuterConfig, MapReduceTask}

object DebugPin {
  case class Doc(id: String, v: Long)
  case class Tot(scope: String, n: Long, sum: Long)
  object TotTask extends MapReduceTask[Doc, Tot] {
    def map(docs: Iterator[Doc]): Iterator[(String, Tot)] =
      docs.map(d => ("all", Tot("all", 1L, d.v)))
    def reduce(es: Iterator[Tot]): Iterator[Tot] = {
      val s = es.toSeq
      Iterator(Tot("all", s.map(_.n).sum, s.map(_.sum).sum))
    }
    def reduceKey(e: Tot): String = e.scope
    def documentId(d: Doc): String = d.id
    override def singleOutput: Boolean = true
  }
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = TestSpark.spark
    import spark.implicits._
    val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)
    val ex = new Executer(TotTask, TestTmp.dir("graft-dbg-tot"), cfg)
    ex.execute(spark.createDataset(Seq(Doc("A", 1), Doc("B", 2), Doc("C", 3))))
    println("after build:"); ex.queryAll().show(false)
    ex.execute(spark.createDataset(Seq(Doc("D", 4), Doc("E", 5))))
    println("after update (want n=5 sum=15):"); ex.queryAll().show(false)
    // distributed-shaped batch (repartition forces non-LocalRelation)
    ex.execute(spark.createDataset(Seq(Doc("F", 6))).repartition(2))
    println("after dist update (want n=6 sum=21):"); ex.queryAll().show(false)
    spark.stop()
  }
}
