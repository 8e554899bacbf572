package graft

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

import graft.core.ReduceAggregator
import graft.ops.IndexQueries

/** Throwaway experiment main (not part of the library surface): isolate
  * the reduceByKeyParent aggregation cost on a scaled corpus.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft-bench-x4-sf0.1-ac7ae14ed640")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val t = IndexQueries.LineitemByFlagStatus
    val docs = spark.read.parquet(corpus).as[IndexQueries.LineitemDoc]
    println(s"rows=${docs.count()}")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // Simulate `mapped`: the typed map + bucket/parent columns.
    import org.apache.spark.sql.functions._
    implicit val encKR: Encoder[(String, String, IndexQueries.FlagStatusAgg)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING,
        Encoders.product[IndexQueries.FlagStatusAgg])
    def mapped = docs.mapPartitions { it =>
      t.map(it).map { case (id, r) => (id, t.reduceKey(r), r) }
    }.toDF("doc_id", "reduce_key", "payload")
      .withColumn("doc_id", upper($"doc_id"))
      .withColumn("bucket",
        graft.functions.StableBucketHash.stableBucket($"doc_id", 4096))
      .withColumn("parent", $"bucket" / lit(64) cast "int")

    // 1. map+noop: cost of the typed map pipeline alone
    time("map+noop") {
      mapped.write.format("noop").mode("overwrite").save()
    }
    time("map+noop (2nd)") {
      mapped.write.format("noop").mode("overwrite").save()
    }

    // 2. typed Aggregator path (current engine), default fallback
    implicit val encIn: Encoder[(String, Int, IndexQueries.FlagStatusAgg)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt,
        Encoders.product[IndexQueries.FlagStatusAgg])
    def aggTyped(): Unit = {
      implicit val encKP: Encoder[(String, Int)] =
        Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
      implicit val encOut: Encoder[((String, Int), IndexQueries.FlagStatusAgg)] =
        Encoders.tuple(encKP, Encoders.product[IndexQueries.FlagStatusAgg])
      val grouped = mapped.select($"reduce_key", $"parent", $"payload")
        .as[(String, Int, IndexQueries.FlagStatusAgg)]
        .groupByKey(x => (x._1, x._2))
      grouped.mapValues(_._3)
        .agg(new ReduceAggregator[IndexQueries.FlagStatusAgg](t.reduce(_)).toColumn)
        .map { case ((k, p), r) => (k, p, r) }
        .toDF("reduce_key", "parent", "payload")
        .write.format("noop").mode("overwrite").save()
    }
    time("typed-agg default") { aggTyped() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
    time("typed-agg fallback=4M") { aggTyped() }
    time("typed-agg fallback=4M (2nd)") { aggTyped() }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")

    // 3. write partitioned (the map_results write)
    val dest = graft.ops.TempStores.scratch("graft-scratch-write")
    time("write-partitioned") {
      mapped.withColumn("seq", lit(0L))
        .select("parent", "bucket", "reduce_key", "doc_id", "seq", "payload")
        .repartition($"parent")
        .sortWithinPartitions($"parent", $"reduce_key")
        .write.partitionBy("parent").mode("overwrite").parquet(dest)
    }
    spark.stop()
  }
}
