package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StableBucketHash

class StableBucketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("scalar hash is stable, case-insensitive, in range") {
    val ids = Seq("people-1", "PEOPLE-1", "People-1", "x", "", "ÅBC", "åbc")
    for (id <- ids) {
      val h = StableBucketHash.hash(id, 65536)
      assert(h >= 0 && h < 65536)
      assert(h == StableBucketHash.hash(id.toUpperCase, 65536))
      assert(h == StableBucketHash.hash(id.toLowerCase, 65536))
    }
    // Distinct ids spread across buckets (sanity, not uniformity proof).
    val spread = (1 to 1000).map(i => StableBucketHash.hash(s"doc-$i", 65536)).distinct
    assert(spread.size > 900)
  }

  test("catalyst expression agrees with the scalar implementation") {
    val ids = (1 to 500).map(i => s"Doc-$i")
    val fromExpr = ids.toDF("id")
      .select($"id", StableBucketHash.stableBucket($"id", 65536) as "b")
      .as[(String, Int)].collect().toMap
    for (id <- ids)
      assert(fromExpr(id) == StableBucketHash.hash(id, 65536))
  }

  test("null-safe") {
    val r = Seq[Option[String]](Some("a"), None).toDF("id")
      .select(StableBucketHash.stableBucket($"id", 256) as "b")
      .collect()
    assert(r.count(_.isNullAt(0)) == 1)
  }
}
