package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, StableBucketHash}

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT stable_bucket('People-30', 65536) AS b,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       hyperplane_buckets(array(CAST(0.5 AS FLOAT)), 1, 2, 1) AS hb,
        |       minhash_sigs(array('a b c', 'b c d'), 2) AS mh
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == StableBucketHash.hash("PEOPLE-30", 65536))
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[Int](2).length == 1)
    assert(r.getSeq[String](3).forall(_.length == 16))
  }

  test("hyperplane_buckets tolerates vectors shorter than dim") {
    GraftFunctions.register(spark)
    // dim=4 but only 2 elements present: projects over the prefix (same
    // contract as IncrementalIndexes.cellOf) instead of throwing. Both
    // the interpreted eval and codegen paths must agree.
    val sql =
      """SELECT hyperplane_buckets(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 2, 3, 4) AS hb,
        |       hyperplane_buckets(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT),
        |                                CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), 2, 3, 4) AS full
        |""".stripMargin
    val r = spark.sql(sql).collect()(0)
    assert(r.getSeq[Int](0) == r.getSeq[Int](1))
  }

  test("hyperplane_probes: probe 0 is the probe-1 cell, probe 1 flips one bit") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT hyperplane_probes(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT),
        |                               CAST(2.0 AS FLOAT)), 4, 3) AS pr,
        |       element_at(hyperplane_buckets(array(CAST(0.5 AS FLOAT),
        |         CAST(-1.5 AS FLOAT), CAST(2.0 AS FLOAT)), 1, 4, 3), 1) AS cell
        |""".stripMargin).collect()(0)
    val probes = r.getSeq[Int](0)
    assert(probes.length == 2)
    assert(probes(0) == r.getInt(1))
    // Exactly one bit differs between the two probes.
    assert(Integer.bitCount(probes(0) ^ probes(1)) == 1)
  }

  test("non-literal config argument is rejected with a clear error") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT stable_bucket('x', CAST(rand()*10 AS INT))").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("literal"))
  }

  test("wrong-typed SQL arguments fail at analysis time, not per row") {
    GraftFunctions.register(spark)
    // Each must raise during analysis (AnalysisException naming the
    // expected type), never a ClassCastException inside a task.
    for ((sql, want) <- Seq(
        ("SELECT stable_bucket(123, 10)", "string"),
        ("SELECT dot_product(array('a'), array('b'))", "array<float|double>"),
        ("SELECT hyperplane_buckets(array('a'), 1, 8, 64)", "array<float|double>"),
        ("SELECT minhash_sigs(array(1, 2), 8)", "array<string>"),
        ("SELECT winnow_fps(array(1, 2), 2, 2)", "array<string>"),
        ("SELECT kgram_md5_set(array(1, 2), 2)", "array<string>"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains(want), s"$sql: ${e.getMessage.take(200)}")
    }
    // A zero bucket count is a constructor-time error, not a per-row
    // ArithmeticException.
    intercept[Exception](spark.sql("SELECT stable_bucket('x', 0)").collect())
  }

  test("dot_product is null on length mismatch, never a truncated sum") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D)) AS d," +
        " dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok")
      .collect().head
    assert(r.isNullAt(0), "mismatched lengths must yield NULL")
    assert(r.getDouble(1) == 11.0)
  }
}
