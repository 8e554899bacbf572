package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KgramMd5Set

/** The shingle kernel must agree element-for-element with the
  * declarative HOF formulation it replaced (array_distinct of md5'd
  * space-joined k-grams) — including first-occurrence order, empty and
  * sub-k documents, repeated words, and multi-byte text. */
class KgramMd5SetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def reference(texts: Seq[String], k: Int) = {
    import spark.implicits._
    val ws = split($"text", "\\s+")
    texts.toDF("text").select($"text",
      array_distinct(transform(
        sequence(lit(0), size(ws) - lit(k)),
        i => md5(concat_ws(" ",
          (1 to k).map(j => element_at(ws, i + lit(j))): _*)))) as "sh")
  }

  private def kernel(texts: Seq[String], k: Int) = {
    import spark.implicits._
    texts.toDF("text").select($"text",
      KgramMd5Set.kgramMd5Set(split($"text", "\\s+"), k) as "sh")
  }

  test("kernel matches the declarative formulation on varied documents") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "dog", "über",
      "漢字", "x", "", "the") // incl. empty word (double space artifacts)
    val texts =
      (1 to 50).map(_ => Seq.fill(4 + rnd.nextInt(60))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("one two three four", "a a a a a a", "single word here again too")
    for (k <- Seq(2, 3, 4)) {
      // Guard mirrors the query-side `size(words) >= k` filter.
      val eligible = texts.filter(_.split("\\s+", -1).length >= k)
      val exp = reference(eligible, k).collect().map(r =>
        r.getString(0) -> r.getSeq[String](1)).toMap
      val got = kernel(eligible, k).collect().map(r =>
        r.getString(0) -> r.getSeq[String](1)).toMap
      assert(got == exp, s"k=$k mismatch")
    }
  }

  test("list variant keeps duplicates in order (multiset equals the HOF transform)") {
    import spark.implicits._
    val texts = Seq("a b a b a b", "x y x y zz x y")
    val ws = split($"text", "\\s+")
    val exp = texts.toDF("text").select(transform(
      sequence(lit(0), size(ws) - lit(2)),
      i => md5(concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2)))) as "g")
      .collect().map(_.getSeq[String](0))
    val got = texts.toDF("text")
      .select(KgramMd5Set.kgramMd5List(split($"text", "\\s+"), 2) as "g")
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq == exp.toSeq)
  }

  test("null elements are skipped with their separator, like concat_ws") {
    import spark.implicits._
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"))
    val exp = spark.range(1).select(
      array_distinct(transform(
        sequence(lit(0), size(arr) - lit(2)),
        i => md5(concat_ws(" ",
          element_at(arr, i + lit(1)), element_at(arr, i + lit(2))))))).head.getSeq[String](0)
    val got = spark.range(1)
      .select(KgramMd5Set.kgramMd5Set(arr, 2)).head.getSeq[String](0)
    assert(got == exp)
  }

  test("sub-k and empty inputs yield empty sets") {
    val got = kernel(Seq("one two", ""), 4).collect()
    assert(got.forall(_.getSeq[String](1).isEmpty))
  }

  test("registered as SQL function") {
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(kgram_md5_set(split('a b c d e', ' '), 3)) AS n")
      .head.getInt(0)
    assert(n == 3)
  }
}
