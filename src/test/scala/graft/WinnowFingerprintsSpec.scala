package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFingerprints

/** The O(n) winnowing kernel must agree element-for-element with the
  * declarative HOF formulation it replaced (array_distinct of
  * array_min-over-slice window minima on md5'd k-grams). */
class WinnowFingerprintsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val k = 4
  private val w = 5

  /** The original (slow but obviously-correct) formulation. */
  private def referenceFps(spark: SparkSession, texts: Seq[String]) = {
    import spark.implicits._
    val words = split($"text", "\\s+")
    val kgrams = transform(
      sequence(lit(0), size(words) - lit(k)),
      i => concat_ws(" ", (0 until k).map(j => element_at(words, i + j + 1)): _*))
    val hashed = texts.toDF("text")
      .where(size(split($"text", "\\s+")) >= k + w - 1)
      .select($"text", transform(kgrams, g => md5(g)) as "hs")
    val minima = transform(
      sequence(lit(1), size($"hs") - lit(w - 1)),
      i => array_min(slice($"hs", i, lit(w))))
    hashed.select($"text", array_distinct(minima) as "fps")
  }

  private def kernelFps(spark: SparkSession, texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
      .where(size(split($"text", "\\s+")) >= k + w - 1)
      .select($"text",
        WinnowFingerprints.winnowFps(split($"text", "\\s+"), k, w) as "fps")
  }

  test("kernel matches the declarative formulation on varied documents") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "dog", "ran",
      "fast", "zebra", "über", "漢字", "x")
    val texts =
      // random docs of many lengths, incl. heavy repetition (deque ties)
      (1 to 60).map(n => Seq.fill(4 + rnd.nextInt(80))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq(
        "a a a a a a a a a a a a",          // all-equal hashes
        "one two three four five six seven eight", // exactly k+w-1 words
        "one two three four five six seven") // one below the gate
    val ref = referenceFps(spark, texts).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).sorted).toMap
    val got = kernelFps(spark, texts).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).sorted).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (t, fps) => assert(fps == ref(t), s"doc: $t") }
    assert(got.nonEmpty)
  }

  test("short and empty inputs produce empty fingerprint sets") {
    import spark.implicits._
    val out = Seq("one two", "")
      .toDF("text")
      .select(WinnowFingerprints.winnowFps(split($"text", "\\s+"), k, w) as "fps")
      .collect()
    assert(out.forall(_.getSeq[String](0).isEmpty))
  }

  test("w=1 degenerates to the distinct k-gram hash set") {
    import spark.implicits._
    val words = split($"text", "\\s+")
    val kgrams = transform(
      sequence(lit(0), size(words) - lit(k)),
      i => concat_ws(" ", (0 until k).map(j => element_at(words, i + j + 1)): _*))
    val df = Seq("the cat sat on a mat the cat sat on a mat").toDF("text")
    val ref = df.select(array_distinct(transform(kgrams, g => md5(g))) as "fps")
      .collect()(0).getSeq[String](0).sorted
    val got = df.select(
        WinnowFingerprints.winnowFps(split($"text", "\\s+"), k, 1) as "fps")
      .collect()(0).getSeq[String](0).sorted
    assert(got == ref && got.nonEmpty)
  }
}
