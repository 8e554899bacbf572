package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.ops.BpeLearn

/** Regenerate `graft/functions/BpeMergesLearned.scala` from the corpus.
  *
  * Usage: LearnBpe [sfDir] [targetFertility] [outFile]
  * Defaults: /root/testdata/sf0.01, fertility 1.30, the in-repo source
  * path. The merge count is NOT an input: learning stops at the first
  * merge where corpus fertility (BPE tokens / whitespace words) reaches
  * the target — see [[BpeLearn.learnToFertility]] for why (the corpus's
  * small vocabulary saturates under unbounded learning, which would
  * degenerate token counts to word counts).
  *
  * Word extraction matches the encode side exactly: `text` split on the
  * repo-wide explicit whitespace class, sentinel handling inside the
  * learner. The word-count collect is the vocabulary (distinct words),
  * not the corpus — bounded and driver-sized by construction; learning
  * itself is a driver-side loop over that vocabulary (the classic
  * subword-nmt shape: training a tokenizer is a one-time offline step,
  * not a per-query operator).
  */
object LearnBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val target = args.lift(1).map(_.toDouble).getOrElse(1.30)
    val out = args.lift(2).getOrElse(
      "src/main/scala/graft/functions/BpeMergesLearned.scala")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-learn-bpe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val counts = wordCounts(spark, sfDir)
      val trace = BpeLearn.learnTrace(counts, 512)
      // Derive the fertility cut from the trace already computed —
      // learnToFertility would re-run the whole learning loop.
      val cut = trace.indexWhere(_._2 <= target)
      val merges = (if (cut < 0) trace else trace.take(cut + 1)).map(_._1)
      val fert = trace(merges.size - 1)._2
      val note = f"Fertility-stopped at target $target%.2f: fertility " +
        f"$fert%.4f after merge ${merges.size}; unbounded learning " +
        f"saturates at ${trace.size} merges (fertility ${trace.last._2}%.4f)."
      val src = BpeLearn.renderScala(merges, s"$sfDir/documents.parquet", note)
      Files.write(Paths.get(out), src.getBytes(StandardCharsets.UTF_8))
      println(s"[learn-bpe] wrote ${merges.size} merges to $out ($note)")
    } finally spark.stop()
  }

  /** Vocabulary of `documents.text`: word → total occurrences. */
  def wordCounts(spark: SparkSession, sfDir: String): Map[String, Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr(
        "regexp_extract_all(text, '[^ \\\\t\\\\n\\\\f\\\\r]+', 0)")) as "w")
      .groupBy($"w").agg(count(lit(1)) as "c")
      .as[(String, Long)].collect().toMap
  }
}
