package graft

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec

/** Skewed-corpus guard for the LSH hot-bucket cap (`Dedup.capHotBuckets`):
  * a degenerate bucket (here: 100 byte-identical documents, which share
  * every band signature) must contribute NO candidate pairs — without the
  * cap it alone would emit 4,950 quadratic pairs per band — while pairs
  * in ordinary small buckets must still be found.
  */
class DedupCapSpec extends AnyFunSpec {
  private val spark = TestSpark.spark
  import spark.implicits._

  it("drops degenerate buckets from candidate generation, keeps small ones") {
    val dir = Files.createTempDirectory("graft-capspec").toString
    val clones = (1 to 100).map(i =>
      (f"clone-$i%03d", "the same exact text repeated again and again forever"))
    val dups = Seq(
      ("dup-a", "quick brown foxes jump over the lazy sleeping dogs daily"),
      ("dup-b", "quick brown foxes jump over the lazy sleeping dogs daily"))
    val uniques = (1 to 10).map(i =>
      (s"uniq-$i", s"completely different content number $i alpha$i beta$i gamma$i delta$i"))
    (clones ++ dups ++ uniques).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = graft.ops.Dedup.queries("q27_lsh_candidate_pairs")(spark, dir)
      .select("id_a", "id_b").as[(String, String)].collect().toSet

    assert(pairs.contains(("dup-a", "dup-b")),
      "identical pair in a small bucket must survive the cap")
    assert(!pairs.exists { case (a, b) =>
      a.startsWith("clone") && b.startsWith("clone") },
      "pairs from the 100-member degenerate bucket must be capped away")
  }
}
