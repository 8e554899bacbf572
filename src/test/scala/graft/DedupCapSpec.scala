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
    val dir = TestTmp.dir("graft-capspec")
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

  it("dedup manifest applies the exact rule before the near rule") {
    // The sf corpora contain no byte-identical documents, so the
    // manifest's EXACT branch never fires in the oracle comparison —
    // an empty-vs-empty match cannot catch a silently broken rule.
    // Pin it on a crafted corpus: byte-identical docs drop by the
    // exact rule (keeper = min doc_id), each at most once, and a doc
    // dropped by exact must NOT reappear under the near rule even
    // though identical texts always near-dup too.
    val dir = TestTmp.dir("graft-manifest")
    val docs = Seq(
      ("a1", "quick brown foxes jump over the lazy sleeping dogs daily"),
      ("a2", "quick brown foxes jump over the lazy sleeping dogs daily"),
      ("a3", "quick brown foxes jump over the lazy sleeping dogs daily"),
      ("b1", "completely unrelated content with its own distinct words here"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.ops.Dedup.queries("q80_dedup_manifest")(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(m == Set(("a2", "a1", "exact"), ("a3", "a1", "exact")),
      s"unexpected manifest: $m")
  }
}
