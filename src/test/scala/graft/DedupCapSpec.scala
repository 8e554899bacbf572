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

  it("span removal merges adjacent duplicated windows and splits on gaps") {
    // The sf corpora duplicate whole templates, so q100's oracle rows
    // there are mostly doc-wide spans — they can't distinguish "merged
    // the overlapping windows" from "marked everything". Pin the island
    // arithmetic on crafted cases: a shared 8-token run yields exactly
    // its own span at each site; a shared 10-token run's three
    // overlapping windows merge to ONE 10-token span; an INTRA-doc
    // repeat marks both occurrences as separate spans (gap > 1).
    val dir = TestTmp.dir("graft-spanspec")
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val t10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val r8 = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      ("A", s"a1 a2 a3 a4 $s8 a5 a6 a7 a8"),
      ("B", s"b1 b2 $s8 b3 b4 b5 b6 b7 b8"),
      ("C", s"c1 $t10 c2 c3 c4 c5 c6"),
      ("D", s"$t10 d1 d2 d3 d4 d5 d6"),
      ("E", s"e1 e2 $r8 e3 e4 e5 $r8 e6"),
      ("F", "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = graft.ops.Dedup.queries("q100_dup_span_removal")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      ("A", 4L, 11L, 8L),
      ("B", 2L, 9L, 8L),
      ("C", 1L, 10L, 10L), // 3 overlapping windows → one merged span
      ("D", 0L, 9L, 10L),
      ("E", 2L, 9L, 8L), ("E", 13L, 20L, 8L)), // intra-doc repeat splits
      s"unexpected spans: $spans")
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
