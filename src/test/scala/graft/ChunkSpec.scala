package graft

import java.security.MessageDigest

import org.scalatest.funspec.AnyFunSpec

/** Pins the sliding-window chunking arithmetic (q109: 32-token windows
  * every 24 tokens) and the chunk-level cross-doc dedup built on it
  * (q110). The sf corpora exercise oracle parity at the gate; this spec
  * pins the boundary cases crafted data can isolate: exact start
  * offsets, tail-chunk lengths, the 8-token overlap, the ≥1-chunk
  * guarantee for short/empty docs, and that q110 reports exactly the
  * planted shared chunk and nothing else.
  */
class ChunkSpec extends AnyFunSpec {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val s32 = (1 to 32).map(i => s"s$i").mkString(" ")

  private def fixture(): String = {
    val dir = TestTmp.dir("graft-chunkspec")
    val docs = Seq(
      // 80 tokens → starts 0,24,48,72; lengths 32,32,32,8.
      ("X", (1 to 80).map(i => s"x$i").mkString(" ")),
      // Exactly one window of shared content, chunk-aligned in both:
      ("P", s32),
      ("Q", s32 + " " + (1 to 16).map(i => s"q$i").mkString(" ")),
      // Short and empty docs still yield one chunk each.
      ("S", "one two three"),
      ("E", ""))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  it("emits windows at stride offsets with exact tail lengths and hashes") {
    val dir = fixture()
    val chunks = SparkEntry.queries("q109_chunk_overlap")(spark, dir)
      .as[(String, Int, Int, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }

    val xs = (1 to 80).map(i => s"x$i")
    val x = chunks("X")
    assert(x.map(c => (c._2, c._3)).toSeq ==
      Seq((0, 32), (1, 32), (2, 32), (3, 8)))
    // Each chunk hashes the 32-token (or tail) slice at start = idx*24.
    for ((_, idx, n, h) <- x) {
      val words = xs.slice(idx * 24, idx * 24 + 32)
      assert(n == words.size)
      assert(h == md5hex(words.mkString(" ")))
    }
    // The 8-token overlap: window k's last 8 tokens are window k+1's
    // first 8 — guaranteed by start arithmetic, witnessed via slices.
    assert(xs.slice(24, 32) == xs.slice(0, 32).takeRight(8))

    // ≥1 chunk per doc, even short and empty texts (split("") = [""]).
    assert(chunks("S").toSeq == Seq(("S", 0, 3, md5hex("one two three"))))
    assert(chunks("E").toSeq == Seq(("E", 0, 1, md5hex(""))))
  }

  it("chunk dedup reports exactly the planted cross-doc chunk") {
    val dir = fixture()
    val shared = SparkEntry.queries("q110_chunk_dedup")(spark, dir)
      .as[(String, Long, Long, String)].collect()
    assert(shared.toSeq == Seq((md5hex(s32), 2L, 2L, "P")),
      "only P and Q share a chunk-aligned 32-token window")
  }
}
