package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}

/** The pure-insert fast path appends one file per batch per partition —
  * that keeps inserts O(batch), but a long append-mostly workload
  * fragments map_results. compact() must consolidate fragmented
  * partitions without changing any query result.
  */
class CompactSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(store: String): Int = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
    walk(new java.io.File(s"$store/map_results"))
      .count(_.getName.endsWith(".parquet"))
  }

  test("compact() consolidates append fragmentation, results unchanged") {
    val store = TestTmp.dir("graft-compact")
    val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)
    val ex = new Executer(PeopleCountByState, store, cfg)
    ex.execute(spark.createDataset(
      (1 to 40).map(i => Person(s"p-$i", if (i % 2 == 0) "CA" else "TX"))))
    // 12 pure-insert batches of fresh ids — each appends files.
    for (b <- 1 to 12) {
      ex.execute(spark.createDataset(
        Seq(Person(s"new-$b", if (b % 2 == 0) "CA" else "TX"))))
    }
    val before = ex.queryAll().collect().toSet
    val filesBefore = parquetFiles(store)

    ex.compact(maxFilesPerPartition = 2)

    val filesAfter = parquetFiles(store)
    assert(filesAfter < filesBefore,
      s"expected consolidation, had $filesBefore files, now $filesAfter")
    assert(ex.queryAll().collect().toSet == before)
    // storeStats mirrors what compact() just did: file count down to
    // O(#partitions), no tombstones, nothing pending.
    val stats = ex.storeStats()
    assert(stats("map_files") == filesAfter.toLong)
    assert(stats("map_bytes") > 0)
    assert(stats("tombstones") == 0)
    assert(stats("pending_dirty_pairs") == 0)
    // And the index still updates correctly afterwards: p-2 moves CA→TX
    // (26/26 becomes 25 CA / 27 TX).
    ex.execute(spark.createDataset(Seq(Person("p-2", "TX"))))
    val after = ex.queryAll().collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(after == Map("CA" -> 25L, "TX" -> 27L))
  }
}
