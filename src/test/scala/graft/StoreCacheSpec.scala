package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Executer, ExecuterConfig}
import graft.ops.StoreCache

/** The cross-run shared-store disk cache's staleness and race contracts
  * (VERDICT r10 #6 / ADVICE r10): a store-config change must invalidate
  * an entry WITHOUT a manual version bump, a swept-mid-restore entry
  * must fall back to a cold build (never fail the run), and a restored
  * store must answer queries identically to the fresh build it cloned. */
class StoreCacheSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def withCacheOn[A](f: => A): A = {
    val was = StoreCache.isEnabled
    StoreCache.enable()
    try f finally if (!was) StoreCache.disable()
  }

  /** A fake "SF dir" (the fingerprint source) + a fake store payload. */
  private def fixtures(tag: String): (String, String) = {
    val sf = TestTmp.dir(s"graft-sc-sf-$tag")
    Files.write(Paths.get(sf, "t.parquet"), Array[Byte](1, 2, 3))
    val store = TestTmp.dir(s"graft-sc-store-$tag")
    Files.write(Paths.get(store, "data"), Array[Byte](9, 9))
    (sf, store)
  }

  test("a store-config change (the extra key) invalidates the entry " +
      "without a manual version bump") {
    withCacheOn {
      val (sf, store) = fixtures("cfg")
      StoreCache.save("spec-cfg", sf, store, 7L, extra = "fanIn=4")
      assert(StoreCache.isCached("spec-cfg", sf, extra = "fanIn=4"))
      assert(!StoreCache.isCached("spec-cfg", sf, extra = "fanIn=8"),
        "an entry saved under one config must not serve another")
      // Saving under the NEW config replaces the stale entry.
      StoreCache.save("spec-cfg", sf, store, 8L, extra = "fanIn=8")
      assert(StoreCache.isCached("spec-cfg", sf, extra = "fanIn=8"))
      assert(!StoreCache.isCached("spec-cfg", sf, extra = "fanIn=4"))
      val dest = TestTmp.dir("graft-sc-dest-cfg")
      assert(StoreCache.restore("spec-cfg", sf, dest, extra = "fanIn=8")
        .contains(8L))
    }
  }

  test("restore of a swept/corrupt entry cleans the partial dest and " +
      "falls back to a cold build (returns None)") {
    withCacheOn {
      val (sf, store) = fixtures("race")
      StoreCache.save("spec-race", sf, store, 1L)
      // Simulate a concurrent process's save() sweep landing mid-restore:
      // the entry passes isCached, then its payload vanishes. Match THIS
      // run's sf-dir name exactly — a previous run's gutted entry under
      // the same tag (different temp sf name) must not be picked up.
      val sfName = Paths.get(sf).getFileName.toString
      val parent = Paths.get(System.getProperty("java.io.tmpdir"))
      val entry = Files.list(parent).toArray.map(_.toString)
        .filter(_.contains(s"graft-store-spec-race-$sfName-")).head
      Files.delete(Paths.get(entry, "_GRAFT_META"))
      val dest = s"${TestTmp.dir("graft-sc-race-parent")}/dest"
      assert(StoreCache.restore("spec-race", sf, dest).isEmpty)
      assert(!Files.exists(Paths.get(dest)),
        "a failed restore must not strand a partial store at the dest")
    }
  }

  test("a restored Executer store answers identically to the fresh " +
      "build it cloned") {
    withCacheOn {
      val sf = TestTmp.dir("graft-sc-sf-exec")
      Files.write(Paths.get(sf, "t.parquet"), Array[Byte](4, 5))
      val cfg = ExecuterConfig(fanIn = 4, finalParts = 2)
      val extra = s"${PeopleCountSingle.getClass.getName}:4:2"
      val fresh = TestTmp.dir("graft-sc-exec-fresh")
      val (meta, restored) =
        StoreCache.orBuild("spec-exec", sf, fresh, extra) { dst =>
          val ex = new Executer(PeopleCountSingle, dst, cfg)
          ex.execute(spark.createDataset(Seq(
            Person("a", "CA"), Person("b", "CA"), Person("c", "TX"))))
          ex.snapshotVersion()
        }
      assert(!restored)
      val dest = TestTmp.dir("graft-sc-exec-restored")
      val got = StoreCache.restore("spec-exec", sf, dest, extra)
      assert(got.contains(meta))
      def rows(p: String) =
        new Executer(PeopleCountSingle, p, cfg).queryAll()
          .as[(String, String, Long)].collect().toSet
      assert(rows(dest) == rows(fresh))
      assert(rows(dest) == Set(("CA", "CA", 2L), ("TX", "TX", 1L)))
    }
  }
}
