package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.core.{Executer, ExecuterConfig}

/** The ManifestChurnProps adversarial schedule replayed against a
  * DELTA-maintained store (`DeltaCountByState` declares the abelian
  * group, so post-build ingests run `rereduceDelta`, not sibling
  * recompute). This is the interleaving coverage `DeltaUpdateSpec`'s
  * scripted cases cannot give: deltas mixed with `deleteDocuments`,
  * `delete(key)`, `compact()`, `reshapeTo`, and the crashed-batch
  * recovery shape (conservative WAL + orphan file), all against ONE
  * long-lived accumulating store checked per-schedule against a
  * from-scratch model. The ingest generator also deals SKIP docs —
  * zero-entry documents whose re-submission must RETRACT the old
  * contribution through the delta's negate path and add nothing. */
object DeltaChurnProps extends Properties("DeltaChurn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val NumIds = 40
  // Index `states.size` (out of range of the vector) encodes SKIP.
  private val states = Vector("CA", "TX", "WA", "NV", "OR")

  private sealed trait Op
  private case class Ingest(docs: List[(Int, Int)]) extends Op
  private case class PurgeDocs(ids: List[Int]) extends Op
  private case class DeleteKey(state: Int) extends Op
  private case object Compact extends Op
  private case object CrashRecover extends Op
  private case object Reshape extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for {
      n <- Gen.chooseNum(1, 8)
      docs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0, NumIds - 1), Gen.chooseNum(0, states.size)))
    } yield Ingest(docs)),
    2 -> (for {
      n <- Gen.chooseNum(1, 5)
      ids <- Gen.listOfN(n, Gen.chooseNum(0, NumIds - 1))
    } yield PurgeDocs(ids)),
    1 -> Gen.chooseNum(0, states.size - 1).map(DeleteKey),
    1 -> Gen.const(Compact),
    1 -> Gen.const(Reshape),
    2 -> Gen.const(CrashRecover))

  private val genSchedule: Gen[List[Op]] =
    Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, genOp))

  implicit private lazy val spark: org.apache.spark.sql.SparkSession =
    TestSpark.spark
  private var store = TestTmp.dir("graft-dchurn")
  private def cfgA = ExecuterConfig(fanIn = 4, finalParts = 2,
    manifestRetention = 1, manifestGraceMs = 0L)
  private def cfgB = ExecuterConfig(fanIn = 8, finalParts = 4,
    manifestRetention = 1, manifestGraceMs = 0L)
  private lazy val ex0 = new Executer(DeltaCountByState, store, cfgA)
  private var exOpt: Option[Executer[Person, StatePop]] = None
  private def ex: Executer[Person, StatePop] =
    exOpt.getOrElse { exOpt = Some(ex0); ex0 }
  private var reshapes = 0
  private var orphanSeq = 0
  // id -> state; SKIP means "present as a document, contributes nothing".
  private val model = collection.mutable.Map[String, String]()

  private def docId(i: Int) = s"doc-$i"

  private def run(op: Op): Unit = {
    import spark.implicits._
    op match {
      case Ingest(docs) =>
        val effective = docs.map { case (i, s) =>
          Person(docId(i), if (s == states.size) "SKIP" else states(s))
        }.groupBy(_.id).map(_._2.last).toSeq
        effective.foreach(p => model(p.id.toUpperCase) = p.state)
        val batch = spark.createDataset(effective)
        ex.execute(if (effective.size % 2 == 0) batch else batch.repartition(2))
      case PurgeDocs(ids) =>
        val names = ids.distinct.map(docId)
        names.foreach(n => model.remove(n.toUpperCase))
        ex.deleteDocuments(names)
      case DeleteKey(s) =>
        model.filterInPlace((_, st) => st != states(s))
        ex.delete(states(s))
      case Compact =>
        ex.compact()
      case Reshape =>
        if (new java.io.File(s"$store/map_results").isDirectory) {
          reshapes += 1
          val dst = TestTmp.dir("graft-dchurn-rs") + "/s"
          exOpt = Some(ex.reshapeTo(dst, if (reshapes % 2 == 1) cfgB else cfgA))
          store = dst
        }
      case CrashRecover =>
        // Same crashed-manifest-batch shape as ManifestChurnProps:
        // surviving conservative WAL + orphan file. Recovery replays the
        // WAL through the RECOMPUTE path even though the task declares
        // deltas — the group laws make the results equal, which this
        // property then actually checks against the model.
        val mapDir = new java.io.File(s"$store/map_results")
        val parentDirs =
          if (mapDir.isDirectory)
            mapDir.listFiles().filter(_.getName.startsWith("parent="))
          else Array.empty[java.io.File]
        if (parentDirs.nonEmpty) {
          val dir = parentDirs(scala.util.Random.nextInt(parentDirs.length))
          orphanSeq += 1
          dir.listFiles().find(_.getName.endsWith(".parquet")).foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              dir.toPath.resolve(s"part-orphan-$orphanSeq-${f.getName}"))
          }
          val pairs = ex.queryAll().collect().map(_.getString(0)).flatMap { k =>
            (0 until 4).map(p => (k, p))
          }
          val out = new java.io.DataOutputStream(
            java.nio.file.Files.newOutputStream(
              java.nio.file.Paths.get(store).resolve("dirty.pairs")))
          out.writeInt(pairs.length)
          pairs.foreach { case (k, p) => TestTmp.writeStr(out, k); out.writeInt(p) }
          out.close()
          java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(store).resolve(".dirty.pairs.crc"))
        }
        ex.recover()
    }
  }

  property("random op interleavings ≡ from-scratch recompute (delta store)") =
    Prop.forAll(genSchedule) { sched =>
      sched.foreach(run)
      val got = ex.queryAll().collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      val want = model.values.filter(_ != "SKIP").groupBy(identity)
        .map { case (s, xs) => (s, xs.size.toLong) }
      val ok = got == want
      if (!ok) println(s"DELTA CHURN DIVERGENCE: schedule=$sched got=$got want=$want")
      ok
    }
}
