package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.core.{Executer, ExecuterConfig}

/** Adversarial churn property (VERDICT r3 #8, generalizing SoakSpec's
  * fixed script): random interleavings of every mutating entry point —
  * `execute` (insert/update mixes), `deleteDocuments`, `delete(key)`,
  * `compact()`, and a simulated crash (stranded swap dir + conservative
  * dirty WAL) followed by `recover()` — applied to ONE long-lived store
  * shared across all generated schedules, each schedule checked against
  * an in-memory from-scratch model. 100+ schedules means several
  * hundred operations over accumulating state; any missed invalidation,
  * resurrected tombstone, or botched swap surfaces as a divergence in
  * the schedule where it happened (ScalaCheck then shrinks it).
  *
  * The doc-id universe is deliberately small (40 ids, 5 keys) so
  * generated updates, purges, and deletes constantly collide with
  * existing state — the adversarial part.
  */
object ChurnProps extends Properties("Churn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(100)

  private val NumIds = 40
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
        Gen.zip(Gen.chooseNum(0, NumIds - 1), Gen.chooseNum(0, states.size - 1)))
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

  // One store, one model, shared across every generated schedule —
  // later schedules run against whatever state earlier ones built up.
  implicit private lazy val spark: org.apache.spark.sql.SparkSession =
    TestSpark.spark
  // LEGACY (listing+seqlock+trash) layout throughout: the CrashRecover op
  // below simulates the legacy swap's stranded-.trash window, which a
  // manifest store cannot produce (its swaps never move live files).
  // ManifestChurnProps runs the same adversarial schedule against the
  // manifest layout with its own crash shape.
  private var store = TestTmp.dir("graft-churn")
  private lazy val ex0 = new Executer(PeopleCountByState, store,
    ExecuterConfig(fanIn = 4, finalParts = 2, manifests = false))
  private var exOpt: Option[Executer[Person, StatePop]] = None
  private def ex: Executer[Person, StatePop] = exOpt.getOrElse { exOpt = Some(ex0); ex0 }
  // Reshape alternates between two layouts, so later schedules churn a
  // store whose tree shape differs from the one they started with.
  private var reshapes = 0
  private val model = collection.mutable.Map[String, String]() // id -> state

  private def docId(i: Int) = s"doc-$i"

  private def run(op: Op): Unit = {
    import spark.implicits._
    op match {
      case Ingest(docs) =>
        // Last occurrence wins within a batch (update semantics).
        val effective = docs.map { case (i, s) => Person(docId(i), states(s)) }
          .groupBy(_.id).map(_._2.last).toSeq
        effective.foreach(p => model(p.id.toUpperCase) = p.state)
        // Alternate the batch's plan shape: a LocalRelation batch takes
        // the driver-local probe fast path, a repartitioned one the
        // cluster-side probes — both must produce identical state.
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
        // Migration mid-churn: results must survive a layout change and
        // every later op must behave identically on the migrated store
        // (seq continuity: updates must still kill pre-reshape rows).
        // No-op before the first build — nothing to reshape.
        if (new java.io.File(s"$store/map_results").isDirectory) {
          reshapes += 1
          val cfg =
            if (reshapes % 2 == 1)
              ExecuterConfig(fanIn = 8, finalParts = 4, manifests = false)
            else ExecuterConfig(fanIn = 4, finalParts = 2, manifests = false)
          val dst = TestTmp.dir("graft-churn-rs") + "/s"
          exOpt = Some(ex.reshapeTo(dst, cfg))
          store = dst
        }
      case CrashRecover =>
        // Simulate the two documented crash windows an interrupted batch
        // can leave behind: a map partition stranded mid-swap in .trash,
        // plus a surviving conservative dirty WAL naming every live
        // (key, parent) pair. recover() must repair both.
        val mapDir = new java.io.File(s"$store/map_results")
        if (mapDir.isDirectory &&
            mapDir.listFiles().exists(_.getName.startsWith("parent="))) {
          // Conservative WAL naming every live pair — captured BEFORE the
          // stranding so the stranded parent's keys are marked dirty too.
          val pairs = spark.read.parquet(s"$store/map_results")
            .select("reduce_key", "parent").distinct().collect()
            .map(r => (r.getString(0), r.getInt(1)))
          val parents = mapDir.listFiles().filter(_.getName.startsWith("parent="))
          val victim = parents(scala.util.Random.nextInt(parents.length))
          val trash = new java.io.File(s"$store/map_results.trash")
          trash.mkdirs()
          java.nio.file.Files.move(victim.toPath,
            trash.toPath.resolve(victim.getName))
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

  property("random op interleavings ≡ from-scratch recompute") =
    Prop.forAll(genSchedule) { sched =>
      sched.foreach(run)
      val got = ex.queryAll().collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      val want = model.values.groupBy(identity)
        .map { case (s, xs) => (s, xs.size.toLong) }
      val ok = got == want
      if (!ok) println(s"CHURN DIVERGENCE: schedule=$sched got=$got want=$want")
      ok
    }
}
