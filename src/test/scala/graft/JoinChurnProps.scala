package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.core.{Executer, ExecuterConfig}
import graft.streaming.JoinCdcConsumer

/** Adversarial churn property for the maintained JOIN (the ChurnProps
  * doctrine applied to [[JoinCdcConsumer]]): random interleavings of
  * both upstreams' mutating entry points — fact ingests/updates, fact
  * purges, dimension moves, dimension deletes, upstream compaction
  * (which forces the consumer past the pruning horizon into the
  * resync + stale-sweep path), and mid-schedule polls — applied to ONE
  * long-lived (left, right, downstream) trio shared across all
  * generated schedules, each schedule closed by a poll and checked
  * against an in-memory from-scratch join model. Any missed
  * invalidation on either feed, un-swept stale key, or wrong
  * inner-join verdict surfaces as a divergence in the schedule where
  * it happened (ScalaCheck then shrinks it).
  *
  * The id universes are deliberately tiny (12 fact ids, 4 join keys,
  * 3 tags) so updates, purges, and side losses constantly collide
  * with existing state. strict = true: an incremental-poll failure
  * must THROW, never be silently converged by the fallback (the
  * horizon PRE-CHECK resync stays, and the Compact ops exercise it).
  */
object JoinChurnProps extends Properties("JoinChurn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val NumFactIds = 12
  private val keys = Vector("k1", "k2", "k3", "k4")
  private val tags = Vector("red", "green", "blue")

  private sealed trait Op
  private case class IngestFacts(docs: List[(Int, Int, Long)]) extends Op
  private case class PurgeFacts(ids: List[Int]) extends Op
  private case class IngestDims(docs: List[(Int, Int)]) extends Op
  private case class PurgeDims(ks: List[Int]) extends Op
  private case object CompactLeft extends Op
  private case object CompactRight extends Op
  private case object Poll extends Op
  private case object Restart extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.chooseNum(1, 5)
      docs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, NumFactIds - 1),
        Gen.chooseNum(0, keys.size - 1), Gen.chooseNum(1L, 50L)))
    } yield IngestFacts(docs)),
    2 -> (for {
      n <- Gen.chooseNum(1, 3)
      ids <- Gen.listOfN(n, Gen.chooseNum(0, NumFactIds - 1))
    } yield PurgeFacts(ids)),
    3 -> (for {
      n <- Gen.chooseNum(1, 3)
      docs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, keys.size - 1),
        Gen.chooseNum(0, tags.size - 1)))
    } yield IngestDims(docs)),
    2 -> (for {
      n <- Gen.chooseNum(1, 2)
      ks <- Gen.listOfN(n, Gen.chooseNum(0, keys.size - 1))
    } yield PurgeDims(ks)),
    1 -> Gen.const(CompactLeft),
    1 -> Gen.const(CompactRight),
    2 -> Gen.const(Poll),
    1 -> Gen.const(Restart))

  private val genSchedule: Gen[List[Op]] =
    Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, genOp))

  implicit private lazy val spark: org.apache.spark.sql.SparkSession =
    TestSpark.spark

  private lazy val left = {
    val ex = new Executer(FactByKey, TestTmp.dir("graft-jchurn-l"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    ex.execute(spark.createDataset(Seq(FactDoc("f0", "k1", 1L)))(
      org.apache.spark.sql.Encoders.product[FactDoc]))
    factModel("F0") = ("k1", 1L)
    ex
  }
  private lazy val right = {
    val ex = new Executer(DimByKey, TestTmp.dir("graft-jchurn-r"),
      ExecuterConfig(fanIn = 4, finalParts = 2))
    ex.execute(spark.createDataset(Seq(DimDoc("k1", "red")))(
      org.apache.spark.sql.Encoders.product[DimDoc]))
    dimModel("k1") = "red"
    ex
  }
  private lazy val downDir = TestTmp.dir("graft-jchurn-d")
  private def freshConsumer() = new JoinCdcConsumer(left, right, JoinByTag,
    downDir, ExecuterConfig(fanIn = 2, finalParts = 1), strict = true)
  private var consumerOpt: Option[JoinCdcConsumer[FactSum, DimTag, TagTotal]] =
    None
  private def consumer: JoinCdcConsumer[FactSum, DimTag, TagTotal] =
    consumerOpt.getOrElse { val c = freshConsumer(); consumerOpt = Some(c); c }

  // Models keyed the way the engine sees ids (upper-cased).
  private val factModel =
    collection.mutable.Map[String, (String, Long)]() // factId -> (key, v)
  private val dimModel = collection.mutable.Map[String, String]() // key -> tag

  private def factId(i: Int) = s"F$i"

  private def run(op: Op): Unit = {
    import spark.implicits._
    op match {
      case IngestFacts(docs) =>
        val effective = docs.map { case (i, k, v) =>
          FactDoc(factId(i), keys(k), v) }.groupBy(_.id).map(_._2.last).toSeq
        effective.foreach(f => factModel(f.id.toUpperCase) = (f.k, f.v))
        left.execute(spark.createDataset(effective))
      case PurgeFacts(ids) =>
        val names = ids.distinct.map(factId)
        names.foreach(n => factModel.remove(n.toUpperCase))
        left.deleteDocuments(names)
      case IngestDims(docs) =>
        val effective = docs.map { case (k, t) => DimDoc(keys(k), tags(t)) }
          .groupBy(_.k).map(_._2.last).toSeq
        effective.foreach(d => dimModel(d.k) = d.tag)
        right.execute(spark.createDataset(effective))
      case PurgeDims(ks) =>
        val names = ks.distinct.map(keys)
        names.foreach(dimModel.remove)
        right.deleteDocuments(names.map(k => s"dim-$k"))
      case CompactLeft => left.compact()
      case CompactRight => right.compact()
      case Poll => consumer.syncOnce()
      case Restart =>
        // A fresh consumer instance over the same store must resume
        // from the durable cursor pair (the CdcChainProps restart op).
        consumerOpt = Some(freshConsumer())
    }
  }

  private def expected: Map[String, (Long, Long)] = {
    // From-scratch join of the two models: per key with >=1 fact AND a
    // dimension row, FactSum = (count, sum of v); rolled up by tag.
    val byKey = factModel.values.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    byKey.toSeq.flatMap { case (k, sum) =>
      dimModel.get(k).map(tag => (tag, sum)) }
      .groupBy(_._1)
      .map { case (t, xs) => t -> ((xs.size.toLong, xs.map(_._2).sum)) }
  }

  property("random both-side churn schedules ≡ from-scratch join") =
    Prop.forAll(genSchedule) { sched =>
      // Materialize the lazy stores BEFORE any op runs: their
      // initializers also seed the in-memory models, so a schedule
      // whose FIRST op is a purge used to remove from a still-empty
      // model and then trigger the init, which re-added the seed row
      // the store had just correctly deleted — a false divergence
      // (model wrong, engine right; found by seed
      // 50dwiF66lhq4QFM6dP2hI9OkipwgbncKuOyUSZ_343D=).
      locally { left; right }
      sched.foreach(run)
      consumer.syncOnce() // close the schedule: the downstream catches up
      val got = consumer.queryAll().collect()
        .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
      val want = expected
      val ok = got == want
      if (!ok) println(s"JOIN CHURN DIVERGENCE: schedule=$sched " +
        s"got=$got want=$want facts=$factModel dims=$dimModel")
      ok
    }
}
