package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.core.{Executer, ExecuterConfig}
import graft.ops.IncrementalIndexes.{DocLen, LengthHistIndex}

/** Churn property for a MIN/MAX-merging reduce ([[LengthHistIndex]],
  * q89's task) — the retraction case ChurnProps' count-only task cannot
  * catch: when the document that OWNS a bin's minimum (or maximum) is
  * purged or re-ingested at a different length, the surviving value
  * cannot be recovered by decrementing — only the engine's
  * delete-and-invalidate + sibling re-reduce from surviving map outputs
  * produces it. Random interleavings of execute / deleteDocuments /
  * delete(key) / compact over one long-lived store, checked against an
  * in-memory model after every schedule.
  *
  * The universe is small (30 ids, 3 sources, token counts spanning 3
  * bins) so updates constantly move docs across bins and collide on
  * bin extrema.
  */
object HistChurnProps extends Properties("HistChurn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val NumIds = 30
  private val sources = Vector("web", "books", "code")
  // Token counts across 3 bins (bin = toks/16): 2..47.
  private val tokChoices = Vector(2, 7, 15, 16, 20, 31, 32, 40, 47)

  private sealed trait Op
  private case class Ingest(docs: List[(Int, Int, Int)]) extends Op
  private case class PurgeDocs(ids: List[Int]) extends Op
  private case class DeleteBin(source: Int, bin: Int) extends Op
  private case object Compact extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for {
      n <- Gen.chooseNum(1, 6)
      docs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, NumIds - 1),
        Gen.chooseNum(0, sources.size - 1),
        Gen.chooseNum(0, tokChoices.size - 1)))
    } yield Ingest(docs)),
    2 -> (for {
      n <- Gen.chooseNum(1, 4)
      ids <- Gen.listOfN(n, Gen.chooseNum(0, NumIds - 1))
    } yield PurgeDocs(ids)),
    1 -> Gen.zip(Gen.chooseNum(0, sources.size - 1), Gen.chooseNum(0, 2))
      .map { case (s, b) => DeleteBin(s, b) },
    1 -> Gen.const(Compact))

  private val genSchedule: Gen[List[Op]] =
    Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, genOp))

  implicit private lazy val spark: org.apache.spark.sql.SparkSession =
    TestSpark.spark
  private val store = TestTmp.dir("graft-histchurn")
  private lazy val ex = new Executer(LengthHistIndex, store,
    ExecuterConfig(fanIn = 4, finalParts = 2))
  private val model = collection.mutable.Map[Long, (String, Int)]() // id -> (source, toks)

  private def text(n: Int): String = Seq.fill(n)("w").mkString(" ")

  private def run(op: Op): Unit = {
    import spark.implicits._
    op match {
      case Ingest(docs) =>
        val effective = docs.map { case (i, s, tc) =>
          DocLen(i.toLong, sources(s), text(tokChoices(tc)))
        }.groupBy(_.doc_id).map(_._2.last).toSeq
        effective.foreach(d =>
          model(d.doc_id) = (d.source, d.text.split("\\s+").length))
        val batch = spark.createDataset(effective)
        ex.execute(if (effective.size % 2 == 0) batch else batch.repartition(2))
      case PurgeDocs(ids) =>
        val names = ids.distinct.map(i => s"doc-$i")
        ids.distinct.foreach(i => model.remove(i.toLong))
        ex.deleteDocuments(names)
      case DeleteBin(s, b) =>
        // Full-key delete removes the bin row AND its contributing map
        // entries — the model drops every doc currently in that bin.
        model.filterInPlace { case (_, (src, toks)) =>
          !(src == sources(s) && toks / 16 == b)
        }
        ex.delete(s"${sources(s)}|$b")
      case Compact =>
        ex.compact()
    }
  }

  property("min/max bins survive random churn ≡ from-scratch recompute") =
    Prop.forAll(genSchedule) { sched =>
      sched.foreach(run)
      val got = ex.queryAll()
        .select("source", "len_bin", "docs", "tokens", "min_toks", "max_toks")
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
      val want = model.values.groupBy { case (src, toks) => (src, toks.toLong / 16) }
        .map { case (k, xs) =>
          val ts = xs.map(_._2)
          (k, (ts.size.toLong, ts.map(_.toLong).sum, ts.min, ts.max))
        }
      val ok = got == want
      if (!ok) println(s"HIST CHURN DIVERGENCE: schedule=$sched\n got=$got\n want=$want")
      ok
    }
}
