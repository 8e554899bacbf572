package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency — cheap meta-pins that catch the classic
  * drift bugs before the driver's gate does: a query added without its
  * oracle (silently downgraded to a rows-only check), an oracle for a
  * query that no longer exists (gate failure), or two ops modules
  * registering the same name (silent map overwrite — last import wins). */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracles: $noOracle — none are sanctioned since r15 " +
        "(the sketch fields live spec-only in Sketches.sketchProfile; " +
        "SketchSpec pins their bounds)")
  }

  test("no orphan oracles") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no module registers a name another module already claimed") {
    import graft.ops._
    val modules = Seq(
      "Relational" -> Relational.queries.keySet,
      "TextOps" -> TextOps.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "EmbeddingOps" -> EmbeddingOps.queries.keySet,
      "IndexQueries" -> IndexQueries.queries.keySet,
      "IncrementalIndexes" -> IncrementalIndexes.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "Curation" -> Curation.queries.keySet,
      "Sketches" -> Sketches.queries.keySet,
      "Bpe" -> Bpe.queries.keySet,
      "Html" -> Html.queries.keySet)
    val dups = modules.combinations(2).flatMap {
      case Seq((a, as), (b, bs)) => (as & bs).map(n => s"$n ($a & $b)")
    }.toSeq
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    assert(modules.map(_._2.size).sum == SparkEntry.queries.size)
  }
}
