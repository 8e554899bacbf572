package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the user contract (SURVEY.md §2.3.1/§5.2), checked
  * without Spark: re-reducibility `reduce(a ++ b) == reduce(reduce(a) ++
  * reduce(b))` for the shipped sample tasks, and order-insensitivity of
  * the reduce. These are the preconditions the engine's tree re-reduce
  * and the Aggregator fast path rely on.
  */
object ReReducibilityProps extends Properties("ReReducibility") {

  private def reduceFn(es: Seq[StatePop]): Seq[StatePop] =
    PeopleCountByState.reduce(es.iterator).toSeq

  private def canon(es: Seq[StatePop]): Set[StatePop] = es.toSet

  private val genEntry: Gen[StatePop] = for {
    s <- Gen.oneOf("CA", "TX", "NY", "WA", "OR")
    n <- Gen.chooseNum(1L, 1000L)
  } yield StatePop(s, n)

  private val genEntries: Gen[List[StatePop]] = Gen.listOf(genEntry)

  property("re-reducible: reduce(a++b) == reduce(reduce(a)++reduce(b))") =
    Prop.forAll(genEntries, genEntries) { (a, b) =>
      canon(reduceFn(a ++ b)) ==
        canon(reduceFn(reduceFn(a) ++ reduceFn(b)))
    }

  property("order-insensitive") =
    Prop.forAll(genEntries) { es =>
      canon(reduceFn(es)) == canon(reduceFn(es.reverse))
    }

  property("idempotent on own output") =
    Prop.forAll(genEntries) { es =>
      val once = reduceFn(es)
      canon(once) == canon(reduceFn(once))
    }
}
