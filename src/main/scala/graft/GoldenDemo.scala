package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.Executer

/** Console demo of the updatable persistent index — the reference's
  * `Program.Main` scenario (`MapReduce/Program.cs:13-45`) end-to-end:
  * build 397 CA + 256 TX, query, re-submit `people-30` as TX, re-query,
  * and check the total-population invariant.
  */
object GoldenDemo {
  case class Person(id: String, state: String)
  case class StatePop(state: String, count: Long)

  object PeopleCountByState extends core.MapReduceTask[Person, StatePop] {
    def map(docs: Iterator[Person]): Iterator[(String, StatePop)] =
      docs.map(p => (p.id, StatePop(p.state, 1L)))
    def reduce(entries: Iterator[StatePop]): Iterator[StatePop] =
      entries.toSeq.groupBy(_.state)
        .map { case (s, es) => StatePop(s, es.map(_.count).sum) }.iterator
    def reduceKey(e: StatePop): String = e.state
    override def singleOutput: Boolean = true
    def documentId(p: Person): String = p.id
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-golden-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // With an existing store path as argument: re-open and query only —
    // demonstrates persistence across processes (the reference's Query
    // works at any time without re-running the job, Executer.cs:370-377).
    if (args.nonEmpty) {
      val ex0 = new Executer(PeopleCountByState, args(0))
      println(s"re-opened ${args(0)}: CA=${ex0.query("CA").collect().toSeq} " +
        s"TX=${ex0.query("TX").collect().toSeq}")
      spark.stop()
      return
    }

    val store = Files.createTempDirectory("graft-demo").toString
    println(s"index store: $store")
    val ex = new Executer(PeopleCountByState, store)

    val people =
      (1 to 397).map(i => Person(s"people-$i", "CA")) ++
      (398 to 653).map(i => Person(s"people-$i", "TX"))
    ex.execute(spark.createDataset(people))
    println(s"build stats:  ${ex.lastStats.getOrElse("?")}")
    val ca0 = ex.query("CA").collect().toSeq
    val tx0 = ex.query("TX").collect().toSeq
    println(s"after build:  CA=$ca0 TX=$tx0")
    val total0 = (ca0 ++ tx0).map(_.count).sum

    // people-30 moves to TX (update = delete + insert).
    val vPre = ex.snapshotVersion()
    ex.execute(spark.createDataset(Seq(Person("people-30", "TX"))))
    println(s"update stats: ${ex.lastStats.getOrElse("?")}")
    val ca1 = ex.query("CA").collect().toSeq
    val tx1 = ex.query("TX").collect().toSeq
    println(s"after update: CA=$ca1 TX=$tx1")
    val total1 = (ca1 ++ tx1).map(_.count).sum

    println(s"total before=$total0 after=$total1 " +
      (if (total0 == total1 && total1 == 653) "INVARIANT HOLDS" else "INVARIANT BROKEN"))

    // Writable time travel (round 13): roll back to the pre-update
    // generation — one manifest write, generations still moving forward
    // — then land the update again so the demo (and the re-open probe)
    // ends at the canonical post-update state.
    ex.rollbackTo(vPre)
    println(s"after rollback($vPre): CA=${ex.query("CA").collect().toSeq} " +
      s"TX=${ex.query("TX").collect().toSeq}")
    val rbOk = ex.query("CA").collect().toSeq == ca0 &&
      ex.query("TX").collect().toSeq == tx0
    println(if (rbOk) "ROLLBACK RESTORED THE PRE-UPDATE GENERATION"
            else "ROLLBACK DIVERGED")
    ex.execute(spark.createDataset(Seq(Person("people-30", "TX"))))
    // The re-landed update must reproduce the first update's state
    // exactly — without this check a divergent second apply would still
    // exit 0 on rbOk + the pre-rollback ca1/tx1 (ADVICE r13).
    val relandOk = ex.query("CA").collect().toSeq == ca1 &&
      ex.query("TX").collect().toSeq == tx1
    println(if (relandOk) "RE-LANDED UPDATE MATCHES THE FIRST APPLY"
            else "RE-LANDED UPDATE DIVERGED")
    println("missing key query('ZZ') -> " + ex.query("ZZ").collect().toSeq)
    println(s"store stats:  ${ex.storeStats().toSeq.sorted.mkString(", ")}")
    println(s"contributors('TX') sample: " +
      ex.contributors("TX").limit(3).collect().map(_.getString(0)).sorted.toSeq)
    // Maintained state through plain SQL (round 6): views refresh after
    // every mutation, so SQL clients always read current state.
    ex.registerStore("people_by_state")
    println("SQL view: " + spark.sql(
      "SELECT reduce_key, count FROM people_by_state ORDER BY reduce_key")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))
    // The engine-free external read (round 14): what a vanilla Spark
    // client with no Executer sees of the same store, via the published
    // manifest recipe — must equal the engine's own state.
    val extRead = graft.sources.StoreReader.finals(spark, store)
      .orderBy("reduce_key").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(2)}").toSeq
    println("external read: " + extRead.mkString(" "))
    val extOk = extRead == Seq("CA=396", "TX=257")
    spark.stop()
    if (!(total0 == total1 && total1 == 653 && rbOk && relandOk && extOk &&
        ca1 == Seq(StatePop("CA", 396)) && tx1 == Seq(StatePop("TX", 257))))
      sys.exit(1)
  }
}
