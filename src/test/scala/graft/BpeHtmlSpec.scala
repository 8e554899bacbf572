package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Round-7 operators: BPE token accounting (corpus-learned merge
  * table since r8, Sennrich et al. 2016 application order) and HTML
  * boilerplate extraction. The encode pins assert exact token counts through the
  * ENGINE's own expression chain (Spark SQL evaluation, not a JVM
  * reimplementation), so the spec pins precisely what production
  * evaluates; DuckDB-side agreement is the driver's oracle gate. */
class BpeHtmlSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def count(word: String): Int = {
    val safe = word.replace("'", "")
    spark.sql(s"SELECT ${Bpe.tokenCountSql(s"'$safe'")}")
      .collect()(0).getInt(0)
  }

  test("BPE encode: merges apply in learned order and compose") {
    // j+o → jo, then jo+in → join: the later merge consumes the
    // earlier one's output — application order is the defining BPE
    // property the chain must preserve. Deeper compositions: hash
    // (as+h, h+ash) and customer (cu+st, cust+o, custo+mer).
    assert(count("join") == 1)
    assert(count("hash") == 1)
    assert(count("customer") == 1)
    // (a,t) fires; (c, at) is not in the table — partial merges stay.
    assert(count("cat") == 2)
    // A CORPUS word the fertility stop deliberately left split — the
    // non-degenerate subword structure BpeLearnSpec asserts globally.
    assert(count("query") == 4)
    // No merge applies at all.
    assert(count("zq") == 2)
  }

  test("BPE encode: greedy left-to-right on repeated pairs") {
    // 'ttt' has no (t,t) merge: stays 3 symbols. 'erer' merges both
    // (e,r) pairs left-to-right into two 'er' symbols (and 'ererer'
    // into three — the adjacent-pair skip the double-replace exists
    // for).
    assert(count("ttt") == 3)
    assert(count("erer") == 2)
    assert(count("ererer") == 3)
  }

  test("BPE encode: sentinel characters in input cannot forge boundaries") {
    // '~' is stripped before spelling, so a hostile word degrades to
    // its letters instead of corrupting the symbol structure.
    assert(count("t~h") == count("th"))
  }

  test("whole-text encode handles line terminators (dotall-safe spelling)") {
    // A '.'-based spelling would leave \n and \r unspelled — gluing
    // neighbors into one symbol and splitting Java/RE2 behavior on \r
    // (code-review r7). The whole-text count must equal the per-word
    // count on multi-line text.
    import spark.implicits._
    val texts = Seq("a\nb", "the\rcat", "one\n\ntwo three", "x")
    val out = texts.toDF("text")
      .selectExpr("text", s"${Bpe.docTokensSpark} AS whole")
      .as[(String, Int)].collect().toMap
    texts.foreach { t =>
      val perWord = t.split("\\s+", -1).filter(_.nonEmpty).map(count).sum
      assert(out(t) == perWord,
        s"whole-text (${out(t)}) != per-word ($perWord) on ${t.replace("\n", "\\n").replace("\r", "\\r")}")
    }
  }

  test("randomized: whole-text encode equals per-word encode on hostile text") {
    // 200 random strings over letters + every whitespace variant the
    // dialects treat differently ('\t', '\n', '\r'), the sentinel '~',
    // and multi-space runs — the generated-text guarantee behind the
    // whole-text spelling (BMP text; the corpus convention).
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, lit, sum => ssum}
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz ~\t\n\r  "
    val texts = (0 until 200).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    val whole = df.selectExpr("id", s"${Bpe.docTokensSpark} AS n")
      .as[(Int, Int)].collect().toMap
    val perWord = df
      .selectExpr("id", "explode(regexp_extract_all(text, '\\\\S+', 0)) AS w")
      .selectExpr("id", s"${Bpe.tokenCountSql("w")} AS n")
      .groupBy("id").agg(ssum("n") as "n")
      .as[(Int, Long)].collect().toMap
    texts.indices.foreach { i =>
      assert(whole(i).toLong == perWord.getOrElse(i, 0L),
        s"id=$i whole=${whole(i)} perWord=${perWord.getOrElse(i, 0L)} " +
          s"text=${texts(i).replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")}")
    }
  }

  test("q102 totals match a per-word recount on real data") {
    import spark.implicits._
    val total = SparkEntry.queries("q102_bpe_token_count")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"bpe_tokens")).as[Long].head()
    // Recount doc-by-doc through the q102b per-document scalar.
    val perDoc = SparkEntry.queries("q102b_bpe_pack")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"bpe_tokens")).as[Long].head()
    assert(total == perDoc, s"word-exploded total $total != per-doc total $perDoc")
    assert(total > 0)
  }

  test("q103 entity escaping survives markup and ampersands inside document text") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "see <nav>menu</nav> & <script>alert</script> for more"),
      (2L, "a < b > c && d"),
      (3L, "plain text"))
    val out = hostile.toDF("doc_id", "text")
      .selectExpr("text", s"${graft.ops.Html.htmlSql(duck = false)} AS html")
      .selectExpr("text",
        s"${graft.ops.Html.extractSql("html", duck = false)} AS extracted")
      .as[(String, String)].collect()
    out.foreach { case (text, extracted) =>
      assert(extracted == text,
        s"markup-bearing text must round-trip: '$text' -> '$extracted'")
    }
  }

  test("q103b funnel stages are monotone and chain docs_out -> docs_in") {
    val stages = SparkEntry.queries("q103b_extract_gate")(spark, dir)
      .orderBy("stage_no").collect()
    assert(stages.length == 3)
    stages.foreach { r =>
      assert(r.getAs[Long]("docs_out") <= r.getAs[Long]("docs_in"))
    }
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("docs_out") == b.getAs[Long]("docs_in"),
        "each stage's survivors must feed the next stage")
    }
    assert(stages(0).getAs[Long]("docs_in") > 0)
  }

  test("q103 extraction round-trips every document and is shuffle-free") {
    import spark.implicits._
    val df = SparkEntry.queries("q103_html_extract")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Entity escaping makes the round-trip exact for ANY text content
    // (markup included); the only lossy step left is extraction's
    // whitespace normalize, so the per-doc expectation is computed from
    // the text itself rather than hard-asserted — a regenerated corpus
    // with multi-space docs must not break the suite (code-review r7).
    val expected = spark.read
      .parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect().toMap
      .map { case (id, t) =>
        id -> (t == t.trim.replaceAll(" +", " ")) }
    assert(rows.forall { r =>
      r.getAs[Boolean]("recovered") == expected(r.getAs[Long]("doc_id"))
    }, "recovered must equal the single-spaced round-trip expectation")
    assert(rows.count(_.getAs[Boolean]("recovered")) > 0,
      "at least some documents must round-trip exactly")
    assert(rows.forall { r =>
      val ratio = r.getAs[Double]("content_ratio")
      ratio > 0.0 && ratio < 1.0
    })
    // The extraction is pure per-row scalar work: ZERO exchanges.
    def collectPlan[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      p.collect(pf) ++ p.collect { case a: AdaptiveSparkPlanExec => a }
        .flatMap(a => collectPlan(a.executedPlan)(pf))
    val plan = df.queryExecution.executedPlan
    assert(collectPlan(plan) { case e: ShuffleExchangeLike => e }.isEmpty,
      s"HTML extraction should be shuffle-free:\n${plan.toString.take(1200)}")
  }
}
