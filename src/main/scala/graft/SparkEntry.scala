package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Bpe, Curation, Dedup, EmbeddingOps, Html, IncrementalIndexes, IndexQueries, Multimodal, Relational, Sketches, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the north-star LLM-pipeline
  * extensions); `oracleSql` carries the exact-match DuckDB oracle for
  * each. Column names and types are aligned on both sides; money
  * aggregates go through exact decimal arithmetic so results are
  * hash-identical regardless of execution order (see
  * [[graft.ops.Tables.dec]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ Dedup.queries ++
      EmbeddingOps.queries ++ IndexQueries.queries ++
      IncrementalIndexes.queries ++ Multimodal.queries ++ Curation.queries ++
      Sketches.queries ++ Bpe.queries ++ Html.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      EmbeddingOps.oracles ++ IndexQueries.oracles ++
      IncrementalIndexes.oracles ++ Multimodal.oracles ++ Curation.oracles ++
      Sketches.oracles ++ Bpe.oracles ++ Html.oracles
}
