package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`) — north-star extension.
  *
  * Math is done with codegen'd higher-order functions (`zip_with` +
  * `aggregate`), element-wise in array order with double accumulation, so
  * the result is bit-deterministic and reproducible in the DuckDB oracle
  * (same fold order). No UDFs.
  *
  * Scale path: the brute-force form is an O(Q·N) cross join — correct as
  * a baseline and for re-ranking; `q32_ann_lsh` is the 100 TB form:
  * random-hyperplane (SimHash) bucketing so candidate generation is an
  * equi-join on the bucket signature, shuffling only same-bucket pairs.
  */
object EmbeddingOps {

  /** Σ aᵢ·bᵢ with double accumulation in array order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplanes for SimHash bucketing:
    * plane p component i = hash-derived value in [-1, 1], identical in
    * any engine that can evaluate the closed form. We use
    * sin(9973·(p·64 + i)) which is deterministic IEEE double math. */
  private def hyperplaneBit(e: Column, p: Int, dim: Int): Column = {
    val proj = aggregate(
      zip_with(e,
        transform(sequence(lit(0), lit(dim - 1)),
          i => sin((i + lit(p * dim)) * lit(9973.0))),
        (x, h) => x.cast("double") * h),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: the correctness baseline for ANN.
    "q30_knn_bruteforce" -> { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" < 8)
        .select($"vec_id" as "query_id", $"embedding" as "qe")
      val c = e.select($"vec_id" as "neighbor_id", $"embedding" as "ce")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos".desc, $"neighbor_id".asc)
      q.crossJoin(c)
        .where($"query_id" =!= $"neighbor_id")
        .withColumn("cos", cosine($"qe", $"ce"))
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 5)
        .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    },

    // Embedding near-duplicate detection: unordered pairs above a cosine
    // threshold (the "embedding-cosine near-dup" dedup family).
    "q31_embedding_neardup" -> { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val a = e.select($"vec_id" as "id_a", $"embedding" as "ea", $"label" as "label_a")
      val b = e.select($"vec_id" as "id_b", $"embedding" as "eb")
      a.join(b, $"id_a" < $"id_b")
        .withColumn("cos", cosine($"ea", $"eb"))
        .where($"cos" > 0.9)
        .select($"id_a", $"id_b", $"label_a", $"cos")
    },

    // SimHash / random-hyperplane signature: the LSH bucketing that turns
    // near-dup search into an equi-join at scale.
    "q32_ann_lsh_signature" -> { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val dim = 64
      val sig = (0 until 8).map(p => hyperplaneBit($"embedding", p, dim) * lit(1 << p))
        .reduce(_ + _)
      val sigged = e.select($"vec_id", $"label", sig as "bucket")
      // Bucket sizes — the skew diagnostic an ANN pipeline monitors.
      sigged.groupBy($"bucket").agg(
        count(lit(1)) as "n",
        min($"vec_id") as "min_id",
        max($"vec_id") as "max_id")
    })

  val oracles: Map[String, String] = Map(
    "q30_knn_bruteforce" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |d AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.e, c.e) /
        |      (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos
        |  FROM v q, v c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, rnk, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
        |  FROM d) t WHERE rnk <= 5""".stripMargin,
    "q31_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a,
        |  list_dot_product(a.e, b.e) /
        |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) /
        |  (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) > 0.9""".stripMargin,
    "q32_ann_lsh_signature" ->
      """WITH sig AS (
        |  SELECT vec_id, label,
        |    (SELECT CAST(sum(CASE WHEN
        |        (SELECT sum(e.emb * sin((e.i - 1 + p.p * 64) * 9973.0))
        |         FROM (SELECT unnest(embedding::DOUBLE[]) AS emb,
        |                      generate_subscripts(embedding, 1) AS i) e) >= 0
        |        THEN power(2, p.p) ELSE 0 END) AS INT)
        |     FROM (SELECT unnest(generate_series(0, 7)) AS p) p) AS bucket
        |  FROM embeddings)
        |SELECT bucket, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM sig GROUP BY bucket""".stripMargin
  )
}
