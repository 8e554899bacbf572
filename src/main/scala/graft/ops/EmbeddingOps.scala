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

  /** Hot-cell cap for the hyperplane-LSH self-join — same rationale and
    * mechanism as [[Dedup.MaxBucket]]/[[Dedup.capHotBuckets]]. */
  private val MaxBucketVecs = 256

  /** Cosine threshold for [[queries q101_semantic_dedup]]. SemDeDup
    * runs web corpora at ~0.95; the synthetic embeddings are near-
    * uniform on the sphere (max in-cell cosine ≈ 0.48 at every SF), so
    * the threshold is scaled down to where the keep/drop policy
    * actually fires — production tunes one constant. */
  private val SemDedupTau = 0.35

  /** Σ aᵢ·bᵢ with double accumulation in array order — codegen'd
    * expression, bit-compatible with the HOF formulation and the oracle
    * (see [[graft.functions.DotProduct]]). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  // Hyperplane LSH signatures live in a custom codegen'd expression —
  // see graft.functions.HyperplaneBuckets (Catalyst neither
  // constant-folds nor codegens higher-order functions, so the
  // zip_with/aggregate formulation costs ~10M interpreted lambda calls
  // at sf0.1).

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: the correctness baseline for ANN — and
    // for a BOUNDED query set it is itself the scalable exact plan: the
    // 8 query vectors broadcast, so the corpus side streams through one
    // O(Q·N) pass with no shuffle of the big side (PlanSpec pins the
    // broadcast). "Weak at scale" applies only to all-pairs Q ≈ N, which
    // is q31's LSH territory. Norms are computed ONCE per vector before
    // the join (carried as a column), not per pair; the cosine formula
    // stays dot/(na*nb) so results are bit-identical to the oracle.
    "q30_knn_bruteforce" -> { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" < 8)
        .select($"vec_id" as "query_id", $"embedding" as "qe",
          norm($"embedding") as "qn")
      val c = e.select($"vec_id" as "neighbor_id", $"embedding" as "ce",
        norm($"embedding") as "cn")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos".desc, $"neighbor_id".asc)
      q.crossJoin(c)
        .where($"query_id" =!= $"neighbor_id")
        .withColumn("cos", dot($"qe", $"ce") / ($"qn" * $"cn"))
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 5)
        .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    },

    // Embedding near-duplicate detection AT SCALE: multi-table
    // random-hyperplane LSH generates candidates via an equi-join on
    // (table, bucket) — O(collisions), never the all-pairs cross join —
    // then exact cosine verifies candidates. 4 tables × 8 bits:
    // ~75% recall at cos 0.9 with ~1/64 of the brute-force work; more
    // tables buy recall linearly. The brute-force all-pairs form exists
    // as q30's cross-join machinery but cannot survive 100 TB.
    "q31_embedding_neardup" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneBuckets.hyperplaneBuckets
      val e = t(s, dir, "embeddings")
      // Signature stage: one codegen'd expression computes all 4 table
      // buckets in a single pass over the vector; repartitioned across
      // cores and materialized once for the two-sided self-join.
      val tabs = e.repartition(cpuWidth(s))
        .select($"vec_id",
          posexplode(hyperplaneBuckets($"embedding", 4, 8, 64)))
        .select($"vec_id", $"pos" as "tbl", $"col" as "bkt")
      // Cap degenerate (table, bucket) cells before the quadratic
      // self-join (see Dedup.capHotBuckets), then materialize once for
      // both sides of the join.
      val capped = Dedup.barrier(
        Dedup.capHotBuckets(tabs, Seq($"tbl", $"bkt"), MaxBucketVecs))
      val cand = capped.as("x").join(capped.as("y"),
          col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id") as "id_a", col("y.vec_id") as "id_b")
        .distinct()
      val a = e.select($"vec_id" as "id_a", $"embedding" as "ea",
        $"label" as "label_a", norm($"embedding") as "na")
      val b = e.select($"vec_id" as "id_b", $"embedding" as "eb",
        norm($"embedding") as "nb")
      cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cos", dot($"ea", $"eb") / ($"na" * $"nb"))
        .where($"cos" > 0.9)
        .select($"id_a", $"id_b", $"label_a", $"cos")
    },

    // IVF-style ANN, probe-1: vectors are coarsely quantized into cells
    // (here: the 8-bit hyperplane signature as the cell id); a query
    // searches only its own cell. The candidate join is an equi-join on
    // cell id — the inverted-file search shape that scales to arbitrary
    // corpus size (probing more cells = joining on a small cell-id
    // expansion). Brute-force q30 is the recall-100% baseline.
    "q36_ann_ivf_probe" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneBuckets.hyperplaneBuckets
      val v = t(s, dir, "embeddings")
        .repartition(cpuWidth(s))
        .select($"vec_id", $"embedding", norm($"embedding") as "nrm",
          element_at(hyperplaneBuckets($"embedding", 1, 8, 64), 1) as "cell")
        .transform(Dedup.barrier)
      val q = v.where($"vec_id" < 8)
        .select($"vec_id" as "query_id", $"embedding" as "qe",
          $"nrm" as "qn", $"cell")
      val c = v.select($"vec_id" as "neighbor_id", $"embedding" as "ce",
        $"nrm" as "cn", $"cell")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos".desc, $"neighbor_id".asc)
      q.join(c, "cell")
        .where($"query_id" =!= $"neighbor_id")
        .withColumn("cos", dot($"qe", $"ce") / ($"qn" * $"cn"))
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 3)
        .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    },

    // IVF multi-probe (probe-2): each query searches its own cell PLUS
    // the cell across its least-confident hyperplane (smallest
    // |projection margin| — the standard multi-probe LSH perturbation),
    // recovering the near-boundary neighbors probe-1 misses. Candidate
    // generation stays an equi-join on cell id: the query side just
    // explodes into 2 probe rows, so the work is ~2× probe-1, never
    // all-pairs. Probe expansion is one codegen'd pass
    // (`functions.HyperplaneProbes`).
    "q46_ann_ivf_multiprobe" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneProbes.hyperplaneProbes
      val v = t(s, dir, "embeddings")
        .repartition(cpuWidth(s))
        .select($"vec_id", $"embedding", norm($"embedding") as "nrm",
          hyperplaneProbes($"embedding", 8, 64) as "probes")
        .transform(Dedup.barrier)
      // probes(0) is the vector's own cell — the candidate side indexes
      // by it; the query side probes both cells.
      val q = v.where($"vec_id" < 8)
        .select($"vec_id" as "query_id", $"embedding" as "qe",
          $"nrm" as "qn", explode($"probes") as "cell")
      val c = v.select($"vec_id" as "neighbor_id", $"embedding" as "ce",
        $"nrm" as "cn", element_at($"probes", 1) as "cell")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos".desc, $"neighbor_id".asc)
      q.join(c, "cell")
        .where($"query_id" =!= $"neighbor_id")
        .withColumn("cos", dot($"qe", $"ce") / ($"qn" * $"cn"))
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 3)
        .select($"query_id", $"neighbor_id", $"rnk", $"cos")
    },

    // ANN recall diagnostic: the measurement that keeps an approximate
    // index honest at scale — per query, how much of the EXACT cosine
    // top-5 the IVF probe-1 and multi-probe candidate sets recover.
    // Flying blind on recall is how 100 TB ANN deployments rot: cells
    // drift as the corpus grows and nobody notices until retrieval
    // quality dives. One shared scan computes norms + probe cells; the
    // exact side is the bounded-Q broadcast pass (q30's shape), the two
    // approximate sides are cell equi-joins (q36/q46's shapes), and the
    // hit counts are two left joins on the exact top-5. Monotonicity
    // (multi-probe ⊇ probe-1 candidates ⇒ recall never lower) is
    // spec-pinned in AnnRecallSpec.
    "q73_ann_recall" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneProbes.hyperplaneProbes
      val k = 5
      val v = t(s, dir, "embeddings")
        .repartition(cpuWidth(s))
        .select($"vec_id", $"embedding", norm($"embedding") as "nrm",
          hyperplaneProbes($"embedding", 8, 64) as "probes")
        .transform(Dedup.barrier)
      val qside = v.where($"vec_id" < 8)
        .select($"vec_id" as "query_id", $"embedding" as "qe",
          $"nrm" as "qn", $"probes")
      val cside = v.select($"vec_id" as "neighbor_id", $"embedding" as "ce",
        $"nrm" as "cn", element_at($"probes", 1) as "cell")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos".desc, $"neighbor_id".asc)
      def top5(pairs: org.apache.spark.sql.DataFrame) = pairs
        .where($"query_id" =!= $"neighbor_id")
        .withColumn("cos", dot($"qe", $"ce") / ($"qn" * $"cn"))
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= k)
        .select($"query_id", $"neighbor_id")
      val exact = top5(qside.crossJoin(cside))
      val probe1 = top5(qside
        .withColumn("cell", element_at($"probes", 1)).join(cside, "cell"))
      val probe2 = top5(qside
        .withColumn("cell", explode($"probes")).join(cside, "cell"))
      exact
        .join(probe1.withColumn("h1", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .join(probe2.withColumn("h2", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy($"query_id")
        .agg(count($"h1") as "probe1_hits", count($"h2") as "multiprobe_hits")
        .select($"query_id", $"probe1_hits", $"multiprobe_hits",
          ($"probe1_hits" / lit(k.toDouble)) as "probe1_recall",
          ($"multiprobe_hits" / lit(k.toDouble)) as "multiprobe_recall")
    },

    // Per-vector int8 scalar quantization (the 4× memory lever for a
    // 100 TB embedding store): mid-rise codes over the vector's own
    // [min, max] range, with the worst-case reconstruction error
    // reported per vector so a pipeline can gate on quality before
    // swapping the fp32 column out. floor(x + 0.5) instead of round()
    // — round half-even vs half-away differs between engines; floor is
    // bit-identical everywhere, which is what makes this oracle-exact.
    "q75_embedding_quantize" -> { (s, dir) =>
      import s.implicits._
      val xd = transform($"embedding", v => v.cast("double"))
      val base = t(s, dir, "embeddings")
        .select($"vec_id", xd as "e")
        .select($"vec_id", $"e",
          array_min($"e") as "vmin", array_max($"e") as "vmax")
        .withColumn("scale", ($"vmax" - $"vmin") / lit(255.0))
      base.select($"vec_id", $"vmin", $"vmax",
        when($"scale" === 0.0, lit(0.0)).otherwise(
          array_max(transform($"e", v =>
            abs(v - ($"vmin" + floor((v - $"vmin") / $"scale" + lit(0.5)) * $"scale")))))
          as "max_err")
    },

    // Semantic dedup (the SemDeDup recipe, Abbas et al. 2023): cluster
    // the embedding space coarsely, then WITHIN each cluster drop the
    // member of every high-cosine pair that sits CLOSER to the cluster
    // centroid — keeping the lower-centroid-similarity exemplar
    // preserves diversity, which is the method's whole point (vs q31,
    // which only FINDS near-dups, and q80's keep-min-id policy). Scale
    // shape: cells from the codegen'd hyperplane signature (k-means
    // stand-in; production swaps the quantizer constant), hot cells
    // capped, the pair scan quadratic only within a ≤cap cell. The
    // centroid is the engine-wide re-reducible mean: element-wise
    // FIXED-POINT sums (floor(x·1000+0.5) as long — q91's exact form)
    // so the mean is independent of Spark's aggregation order, then one
    // deterministic array-order dot per (vector, centroid) — every
    // double on both sides of the oracle is bit-identical.
    "q101_semantic_dedup" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneBuckets.hyperplaneBuckets
      val base = t(s, dir, "embeddings")
        .repartition(cpuWidth(s))
        .select($"vec_id",
          transform($"embedding", v => v.cast("double")) as "e",
          element_at(hyperplaneBuckets($"embedding", 1, 8, 64), 1) as "cell")
      val capped = Dedup.barrier(
        Dedup.capHotBuckets(base, Seq($"cell"), MaxBucketVecs))
      // Deterministic centroid: exact long sums per (cell, dim), then
      // one division — reassembled in dim order so the dot below folds
      // in array order.
      val cent = capped.select($"cell", posexplode($"e"))
        .select($"cell", $"pos" as "d",
          floor($"col" * 1000.0 + lit(0.5)).cast("long") as "qv")
        .groupBy($"cell", $"d")
        .agg(sum($"qv") as "qs", count(lit(1)) as "n")
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"d", $"qs", $"n"))),
          x => x("qs").cast("double") / (lit(1000.0) * x("n"))) as "centroid")
      val withCc = Dedup.barrier(capped.join(cent, "cell")
        .select($"vec_id", $"cell", $"e", norm($"e") as "nrm",
          (dot($"e", $"centroid") / (norm($"e") * norm($"centroid"))) as "cc"))
      val pairs = withCc.as("x").join(withCc.as("y"),
          col("x.cell") === col("y.cell") &&
            col("x.vec_id") < col("y.vec_id"))
        .where(dot(col("x.e"), col("y.e")) /
          (col("x.nrm") * col("y.nrm")) > SemDedupTau)
        .select(col("x.vec_id") as "id_a", col("y.vec_id") as "id_b",
          col("x.cc") as "cc_a", col("y.cc") as "cc_b")
      // Pairs are built with id_a < id_b, so a cc tie deterministically
      // drops id_b (the higher id) via the otherwise-branch.
      val dropped = pairs.select(
          when($"cc_a" > $"cc_b", $"id_a").otherwise($"id_b") as "vec_id")
        .distinct().withColumn("dropme", lit(1))
      withCc.join(dropped, Seq("vec_id"), "left")
        .select($"vec_id", $"cell", $"cc" as "centroid_cos",
          $"dropme".isNull as "kept")
    },

    // SimHash / random-hyperplane signature: the LSH bucketing that turns
    // near-dup search into an equi-join at scale.
    "q32_ann_lsh_signature" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.HyperplaneBuckets.hyperplaneBuckets
      val e = t(s, dir, "embeddings")
      val sigged = e.repartition(cpuWidth(s))
        .select($"vec_id", $"label",
          element_at(hyperplaneBuckets($"embedding", 1, 8, 64), 1) as "bucket")
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
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |sig AS (
        |  SELECT vec_id, t.tbl,
        |    (SELECT CAST(sum(CASE WHEN
        |        (SELECT sum(ei.emb * sin((ei.i - 1 + (t.tbl * 8 + b.bit) * 64) * 9973.0))
        |         FROM (SELECT unnest(e) AS emb,
        |                      generate_subscripts(e, 1) AS i) ei) >= 0
        |        THEN power(2, b.bit) ELSE 0 END) AS INT)
        |     FROM (SELECT unnest(generate_series(0, 7)) AS bit) b) AS bkt
        |  FROM v, (SELECT unnest(generate_series(0, 3)) AS tbl) t),
        |capped AS (
        |  SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY tbl, bkt) AS bn FROM sig) t
        |  WHERE bn <= 256),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM capped a JOIN capped b ON a.tbl = b.tbl AND a.bkt = b.bkt
        |    AND a.vec_id < b.vec_id)
        |SELECT c.id_a, c.id_b, na.label AS label_a,
        |  list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) AS cos
        |FROM cand c
        |JOIN n na ON na.vec_id = c.id_a
        |JOIN n nb ON nb.vec_id = c.id_b
        |WHERE list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm) > 0.9""".stripMargin,
    "q36_ann_ivf_probe" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
        |    (SELECT CAST(sum(CASE WHEN
        |        (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |         FROM (SELECT unnest(e) AS emb,
        |                      generate_subscripts(e, 1) AS i) ei) >= 0
        |        THEN power(2, b.bit) ELSE 0 END) AS INT)
        |     FROM (SELECT unnest(generate_series(0, 7)) AS bit) b) AS cell
        |  FROM v),
        |d AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
        |  FROM n q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 8)
        |SELECT query_id, neighbor_id, rnk, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
        |  FROM d) t WHERE rnk <= 3""".stripMargin,
    "q46_ann_ivf_multiprobe" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT v.vec_id, b.bit,
        |    (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |     FROM (SELECT unnest(e) AS emb,
        |                  generate_subscripts(e, 1) AS i) ei) AS proj
        |  FROM v, (SELECT unnest(generate_series(0, 7)) AS bit) b),
        |n AS (
        |  SELECT v.vec_id, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm,
        |    (SELECT CAST(sum(CASE WHEN proj >= 0 THEN power(2, bit) ELSE 0 END) AS INT)
        |     FROM p WHERE p.vec_id = v.vec_id) AS cell,
        |    (SELECT bit FROM p WHERE p.vec_id = v.vec_id
        |     ORDER BY abs(proj), bit LIMIT 1) AS weak
        |  FROM v),
        |q AS (
        |  SELECT vec_id, e, nrm,
        |    unnest([cell, xor(cell, CAST(power(2, weak) AS INT))]) AS cell
        |  FROM n WHERE vec_id < 8),
        |d AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
        |  FROM q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, rnk, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
        |  FROM d) t WHERE rnk <= 3""".stripMargin,
    // Exact + probe-1 + multi-probe top-5 assembled from the q30/q36/q46
    // oracle spellings; hit counts via left joins on the exact set.
    "q73_ann_recall" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT v.vec_id, b.bit,
        |    (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |     FROM (SELECT unnest(e) AS emb,
        |                  generate_subscripts(e, 1) AS i) ei) AS proj
        |  FROM v, (SELECT unnest(generate_series(0, 7)) AS bit) b),
        |n AS (
        |  SELECT v.vec_id, v.e, sqrt(list_dot_product(v.e, v.e)) AS nrm,
        |    (SELECT CAST(sum(CASE WHEN proj >= 0 THEN power(2, bit) ELSE 0 END) AS INT)
        |     FROM p WHERE p.vec_id = v.vec_id) AS cell,
        |    (SELECT bit FROM p WHERE p.vec_id = v.vec_id
        |     ORDER BY abs(proj), bit LIMIT 1) AS weak
        |  FROM v),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
        |                 c.vec_id ASC) AS rnk
        |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 8) t WHERE rnk <= 5),
        |c1 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
        |                 c.vec_id ASC) AS rnk
        |    FROM n q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 8) t WHERE rnk <= 5),
        |qp AS (
        |  SELECT vec_id, e, nrm,
        |    unnest([cell, xor(cell, CAST(power(2, weak) AS INT))]) AS cell
        |  FROM n WHERE vec_id < 8),
        |c2 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
        |                 c.vec_id ASC) AS rnk
        |    FROM qp q JOIN n c ON q.cell = c.cell AND q.vec_id <> c.vec_id) t
        |  WHERE rnk <= 5)
        |SELECT ex.query_id,
        |  count(c1.neighbor_id) AS probe1_hits,
        |  count(c2.neighbor_id) AS multiprobe_hits,
        |  count(c1.neighbor_id) / 5.0 AS probe1_recall,
        |  count(c2.neighbor_id) / 5.0 AS multiprobe_recall
        |FROM ex
        |LEFT JOIN c1 ON ex.query_id = c1.query_id
        |  AND ex.neighbor_id = c1.neighbor_id
        |LEFT JOIN c2 ON ex.query_id = c2.query_id
        |  AND ex.neighbor_id = c2.neighbor_id
        |GROUP BY ex.query_id""".stripMargin,
    "q75_embedding_quantize" ->
      """WITH b AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_min(embedding::DOUBLE[]) AS vmin,
        |    list_max(embedding::DOUBLE[]) AS vmax
        |  FROM embeddings),
        |s AS (SELECT *, (vmax - vmin) / 255.0 AS scale FROM b)
        |SELECT vec_id, vmin, vmax,
        |  CASE WHEN scale = 0.0 THEN 0.0 ELSE
        |    list_max(list_transform(e, v ->
        |      abs(v - (vmin + floor((v - vmin) / scale + 0.5) * scale))))
        |  END AS max_err
        |FROM s""".stripMargin,
    // Cell spelling shared with q36's oracle; centroid from exact
    // fixed-point sums; parallel unnests zip (DuckDB semantics), so
    // (dim, value) pairs stay aligned.
    "q101_semantic_dedup" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |n0 AS (
        |  SELECT vec_id, e,
        |    (SELECT CAST(sum(CASE WHEN
        |        (SELECT sum(ei.emb * sin((ei.i - 1 + b.bit * 64) * 9973.0))
        |         FROM (SELECT unnest(e) AS emb,
        |                      generate_subscripts(e, 1) AS i) ei) >= 0
        |        THEN power(2, b.bit) ELSE 0 END) AS INT)
        |     FROM (SELECT unnest(generate_series(0, 7)) AS bit) b) AS cell
        |  FROM v),
        |capped AS (
        |  SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY cell) AS bn FROM n0) t
        |  WHERE bn <= $MaxBucketVecs),
        |dims AS (
        |  SELECT cell, generate_subscripts(e, 1) AS i, unnest(e) AS emb
        |  FROM capped),
        |cq AS (
        |  SELECT cell, i,
        |    sum(CAST(floor(emb * 1000.0 + 0.5) AS BIGINT)) AS qs,
        |    count(*) AS n
        |  FROM dims GROUP BY cell, i),
        |cent AS (
        |  SELECT cell, list(qs::DOUBLE / (1000.0 * n) ORDER BY i) AS centroid
        |  FROM cq GROUP BY cell),
        |cc AS (
        |  SELECT c.vec_id, c.cell, c.e,
        |    sqrt(list_dot_product(c.e, c.e)) AS nrm,
        |    list_dot_product(c.e, ct.centroid) /
        |      (sqrt(list_dot_product(c.e, c.e)) *
        |       sqrt(list_dot_product(ct.centroid, ct.centroid))) AS cc
        |  FROM capped c JOIN cent ct USING (cell)),
        |p AS (
        |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cc AS cc_a, y.cc AS cc_b
        |  FROM cc x JOIN cc y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE list_dot_product(x.e, y.e) / (x.nrm * y.nrm) > $SemDedupTau),
        |dr AS (
        |  SELECT DISTINCT CASE WHEN cc_a > cc_b
        |    THEN id_a ELSE id_b END AS vec_id FROM p)
        |SELECT cc.vec_id, cc.cell, cc.cc AS centroid_cos,
        |  dr.vec_id IS NULL AS kept
        |FROM cc LEFT JOIN dr ON cc.vec_id = dr.vec_id""".stripMargin,
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
