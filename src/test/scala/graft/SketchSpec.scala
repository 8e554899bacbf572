package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound and merge-law pins for the sketch operators (q70-q72).
  *
  * The q71 sketch fields (Sketches.sketchProfile) have no DuckDB oracle
  * on purpose (the gated q71_corpus_profile_exact carries the exact
  * fields) — DuckDB's approx aggregates are
  * different algorithms, so cross-engine equality is meaningless. What
  * IS contractual: the estimates land within the sketches' published
  * error bounds against exact counts computed on the same data, and the
  * sketches merge associatively (the property that lets 1000 executors
  * each sketch their shard and union the results). Those are pinned
  * here.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // 20k rows over exactly 1,000 distinct tokens, skewed (tok0 hottest).
  private lazy val toks = {
    import spark.implicits._
    (0 until 20000).map(i => "tok" + (i % 1000 max i % 37)).toDF("tok").cache()
  }

  test("HLL++ and DataSketches HLL estimates within published error on 1k distinct") {
    val exact = toks.select(countDistinct(col("tok"))).head.getLong(0)
    val row = toks.agg(
      approx_count_distinct(col("tok"), 0.01) as "hllpp",
      hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)) as "hll").head
    val hllpp = row.getLong(0).toDouble
    val hll = row.getLong(1).toDouble
    assert(math.abs(hllpp - exact) / exact < 0.05, s"hllpp=$hllpp exact=$exact")
    assert(math.abs(hll - exact) / exact < 0.05, s"hll=$hll exact=$exact")
  }

  test("HLL sketches merge: per-shard sketch + union == whole-corpus estimate") {
    import spark.implicits._
    val sharded = toks.withColumn("shard", pmod(xxhash64($"tok"), lit(7)))
      .groupBy($"shard").agg(hll_sketch_agg($"tok", 12) as "sk")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")) as "est").head.getLong(0).toDouble
    val direct = toks.agg(
      hll_sketch_estimate(hll_sketch_agg($"tok", 12))).head.getLong(0).toDouble
    // Not bit-identical: a small sketch stays in exact sparse mode while
    // a union is forced into dense HLL registers — both estimates are
    // within the lgK=12 error bound of each other, which is the contract.
    assert(math.abs(sharded - direct) / direct < 0.03,
      s"union=$sharded direct=$direct — sketch union must track the single-pass sketch")
  }

  test("count-min sketch never undercounts; overcount bounded by eps * total") {
    val eps = 0.001
    val cmsBytes = toks.agg(
      count_min_sketch(col("tok"), lit(eps), lit(0.99), lit(42))).head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes))
    val exact = toks.groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    for ((tok, n) <- exact.take(50)) {
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS undercounted $tok: $est < $n")
      assert(est <= n + (eps * total).toLong + 1, s"CMS overcount on $tok: $est vs $n")
    }
  }

  test("percentile_approx at accuracy 10000 is near-exact on doc lengths") {
    import spark.implicits._
    val lens = (1 to 10001).toDF("n")
    val p50 = lens.agg(percentile_approx($"n", lit(0.5), lit(10000))).head.getInt(0)
    assert(math.abs(p50 - 5001) <= 2, s"p50=$p50")
  }

  test("q71 profile: estimates consistent with exact vocabulary per source") {
    val prof = graft.ops.Sketches.sketchProfile(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("vocab_hllpp"), r.getAs[Long]("vocab_hll"))).toMap
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(split(col("text"), "\\s+")) as "tok")
      .groupBy(col("source")).agg(countDistinct(col("tok")) as "v")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("v")).toMap
    assert(prof.keySet == exact.keySet)
    for ((src, v) <- exact) {
      val (hllpp, hll) = prof(src)
      assert(math.abs(hllpp - v).toDouble / v < 0.05, s"$src hllpp=$hllpp exact=$v")
      assert(math.abs(hll - v).toDouble / v < 0.05, s"$src hll=$hll exact=$v")
    }
  }

  test("q75 int8 quantization: worst-case reconstruction error within scale/2") {
    val rows = SparkEntry.queries("q75_embedding_quantize")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val scale = (r.getAs[Double]("vmax") - r.getAs[Double]("vmin")) / 255.0
      val err = r.getAs[Double]("max_err")
      assert(err <= scale / 2 * (1 + 1e-9) + 1e-12,
        s"mid-rise bound violated for vec ${r.get(0)}: err=$err scale=$scale")
    }
  }

  test("q70 bloom prefilter appears in the plan, before the exact join") {
    val p = SparkEntry.queries("q70_bloom_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom prefilter in plan:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), "exact verify join should broadcast the eval side")
  }

  test("q72 salted join avoids broadcast and distributes hot keys across salts") {
    val p = SparkEntry.queries("q72_salted_skew_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastHashJoin"), "salting demo must not silently broadcast")
  }

  test("SpaceSaving: exact when the vocabulary fits the counters") {
    import graft.ops.Sketches.SpaceSaving
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"t$i")
    val stream = (0 until 20000).map(_ => vocab(rnd.nextInt(vocab.size)))
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // Partitioned build + merge, vocab (40) < k (64): no eviction
    // anywhere, floors are 0, the merged summary IS the group-by.
    val parts = stream.grouped(2500).map(g => SpaceSaving.of(64, g.iterator)).toSeq
    val merged = parts.reduceLeft((a, b) => a.merge(b))
    val got = {
      val b = Map.newBuilder[String, (Long, Long)]
      merged.entries.forEach((t, ce) => b += (t -> ce))
      b.result()
    }
    assert(got.view.mapValues(_._1).toMap == truth)
    assert(got.values.forall(_._2 == 0L), "no overestimate in the exact regime")
  }

  test("SpaceSaving: approximate regime keeps true <= est <= true + err " +
      "and surfaces the hot tokens") {
    import graft.ops.Sketches.SpaceSaving
    val rnd = new scala.util.Random(7)
    // Zipf-ish: 5 hot tokens own most of the stream, a 500-token tail
    // forces constant eviction at k = 64.
    val stream = (0 until 60000).map { _ =>
      if (rnd.nextInt(10) < 6) s"hot${rnd.nextInt(5)}"
      else s"cold${rnd.nextInt(500)}"
    }
    val truth = stream.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }.withDefaultValue(0L)
    def check(merged: SpaceSaving): Unit = {
      var hotSeen = 0
      merged.entries.forEach { (t, ce) =>
        val (est, err) = ce
        assert(truth(t) <= est, s"$t: est $est under true ${truth(t)}")
        assert(est - err <= truth(t),
          s"$t: est $est - err $err exceeds true ${truth(t)}")
        if (t.startsWith("hot")) hotSeen += 1
      }
      assert(hotSeen == 5, s"all hot tokens must survive, saw $hotSeen")
    }
    val parts = stream.grouped(7500).map(g => SpaceSaving.of(64, g.iterator)).toVector
    check(parts.reduceLeft((a, b) => a.merge(b)))
    // The merge law is order-insensitive in its GUARANTEES (estimates
    // may differ; the bounds and the heavy survivors may not).
    check(parts.reverse.reduceLeft((a, b) => a.merge(b)))
  }
}
