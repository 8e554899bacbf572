package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational query surface over the results-as-DataFrame layer.
  *
  * The reference engine has none of these operators (SURVEY.md §2.2 —
  * joins, windows, sorts, set ops, scalar functions are all ABSENT as
  * engine ops); they become available the moment index results and source
  * tables are DataFrames. Each query here exercises one Spark operator
  * class, is fully declarative (Catalyst does pushdown/pruning/join
  * selection), and has an exact DuckDB oracle.
  *
  * Scale notes: small dimensions (`region`, `nation`, `customer`,
  * `supplier`) are explicitly `broadcast()`; fact-fact joins shuffle on
  * their keys and survive a 1000-executor scale-up; aggregates are
  * partial+final by construction.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // P2/P15 family: grouped re-reducible aggregation (TPC-H Q1 shape).
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity") as "sum_qty",
          toDouble(sum(dec($"l_extendedprice"))) as "sum_base",
          toDouble(sum(dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount"))) as "revenue",
          (sum($"l_quantity") / count(lit(1))) as "avg_qty",
          count(lit(1)) as "cnt")
    },

    "q02_orders_by_cust" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total",
          max($"o_totalprice") as "max_price",
          min($"o_totalprice") as "min_price")
    },

    "q03_cust_by_nation" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"c_acctbal"))) as "acctbal")
    },

    // Broadcast hash join: dimension side explicitly broadcast.
    "q04_join_broadcast" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total")
    },

    // Multiway join through the star schema; revenue by nation.
    "q05_join_multiway" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          toDouble(sum(dec($"l_extendedprice") * dec(lit(1.0) - $"l_discount"))) as "revenue",
          count(lit(1)) as "cnt")
    },

    // Left-semi join (EXISTS).
    "q06_semi_join" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)) as "cnt")
    },

    // Left-anti join (NOT EXISTS).
    "q07_anti_join" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment").agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"c_acctbal"))) as "acctbal")
    },

    // Ranking window: top order per customer, deterministic tie-break.
    "q08_window_rank" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    },

    // Analytic window: running sum per supplier over a unique total order.
    "q09_window_running" -> { (s, dir) =>
      import s.implicits._
      // l_quantity closes the sort: the synthetic lineitem contains
      // duplicate (orderkey, linenumber) rows, and a tie in the full
      // window order makes a running sum nondeterministic in ANY engine.
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum($"l_quantity").over(w) as "running_qty")
    },

    // Global top-k with unique tie-break.
    "q10_topk" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(20)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // Full-outer join (the join matrix's last cell): per-nation counts of
    // HIGH-BALANCE customers vs suppliers — the balance filters make the
    // two key sets asymmetric, so both null sides of the outer join are
    // actually exercised; coalesce folds them to zero.
    "q74_outer_join" -> { (s, dir) =>
      import s.implicits._
      val c = t(s, dir, "customer").where($"c_acctbal" > 9900)
        .groupBy($"c_nationkey" as "nationkey")
        .agg(count(lit(1)) as "rich_cust")
      val sup = t(s, dir, "supplier").where($"s_acctbal" > 9900)
        .groupBy($"s_nationkey" as "nationkey")
        .agg(count(lit(1)) as "rich_supp")
      c.join(sup, Seq("nationkey"), "full_outer")
        .select($"nationkey",
          coalesce($"rich_cust", lit(0L)) as "rich_cust",
          coalesce($"rich_supp", lit(0L)) as "rich_supp")
    },

    // Set operations: UNION / EXCEPT with SQL (distinct) semantics.
    "q11_setops" -> { (s, dir) =>
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val building = c.where($"c_mktsegment" === "BUILDING")
        .select($"c_custkey" as "custkey")
      val machinery = c.where($"c_mktsegment" === "MACHINERY")
        .select($"c_custkey" as "custkey")
      val bigBuyers = o.groupBy($"o_custkey").agg(count(lit(1)) as "n")
        .where($"n" > 12).select($"o_custkey" as "custkey")
      building.union(machinery).distinct().except(bigBuyers)
    },

    // Grouping sets via ROLLUP (subtotal + grand-total rows).
    "q12_rollup" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          count(lit(1)) as "cnt",
          sum($"l_quantity") as "sum_qty")
    },

    // Full CUBE over two dimensions — all 4 grouping-set combinations in
    // one pass (Spark expands grouping sets inside a single shuffle, not
    // one job per set).
    "q38_cube" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderpriority", $"o_orderstatus")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total")
    },

    // Exact interpolated percentiles (sort-based `percentile`, not the
    // sketch-based approx variant — bit-identical to the oracle's
    // quantile_cont; use approx_percentile when a t-digest sketch is the
    // right scale/accuracy trade).
    "q39_percentiles" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)") as "qty_p50",
          expr("percentile(l_quantity, 0.9)") as "qty_p90",
          expr("percentile(l_extendedprice, 0.5)") as "price_p50")
    },

    // PIVOT: long-to-wide reshape with an explicit value list (the
    // bounded-cardinality form that plans as ONE aggregation — no second
    // distinct-values job, no dynamic schema at scale).
    "q55_pivot" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(toDouble(sum(dec($"o_totalprice"))))
        .select($"o_orderpriority",
          $"O" as "st_O", $"F" as "st_F", $"P" as "st_P")
    },

    // Distinct aggregation.
    "q13_distinct_agg" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey") as "n_parts",
          countDistinct($"l_suppkey") as "n_supps",
          count(lit(1)) as "cnt")
    },

    // Scalar function library: date parts, string functions.
    "q14_scalar_functions" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy(
          year($"l_shipdate") as "yr",
          month($"l_shipdate") as "mo")
        .agg(
          count(lit(1)) as "cnt",
          sum($"l_quantity") as "sum_qty")
    },

    "q15_string_functions" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "part")
        .groupBy(upper(substring($"p_name", 1, 3)) as "pfx")
        .agg(
          count(lit(1)) as "cnt",
          sum($"p_size") as "total_size",
          max(length($"p_name")) as "max_len")
    },

    // CASE expression buckets.
    "q16_case_buckets" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(
          when($"o_totalprice" < 50000, "low")
            .when($"o_totalprice" < 150000, "mid")
            .otherwise("high") as "bucket")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total")
    },

    // Semi-structured: extract from a JSON string column via regex
    // (identical semantics in Spark and DuckDB).
    "q17_json_extract" -> { (s, dir) =>
      import s.implicits._
      events(s, dir)
        .select($"event_type",
          regexp_extract($"props", "[0-9]+", 0).cast("long") as "k")
        .groupBy($"event_type")
        .agg(
          count(lit(1)) as "cnt",
          sum($"k") as "sum_k",
          max($"k") as "max_k")
    },

    // Event-time tumbling window aggregation (the batch shape of a
    // Structured Streaming windowed agg; same plan modulo the watermark).
    "q18_time_window" -> { (s, dir) =>
      import s.implicits._
      events(s, dir)
        .groupBy(
          date_trunc("hour", $"ts") as "hour",
          $"event_type")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"value"))) as "total_value",
          max($"value") as "max_value")
    },

    // Sessionization-ish per-user ordering over event time: for each
    // user, gaps between consecutive events (lag window over timestamps).
    "q19_event_gaps" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .where($"prev_ts".isNotNull)
        .select($"user_id", $"event_id",
          ($"ts".cast("long") - $"prev_ts".cast("long")) as "gap_s")
    },

    // RANGE-frame moving window: per-supplier trailing-7-day shipped
    // quantity — a value-based frame (all rows whose day falls in the
    // window), not a row-count frame like q09. The frame key is an
    // integer day number so the frame boundary is exact in both engines.
    "q63_moving_window" -> { (s, dir) =>
      import s.implicits._
      val day = datediff($"l_shipdate", lit("1970-01-01").cast("date"))
      val w = Window.partitionBy($"l_suppkey").orderBy($"day")
        .rangeBetween(-6, Window.currentRow)
      t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          $"l_quantity", day as "day")
        .withColumn("qty_7d", sum($"l_quantity").over(w))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          $"day", $"qty_7d")
    },

    // Batch sessionization, gaps-and-islands: sessions split at >30min
    // inactivity per user (the batch twin of streaming.Sessionize's
    // flatMapGroupsWithState path — one sort window + running sum, no
    // state store). Two window passes over the same (user_id) partition
    // reuse one shuffle.
    "q61_sessionization" -> { (s, dir) =>
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sessioned = events(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
        .withColumn("new_sess",
          when($"prev_ts".isNull ||
            $"ts".cast("long") - $"prev_ts".cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("sess_no", sum($"new_sess").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessioned.groupBy($"user_id", $"sess_no")
        .agg(
          min($"ts") as "session_start",
          max($"ts") as "session_end",
          count(lit(1)) as "n_events",
          toDouble(sum(dec($"value"))) as "total_value")
    },

    // AS-OF join: each purchase matched to the user's most recent
    // STRICTLY earlier click. Implemented the scalable way — union the
    // two streams, one pass of a partitioned sort window (last click
    // carried forward) — O(n log n) per user partition, no range
    // explosion; this is the sort-merge as-of strategy DuckDB's ASOF
    // JOIN uses, expressed with Spark built-ins.
    "q33_asof_join" -> { (s, dir) =>
      import s.implicits._
      val ev = events(s, dir)
      val clicks = ev.where($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", lit(1) as "is_click")
      val purchases = ev.where($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", lit(0) as "is_click")
      // At equal ts, purchases sort BEFORE clicks so a same-instant click
      // is not visible — enforcing the strict click.ts < purchase.ts.
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"is_click", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("last_click_id",
          last(when($"is_click" === 1, $"event_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when($"is_click" === 1, $"ts"), ignoreNulls = true).over(w))
        .where($"is_click" === 0 && $"last_click_id".isNotNull)
        .select($"event_id" as "purchase_id", $"user_id",
          $"last_click_id" as "click_id",
          ($"ts".cast("long") - $"last_click_ts".cast("long")) as "gap_s")
    },

    // Skew-resistant two-stage aggregation (salting): partial-aggregate
    // on (key, salt) to spread a hot key over many reducers, then merge
    // partials by key. Result is identical to a direct groupBy — that IS
    // the oracle — but no single reducer ever sees a whole hot key's
    // rows. The pattern for skewed keys at 100 TB (alongside AQE
    // skew-join splitting).
    "q35_salted_agg" -> { (s, dir) =>
      import s.implicits._
      val salted = events(s, dir)
        .withColumn("salt", pmod(hash($"event_id"), lit(16)))
        .groupBy($"user_id", $"salt")
        .agg(
          count(lit(1)) as "pcnt",
          sum(dec($"value")) as "pval")
      salted.groupBy($"user_id")
        .agg(
          sum($"pcnt") as "cnt",
          toDouble(sum($"pval")) as "total_value")
    },

    // Source/sink formats beyond parquet (§2.2 scans/sources row): half
    // the orders round-trip through CSV, half through JSON lines, then
    // both feed one aggregation. Readers get explicit schemas (never
    // inferSchema at scale — it double-reads the input).
    "q51_csv_json_sources" -> { (s, dir) =>
      import s.implicits._
      val tmp = TempStores.scratch("graft-q51")
      val o = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      o.where($"o_orderkey" % 2 === 0)
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      o.where($"o_orderkey" % 2 === 1)
        .write.mode("overwrite").json(s"$tmp/json")
      val schema = "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE"
      val fromCsv = s.read.schema(schema).option("header", "true").csv(s"$tmp/csv")
      val fromJson = s.read.schema(schema).json(s"$tmp/json")
      fromCsv.unionByName(fromJson)
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total")
    },

    // Columnar source beyond parquet: ORC round-trip (write a slice as
    // ORC, read it back with an explicit schema, aggregate) — same
    // pushdown/pruning machinery as the parquet scans.
    "q52_orc_source" -> { (s, dir) =>
      import s.implicits._
      val tmp = TempStores.scratch("graft-q52")
      t(s, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
        .write.mode("overwrite").orc(s"$tmp/orc")
      s.read.schema("s_suppkey LONG, s_nationkey INT, s_acctbal DOUBLE")
        .orc(s"$tmp/orc")
        .groupBy($"s_nationkey")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"s_acctbal"))) as "total_bal")
    },

    // Explicit GROUPING SETS (beyond rollup/cube): two hand-picked sets
    // plus grouping_id to tell them apart — one shuffle, not one job per
    // set.
    "q47_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders").createOrReplaceTempView("graft_q47_orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus,
          |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid,
          |  count(*) AS cnt
          |FROM graft_q47_orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin)
    },

    // Range (non-equi) join: orders against a tiny in-memory band
    // dimension — broadcast nested-loop, the right plan for a
    // bounded-size band table at any fact-side scale.
    "q34_range_join" -> { (s, dir) =>
      import s.implicits._
      val bands = s.createDataFrame(Seq(
        ("b0", 0.0, 50000.0), ("b1", 50000.0, 100000.0),
        ("b2", 100000.0, 150000.0), ("b3", 150000.0, 200000.0),
        ("b4", 200000.0, 1e18))).toDF("band", "lo", "hi")
      t(s, dir, "orders")
        .join(broadcast(bands),
          $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
        .groupBy($"band")
        .agg(
          count(lit(1)) as "cnt",
          toDouble(sum(dec($"o_totalprice"))) as "total")
    })

  private def D(e: String) = decSql(e)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         |CAST(sum(${D("l_extendedprice")}) AS DOUBLE) AS sum_base,
         |CAST(sum(${D("l_extendedprice")} * ${D("1.0 - l_discount")}) AS DOUBLE) AS revenue,
         |sum(l_quantity) / count(*) AS avg_qty, count(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_orders_by_cust" ->
      s"""SELECT o_custkey, count(*) AS cnt,
         |CAST(sum(${D("o_totalprice")}) AS DOUBLE) AS total,
         |max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
         |FROM orders GROUP BY o_custkey""".stripMargin,
    "q03_cust_by_nation" ->
      s"""SELECT c_nationkey, count(*) AS cnt,
         |CAST(sum(${D("c_acctbal")}) AS DOUBLE) AS acctbal
         |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q04_join_broadcast" ->
      s"""SELECT c_mktsegment, count(*) AS cnt,
         |CAST(sum(${D("o_totalprice")}) AS DOUBLE) AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,
    "q05_join_multiway" ->
      s"""SELECT r_name, n_name,
         |CAST(sum(${D("l_extendedprice")} * ${D("1.0 - l_discount")}) AS DOUBLE) AS revenue,
         |count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_nationkey, count(*) AS cnt FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY c_nationkey""".stripMargin,
    "q07_anti_join" ->
      s"""SELECT c_mktsegment, count(*) AS cnt,
         |CAST(sum(${D("c_acctbal")}) AS DOUBLE) AS acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment""".stripMargin,
    "q08_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,
    "q09_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       sum(l_quantity) OVER (PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q74_outer_join" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS rich_cust
        |  FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        |s AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS rich_supp
        |  FROM supplier WHERE s_acctbal > 9900 GROUP BY 1)
        |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(rich_cust, 0) AS rich_cust,
        |  COALESCE(rich_supp, 0) AS rich_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""".stripMargin,
    "q11_setops" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |) u
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |GROUP BY o_custkey HAVING count(*) > 12""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q55_pivot" ->
      s"""SELECT o_orderpriority,
         |CAST(sum(CASE WHEN o_orderstatus='O' THEN ${D("o_totalprice")} END) AS DOUBLE) AS st_O,
         |CAST(sum(CASE WHEN o_orderstatus='F' THEN ${D("o_totalprice")} END) AS DOUBLE) AS st_F,
         |CAST(sum(CASE WHEN o_orderstatus='P' THEN ${D("o_totalprice")} END) AS DOUBLE) AS st_P
         |FROM orders GROUP BY 1""".stripMargin,
    "q39_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS qty_p50,
        |quantile_cont(l_quantity, 0.9) AS qty_p90,
        |quantile_cont(l_extendedprice, 0.5) AS price_p50
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q38_cube" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         |CAST(sum(${decSql("o_totalprice")}) AS DOUBLE) AS total
         |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q14_scalar_functions" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr, CAST(month(l_shipdate) AS INT) AS mo,
        |count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q15_string_functions" ->
      """SELECT upper(substr(p_name, 1, 3)) AS pfx, count(*) AS cnt,
        |CAST(sum(p_size) AS BIGINT) AS total_size, CAST(max(length(p_name)) AS INT) AS max_len
        |FROM part GROUP BY 1""".stripMargin,
    "q16_case_buckets" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
         |WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
         |count(*) AS cnt, CAST(sum(${D("o_totalprice")}) AS DOUBLE) AS total
         |FROM orders GROUP BY 1""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |CAST(sum(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS sum_k,
        |max(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q18_time_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         |count(*) AS cnt,
         |CAST(sum(${D("value")}) AS DOUBLE) AS total_value,
         |max(value) AS max_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q63_moving_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS INT) AS day,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', l_shipdate)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS qty_7d
        |FROM lineitem""".stripMargin,
    "q61_sessionization" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |g AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN prev_ts IS NULL
         |           OR date_diff('second', prev_ts, ts) > 1800
         |      THEN 1 ELSE 0 END AS new_sess
         |  FROM o),
         |sn AS (
         |  SELECT user_id, ts, value,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
         |  FROM g)
         |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
         |  CAST(min(ts) AS TIMESTAMP) AS session_start,
         |  CAST(max(ts) AS TIMESTAMP) AS session_end,
         |  count(*) AS n_events,
         |  CAST(sum(${D("value")}) AS DOUBLE) AS total_value
         |FROM sn GROUP BY 1, 2""".stripMargin,
    "q19_event_gaps" ->
      """SELECT user_id, event_id,
        |CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_s
        |FROM (SELECT user_id, event_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events) t
        |WHERE prev_ts IS NOT NULL""".stripMargin,
    // Same carried-forward-click construction (not DuckDB ASOF JOIN, whose
    // tie handling at equal timestamps is unspecified) — both engines
    // compute the identical deterministic window.
    "q33_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT user_id, ts, event_id, is_click,
        |    last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
        |    last_value(CASE WHEN is_click = 1 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_click, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id, last_click_id AS click_id,
        |  CAST(date_diff('second', last_click_ts, ts) AS BIGINT) AS gap_s
        |FROM m WHERE is_click = 0 AND last_click_id IS NOT NULL""".stripMargin,
    "q51_csv_json_sources" ->
      s"""SELECT o_orderstatus, count(*) AS cnt,
         |CAST(sum(${D("o_totalprice")}) AS DOUBLE) AS total
         |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q52_orc_source" ->
      s"""SELECT s_nationkey, count(*) AS cnt,
         |CAST(sum(${D("s_acctbal")}) AS DOUBLE) AS total_bal
         |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid,
        |  count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin,
    "q35_salted_agg" ->
      s"""SELECT user_id, count(*) AS cnt,
         |CAST(sum(${D("value")}) AS DOUBLE) AS total_value
         |FROM events GROUP BY user_id""".stripMargin,
    "q34_range_join" ->
      s"""WITH bands(band, lo, hi) AS (VALUES
         |  ('b0', 0.0, 50000.0), ('b1', 50000.0, 100000.0),
         |  ('b2', 100000.0, 150000.0), ('b3', 150000.0, 200000.0),
         |  ('b4', 200000.0, 1e18))
         |SELECT band, count(*) AS cnt,
         |CAST(sum(${D("o_totalprice")}) AS DOUBLE) AS total
         |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band""".stripMargin
  )
}
