package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SkewTools

/** Scale-technique operators: skew-salted aggregation (exact oracle — the
  * salt is algebraically invisible), GROUPING SETS, typeof, and approximate
  * sketches (HLL distinct, quantile sketch — no DuckDB oracle possible since
  * sketch internals differ across engines; the driver records rows-only
  * checks, and the companion exact queries bound the error). */
object ScaleQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // two-phase salted aggregate over a 5-hot-key distribution; result must
    // equal the plain GROUP BY (phase composition is algebraic)
    "q_salted_agg" -> ((s, dir) =>
      SkewTools.saltedAgg(
          Tables.load(s, dir, "events"),
          keyCol = "event_type",
          agg = SkewTools.sumCountMinMax("value"),
          saltBuckets = 16,
          saltOn = col("event_id"))
        .select(col("event_type"),
          round(col("sum_value"), 2).as("sum_value"), col("n"),
          col("min_value"), col("max_value"))
        .orderBy("event_type")),

    // skew-salted JOIN: hot join keys spread over (key, salt) reducers,
    // dim replicated salt× map-side; row-identical to the plain join —
    // the oracle runs the UNSALTED join, so the equivalence is the check
    "q_salted_join" -> ((s, dir) => {
      val joined = SkewTools.saltedJoin(
        Tables.load(s, dir, "lineitem"), "l_suppkey",
        Tables.load(s, dir, "supplier"), "s_suppkey",
        saltBuckets = 8,
        saltOn = col("l_orderkey") * 31 + col("l_linenumber"))
      joined.groupBy("s_nationkey")
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("s_nationkey")
    }),

    // Z-ORDER re-layout (operators/ZOrder.cluster): events rewritten along
    // the (user_id, event_id) Morton curve — the multi-dimensional sort
    // that lets parquet min/max stats prune on EITHER dimension at 100 TB
    // (a single-key sort layout prunes on one). Layout never changes row
    // content, so the oracle is the same aggregate over the raw table; a
    // curve/partition bug that lost or duplicated a row breaks the hash.
    // The actual skipping win is asserted from file footer stats in
    // `ZOrderSpec` (most files pruned for a second-dimension predicate).
    "layout_zorder" -> ((s, dir) => {
      val out = graft.Scratch.dir("graft_zorder")
      graft.operators.ZOrder.cluster(Tables.load(s, dir, "events"),
          Seq("user_id", "event_id"), partitions = 8)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("event_id").as("sum_eid"),
          sum("user_id").as("sum_uid"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .orderBy("event_type")
    }),

    "q_grouping_sets" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority""")
    }),

    // deterministic stratified sample: per stratum (lang), keep the k docs
    // with the smallest salted 60-bit hash — a reproducible reservoir that
    // needs one partitioned window, no global shuffle, and yields the SAME
    // sample at any cluster size (unlike rand()-based TABLESAMPLE)
    "q_stratified_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(col("hk").asc, col("doc_id").asc)
      Tables.load(s, dir, "documents")
        .withColumn("hk",
          graft.functions.Similarity.hash60(
            concat(lit("samp:"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    }),

    // CUBE: all 2^k grouping combinations in one Expand pass — the
    // completion of the rollup/grouping-sets family
    "q_cube" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .withColumn("total", col("total").cast("double"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // typeof (reference: test_payload_blob.sql:14, test_json_extraction.sql:32)
    // on the type names both engines spell identically (modulo case)
    "q_typeof" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .agg(count(lit(1)).as("n"), avg("value").as("avg_v"),
          max(timestamp_micros(expr("ts div 1000"))).as("ts_max"))
        .withColumn("flag", lit(true))
        .select(
          lower(expr("typeof(n)")).as("t_count"),
          lower(expr("typeof(avg_v)")).as("t_avg"),
          lower(expr("typeof(flag)")).as("t_bool"),
          lower(expr("typeof(ts_max)")).as("t_ts"))),

    // HLL-sketch distinct, ORACLE-CHECKABLE: sketch internals differ across
    // engines, so the sketch value itself can't hash-match — but its error
    // CONTRACT can. The query pairs the sketch with its exact companion and
    // emits a boolean `within_rtol` (HLL++ at rsd=0.02 must land within
    // ±5%); the oracle recomputes the exact side and asserts the boolean is
    // true, so a sketch regression breaks the hash match.
    "q_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            lit(0.05) * col("exact_users")).as("within_rtol"))
        .orderBy("event_type")),

    // MERGEABLE sketches — the pre-aggregation pattern that actually ships
    // at 100 TB: per-(type, day) Datasketches-HLL partials materialize ONCE
    // (a binary column a lakehouse table can store), and any later rollup
    // re-aggregates by UNIONING sketches without touching raw data — a
    // year-over-year distinct-users query reads 365 sketch rows per type,
    // not 10¹¹ events. Same boolean error contract as q_approx_distinct
    // (union of partials must land within ±5% of exact); n_partials pins
    // that the daily partial stage really partitioned the data.
    "q_hll_mergeable" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      // ts is the engine's raw-ns long; the daily partition key is its
      // calendar day (session TZ pinned UTC, same value the oracle derives)
      val daily = e.groupBy(col("event_type"),
          expr("to_date(timestamp_micros(ts div 1000))").as("day"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"),
          count(lit(1)).as("n_partials"))
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"), col("n_partials"),
          (abs(col("approx_users") - col("exact_users")) <=
            lit(0.05) * col("exact_users")).as("within_rtol"))
        .orderBy("event_type")
    }),

    // frequent-items sketch (the third classic sketch after HLL and
    // quantiles): single-pass heavy-hitter detection. The algorithm's
    // GUARANTEE — every item with frequency > support IS in the sketch
    // output (false positives allowed, false negatives never) — is the
    // hashable contract: the oracle emits the exact heavy hitters with
    // in_sketch hard-coded TRUE, so a contract violation hash-fails the
    // gate. The sketch itself is one bounded driver-side result.
    "q_approx_freq" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val sketch = e.stat.freqItems(Array("event_type"), 0.2)
        .head.getSeq[String](0).toSet
      val tot = e.count()
      e.groupBy("event_type").agg(count(lit(1)).as("n"))
        .filter(col("n").cast("double") > lit(tot * 0.2))
        .withColumn("in_sketch",
          col("event_type").isin(sketch.toSeq: _*))
        .select(col("event_type"), col("n"), col("in_sketch"))
        .orderBy("event_type")
    }),

    // set ops beyond the reference (INTERSECT/EXCEPT "free via Catalyst")
    "q_intersect" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.filter(col("value") > 100).select("user_id").distinct()
        .intersect(e.filter(col("event_type") === "purchase")
          .select("user_id").distinct())
        .orderBy("user_id")
    }),

    "q_except" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.select("user_id").distinct()
        .except(e.filter(col("value") > 215)
          .select("user_id").distinct())
        .orderBy("user_id")
    }),

    // deterministic stratified train/val split: hash-bucket assignment is a
    // pure function of the row key, so the split is reproducible on any
    // cluster size and needs no RNG state
    "q_split" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket",
          pmod(expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"),
            lit(100L)))
        .withColumn("split", when(col("bucket") < 90, "train").otherwise("val"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")),

    // Quantile sketch, ORACLE-CHECKABLE via its RANK-ERROR contract: a
    // quantile sketch at accuracy 10000 must return an element whose true
    // rank is within ±1% of the target rank. The query broadcasts the 1-row
    // sketch result back over the data, counts values <= each estimate
    // (the true rank), and emits booleans the oracle asserts true — any
    // sketch drift beyond the bound breaks the hash match.
    "q_approx_quantiles" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").filter(col("value").isNotNull)
      val sk = e.agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
      e.crossJoin(broadcast(sk))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") <= element_at(col("q"), 1), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= element_at(col("q"), 2), 1L).otherwise(0L)).as("r90"),
          sum(when(col("value") <= element_at(col("q"), 3), 1L).otherwise(0L)).as("r99"))
        .select(col("n"),
          (abs(col("r50") / col("n").cast("double") - 0.5) <= 0.01).as("p50_rank_ok"),
          (abs(col("r90") / col("n").cast("double") - 0.9) <= 0.01).as("p90_rank_ok"),
          (abs(col("r99") / col("n").cast("double") - 0.99) <= 0.01).as("p99_rank_ok"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_salted_agg" -> """
      SELECT event_type, round(sum(value), 2) AS sum_value, count(*) AS n,
             min(value) AS min_value, max(value) AS max_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_salted_join" -> """
      SELECT s.s_nationkey,
             round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE
               AS revenue,
             count(*) AS n
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey ORDER BY s.s_nationkey""",

    "layout_zorder" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(event_id) AS BIGINT) AS sum_eid,
             CAST(sum(user_id) AS BIGINT) AS sum_uid,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q_stratified_sample" -> """
      WITH h AS (
        SELECT lang, doc_id,
               ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
        FROM documents),
      r AS (
        SELECT lang, doc_id,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS INTEGER) AS rk
        FROM h)
      SELECT lang, rk, doc_id FROM r WHERE rk <= 10 ORDER BY lang, rk""",

    "q_intersect" -> """
      SELECT user_id FROM events WHERE value > 100
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY user_id""",

    "q_except" -> """
      SELECT DISTINCT user_id FROM events
      EXCEPT
      SELECT user_id FROM events WHERE value > 215
      ORDER BY user_id""",

    "q_split" -> """
      WITH b AS (
        SELECT lang,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents)
      SELECT lang, split, count(*) AS n
      FROM b GROUP BY lang, split ORDER BY lang, split""",

    "q_typeof" -> """
      SELECT lower(typeof(count(*))) AS t_count,
             lower(typeof(avg(value))) AS t_avg,
             lower(typeof(true)) AS t_bool,
             lower(typeof(max(CAST(ts AS TIMESTAMP)))) AS t_ts
      FROM events""",

    // Sketch VALUES are engine-specific and can't hash-match — their error
    // CONTRACTS can: the Spark side really measures the sketch against its
    // exact companion and emits booleans; the oracle recomputes the exact
    // side and asserts the bounds held. A sketch regression (>5% HLL error,
    // >1% quantile rank error) flips a boolean and breaks the match.
    "q_approx_distinct" -> """
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             true AS within_rtol
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_hll_mergeable" -> """
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partials,
             true AS within_rtol
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_approx_freq" -> """
      SELECT event_type, count(*) AS n, true AS in_sketch
      FROM events GROUP BY event_type
      HAVING count(*) > (SELECT count(*) FROM events) * 0.2
      ORDER BY event_type""",

    "q_approx_quantiles" -> """
      SELECT count(*) AS n, true AS p50_rank_ok, true AS p90_rank_ok,
             true AS p99_rank_ok
      FROM events WHERE value IS NOT NULL"""
  )
}
