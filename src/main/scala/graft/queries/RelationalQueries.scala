package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.nats.{NatsScan, NatsScanOptions}

/** Layer-B relational operator inventory (SURVEY.md §2): every downstream
  * operator the reference's shipped queries require from its host engine,
  * re-expressed as declarative DataFrame plans so Catalyst/Tungsten supply
  * the physical strategy (broadcast joins for dims, partial+final hash agg,
  * TakeOrderedAndProject top-k, window exec).
  *
  * Scale notes (100 TB thinking):
  *   - money aggregates sum DECIMAL(18,2), not DOUBLE — exact, so partial
  *     aggregation order can never change results across cluster sizes;
  *   - dimension joins (region/nation/customer at these SFs) broadcast;
  *     fact-fact joins shuffle on their keys and rely on AQE;
  *   - windows are PARTITION BY'd wherever semantics allow (a global
  *     ORDER BY window is a single-task bottleneck at scale — only the
  *     reference-parity gap/rownum queries use one, documented below).
  */
object RelationalQueries {

  /** gap rows (seq, prev_seq, gap) over the global seq order — scale-safe
    * bucketed LAG, see [[graft.operators.ScalableWindows.globalLag]]. */
  private def globalLagGaps(df: DataFrame, bucketWidth: Long): DataFrame =
    graft.operators.ScalableWindows.globalLag(df, "seq", bucketWidth, "prev_seq")
      .withColumn("gap", col("seq") - col("prev_seq"))
      .select("seq", "prev_seq", "gap")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- aggregation ---

    // TPC-H Q1 shape: multi-column GROUP BY + 8 aggregates in one pass.
    // All money math is exact DECIMAL internally (order-invariant partial
    // aggregation), and every aggregate — including the averages, derived
    // from the exact sums — is emitted as DOUBLE: the decimal→double cast
    // is the same IEEE round-to-nearest in every engine, so results are
    // bit-identical no matter how a downstream consumer renders them.
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
        .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
        .withColumn("disc", col("l_discount").cast("decimal(18,2)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sq"),
          sum("price").as("sp"),
          sum((col("price") * (lit(1) - col("disc"))).cast("decimal(28,10)")).as("sdp"),
          sum("disc").as("sd"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sq").cast("double").as("sum_qty"),
          col("sp").cast("double").as("sum_base_price"),
          // scale 10 → 4 first (pure truncation: the products carry exactly
          // 4 decimals). A decimal→double conversion is only engine-portable
          // while the unscaled value fits 2^53 — beyond ~15 significant
          // digits some engines double-round (int128→double, then /10^s)
          // and drift one ulp from a correctly-rounded conversion.
          col("sdp").cast("decimal(24,4)").cast("double").as("sum_disc_price"),
          round(col("sq").cast("double") / col("count_order"), 4).as("avg_qty"),
          round(col("sp").cast("double") / col("count_order"), 4).as("avg_price"),
          round(col("sd").cast("double") / col("count_order"), 6).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // global (ungrouped) aggregation + exact multi COUNT(DISTINCT)
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "events").agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
        .select(col("n_users"), col("n_types"), col("n_rows"),
          round(col("sv").cast("double") / col("n_rows"), 4).as("avg_value"))),

    // SUM(CASE WHEN ...) conditional aggregation
    "q_sum_case" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          sum(when(col("value") > 100, 1).otherwise(0)).as("n_high"),
          sum(when(col("value") <= 100, 1).otherwise(0)).as("n_low"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // GROUP BY + HAVING
    "q_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        .filter(col("n_orders") >= 3)
        .withColumn("total", col("total").cast("double"))
        .orderBy("o_custkey")),

    "q_distinct" -> ((s, dir) =>
      t(s, dir, "events").select("event_type").distinct().orderBy("event_type")),

    // --- filters / predicates / scalar exprs ---

    "q_filter_predicates" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice").between(10000, 200000) &&
          col("o_orderstatus").isin("O", "F") &&
          col("o_orderpriority").like("1-%") &&
          (col("o_custkey") % 2 === 0 || col("o_totalprice") > 150000))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")),

    "q_case_when" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        .select(col("bucket"), col("n"),
          round(col("sp").cast("double") / col("n"), 4).as("avg_price"))
        .orderBy("bucket")),

    // IS NULL on a missing JSON key (reference: missing key → NULL)
    "q_is_null" -> ((s, dir) =>
      NatsScan.scanDir(s, dir, opts = NatsScanOptions(jsonExtract = Seq("k", "missing")))
        .withColumn("has_missing", col("missing").isNotNull)
        .groupBy("has_missing")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1).otherwise(0)).as("null_k"))
        .orderBy("has_missing")),

    // casts: string → int/double, double → string-ish comparisons
    "q_cast" -> ((s, dir) =>
      NatsScan.scanDir(s, dir, opts = NatsScanOptions(jsonExtract = Seq("k")))
        .withColumn("k_int", col("k").cast("int"))
        .filter(col("k_int") >= 50)
        .groupBy("k_int")
        .agg(count(lit(1)).as("n"), min("seq").as("min_seq"))
        .orderBy("k_int")),

    "q_scalar_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          length(col("c_name")).as("name_len"),
          upper(col("c_mktsegment")).as("seg_upper"),
          round(col("c_acctbal"), 1).as("bal_round"),
          abs(col("c_acctbal")).as("bal_abs"),
          concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("tag"))
        .orderBy("c_custkey")),

    // timestamp arithmetic + date_trunc bucketing
    "q_ts_arithmetic" -> ((s, dir) =>
      NatsScan.scanDir(s, dir)
        .select(col("seq"), col("ts_nats"),
          (col("ts_nats") + expr("INTERVAL 2 HOURS")).as("ts_plus2h"),
          date_trunc("hour", col("ts_nats")).as("ts_hour"))
        .groupBy("ts_hour")
        .agg(count(lit(1)).as("n"), max("ts_plus2h").as("max_plus2h"))
        .orderBy("ts_hour")),

    // --- joins ---

    // stream × dimension: the reference's canonical enrichment pattern
    // (docs/EXAMPLES.md:240-253). customer is the dim → broadcast. The
    // hint IS this query's point (PlanAuditSpec pins the broadcast); when
    // the user dimension outgrows executor memory the same query drops
    // the hint and AQE keeps it an exchange-bounded shuffle join — see
    // q_qualify_topn for the unhinted form.
    "q_join_broadcast" -> ((s, dir) => {
      val env = NatsScan.scanDir(s, dir)
        .withColumn("user_id",
          element_at(split(col("subject"), "\\."), 3).cast("long"))
      val dim = broadcast(t(s, dir, "customer"))
      env.join(dim, env("user_id") === dim("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          max("seq").as("max_seq"))
        .orderBy("c_mktsegment")
    }),

    // snowflake: customer ⋈ nation ⋈ region (both dims broadcast)
    "q_join_multi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).as("sum_bal"))
        .withColumn("sum_bal", col("sum_bal").cast("double"))
        .orderBy("r_name")),

    // fact ⋈ fact: orders × lineitem shuffle join on the key
    "q_join_fact" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"))
        .withColumn("sum_price", col("sum_price").cast("double"))
        .orderBy("o_orderstatus")),

    // semi/anti joins (EXISTS / NOT EXISTS shapes)
    "q_semi_join" -> ((s, dir) => {
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      t(s, dir, "customer")
        .join(hi, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority").like("1-%")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // custom typed Aggregator (UDAF surface): parallel Welford variance,
    // oracle = the engines' built-in var_samp
    // round(2), not 4: Welford partial-merge order varies with shuffle fetch
    // order, so the raw double can wobble in the last ulps run-to-run; at
    // 2 decimals the wobble (~1e-6 relative) can never flip the rounding
    "q_custom_agg" -> ((s, dir) => {
      val variance = udaf(graft.functions.WelfordVariance)
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(round(variance(col("value")), 2).as("var_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // implicit cross join of 1-row CTEs (test_connection_errors.sql:150-162)
    "q_cross_join" -> ((s, dir) => {
      val env = NatsScan.scanDir(s, dir)
      val lo = env.agg(min("seq").as("first_seq"))
      val hi = env.agg(max("seq").as("last_seq"), count(lit(1)).as("n"))
      lo.crossJoin(hi)
        .select(col("first_seq"), col("last_seq"), col("n"),
          (col("last_seq") - col("first_seq") + 1 === col("n")).as("contiguous"))
    }),

    // scalar subquery in WHERE (test_sequence_ranges.sql:67)
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag, count(*) AS n,
               round(avg(l_quantity), 4) AS avg_qty
        FROM v_lineitem
        WHERE l_quantity > (SELECT avg(l_quantity) FROM v_lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // --- windows ---

    // LAG gap detection over the filtered stream (test_sequence_ranges.sql:92-107).
    // Scale-safe global-order LAG: a naive `Window.orderBy(seq)` plans a
    // SINGLE-PARTITION global sort — at 100× the whole filtered stream lands
    // on one task. Instead, bucket seq by a fixed width (deterministic — no
    // range-sampling nondeterminism): LAG within a bucket is a partitioned
    // window (parallel), and the only cross-bucket data is ONE boundary row
    // per bucket (max seq), whose running max supplies the predecessor of
    // each bucket's first row even across empty buckets. The lone global
    // window left in the plan runs over the tiny per-bucket aggregate
    // (O(maxSeq/W) rows ≈ O(#partitions)) — the boundary-row exchange, not
    // the data. PlanAuditSpec asserts this shape.
    "q_window_lag" -> ((s, dir) => {
      globalLagGaps(
        NatsScan.scanDir(s, dir,
          opts = NatsScanOptions(subjectContains = Some("purchase")))
          .select(col("seq")),
        bucketWidth = 4096L)
        .filter(col("gap") > 1)
        .orderBy("seq")
    }),

    // Scale-safe global top-k + rank: rn <= 100 means only the top 100 rows
    // survive, so fetch them with orderBy+limit (TakeOrderedAndProject — the
    // distributed top-k that never sorts a whole partition's data globally)
    // and number the 100 survivors with a local window. The tie order is the
    // same total order in both stages (price DESC, key ASC), so the ranks
    // are identical to numbering the full table.
    "q_window_rownum" -> ((s, dir) => {
      val ord = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(ord: _*)
        .limit(100)
        .withColumn("rn", row_number().over(Window.orderBy(ord: _*)))
        .orderBy("rn")
    }),

    // partitioned window — the shape that scales (per-key ordering only)
    "q_window_partition" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          row_number().over(w).as("user_event_rank"),
          lag("event_id", 1).over(w).as("prev_event_id"))
        .filter(col("user_event_rank") <= 3)
        .orderBy("user_id", "user_event_rank")
    }),

    // ROLLUP: hierarchical subtotals (superset of the reference's plain
    // GROUP BY — free via Catalyst Expand)
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
        .withColumn("sum_qty", col("sum_qty").cast("double"))
        .orderBy("l_returnflag", "l_linestatus")),

    // as-of join: each purchase enriched with the user's most recent signup
    // at-or-before it (graft.operators.AsofJoin — union + running-last, one
    // shuffle on the key)
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), (col("event_id") + 1L).as("seq"))
      val sg = e.filter(col("event_type") === "signup")
        .select(col("user_id"), (col("event_id") + 1L).as("sseq"))
      graft.operators.AsofJoin
        .asofJoin(p, sg, "user_id", "seq", "sseq", "sseq", "signup_seq")
        .orderBy("seq")
    }),

    // binned range join: events joined into ±1h windows around the 20
    // earliest purchases — an equi-join on the bin id plus exact containment,
    // never the cartesian product a naive BETWEEN join plans to
    // (operators.RangeJoin; PlanAuditSpec asserts no nested-loop join)
    "q_range_join" -> ((s, dir) => {
      val hourNs = 3600L * 1000000000L
      val e = t(s, dir, "events").select(col("event_id"), col("ts"))
      val anchors = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .orderBy("event_id").limit(20)
        .select(col("event_id").as("win_id"),
          (col("ts") - hourNs).as("lo"), (col("ts") + hourNs).as("hi"))
      graft.operators.RangeJoin
        .rangeJoin(e, "ts", anchors, "lo", "hi", binWidth = hourNs)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_ev"), max("event_id").as("max_ev"))
        .orderBy("win_id")
    }),

    // gap-based sessionization (per-user partitioned windows — scales with
    // keys; streaming flavor in graft.streaming.Sessionize)
    "q_sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize
        .batchSessionCounts(t(s, dir, "events"), 6L * 3600L * 1000000000L)
        .orderBy("user_id")),

    // UNNEST / LATERAL explode: token frequency over exploded text.
    // One explode (no join) + hash agg; at scale the explode multiplies rows
    // map-side and the shuffle carries only (token) keys.
    "q_explode" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),

    // PIVOT: one row per bucket, one column per event_type (explicit value
    // list → deterministic schema; a single Expand+agg pass, no join)
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("bucket", col("user_id") % 10)
        .groupBy("bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("bucket")),

    // window value functions: lead / first_value / last_value per user
    "q_window_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          lead("event_id", 1).over(w).as("next_event"),
          first("event_id").over(w).as("first_event"),
          last("event_id").over(wFull).as("last_event"))
        .orderBy("user_id", "event_id")
    }),

    // NTILE quartiles per user (total order via unique tie-break)
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).as("quartile"))
        .groupBy("user_id", "quartile")
        .agg(count(lit(1)).as("n"), min("event_id").as("first_ev"))
        .orderBy("user_id", "quartile")
    }),

    // exact linear-interpolation percentiles (PERCENTILE_CONT semantics);
    // both engines compute lo + (hi-lo)*frac at h=(n-1)p over the sorted set
    "q_percentile_cont" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("q"))
        .select(col("event_type"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"))
        .orderBy("event_type")),

    // --- sort / limit / top-k ---

    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "q_multi_sort" -> ((s, dir) =>
      t(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
        .orderBy(col("p_brand").asc, col("p_size").desc, col("p_partkey").asc)
        .limit(200)),

    // --- set ops / CTE ---

    "q_union_all" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val hi = e.filter(col("value") > 150).select(col("event_id"), lit("high").as("band"))
      val lo = e.filter(col("value") < 50).select(col("event_id"), lit("low").as("band"))
      hi.unionAll(lo).groupBy("band").agg(count(lit(1)).as("n")).orderBy("band")
    }),

    "q_cte" -> ((s, dir) => {
      NatsScan.scanDir(s, dir).createOrReplaceTempView("v_env")
      s.sql("""
        WITH hourly AS (
          SELECT date_trunc('hour', ts_nats) AS h, count(*) AS n
          FROM v_env GROUP BY 1
        ), stats AS (
          SELECT round(avg(n), 4) AS avg_n, max(n) AS max_n FROM hourly
        )
        SELECT h, n, avg_n, max_n
        FROM hourly CROSS JOIN stats
        WHERE n > avg_n
        ORDER BY h""")
    }),

    // --- sink: parquet round-trip (COPY TO ... FORMAT PARQUET parity) ---

    "q_parquet_sink" -> ((s, dir) => {
      val out = s"/tmp/graft_sink_${new java.io.File(dir).getName}"
      t(s, dir, "nation").write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"))
        .orderBy("n_regionkey")
    })
  )

  def oracleSql: Map[String, String] = {
    val env = NatsQueries.envSql
    Map(
      "q_agg_pricing" -> """
        WITH g AS (
          SELECT l_returnflag, l_linestatus,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
                 sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,10))) AS sdp,
                 sum(CAST(l_discount AS DECIMAL(18,2))) AS sd,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus,
               CAST(sq AS DOUBLE) AS sum_qty,
               CAST(sp AS DOUBLE) AS sum_base_price,
               CAST(CAST(sdp AS DECIMAL(24,4)) AS DOUBLE) AS sum_disc_price,
               round(CAST(sq AS DOUBLE) / count_order, 4) AS avg_qty,
               round(CAST(sp AS DOUBLE) / count_order, 4) AS avg_price,
               round(CAST(sd AS DOUBLE) / count_order, 6) AS avg_disc,
               count_order
        FROM g
        ORDER BY l_returnflag, l_linestatus""",

      "q_count_distinct" -> """
        SELECT count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types,
               count(*) AS n_rows,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_value
        FROM events""",

      "q_sum_case" -> """
        SELECT event_type,
               CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""",

      "q_having" -> """
        SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""",

      "q_distinct" ->
        "SELECT DISTINCT event_type FROM events ORDER BY event_type",

      "q_filter_predicates" -> """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_totalprice BETWEEN 10000 AND 200000
          AND o_orderstatus IN ('O', 'F')
          AND o_orderpriority LIKE '1-%'
          AND (o_custkey % 2 = 0 OR o_totalprice > 150000)
        ORDER BY o_orderkey""",

      "q_case_when" -> """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
        FROM orders GROUP BY 1 ORDER BY bucket""",

      "q_is_null" -> s"""$env, ext AS (
        SELECT json_extract_string(payload, '$$.k') AS k,
               json_extract_string(payload, '$$.missing') AS missing
        FROM env)
        SELECT missing IS NOT NULL AS has_missing, count(*) AS n,
               CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k
        FROM ext GROUP BY 1 ORDER BY has_missing""",

      "q_cast" -> s"""$env, ext AS (
        SELECT seq, CAST(json_extract_string(payload, '$$.k') AS INTEGER) AS k_int
        FROM env)
        SELECT k_int, count(*) AS n, min(seq) AS min_seq
        FROM ext WHERE k_int >= 50 GROUP BY k_int ORDER BY k_int""",

      "q_scalar_funcs" -> """
        SELECT c_custkey, CAST(length(c_name) AS INTEGER) AS name_len,
               upper(c_mktsegment) AS seg_upper,
               round(c_acctbal, 1) AS bal_round,
               abs(c_acctbal) AS bal_abs,
               c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS tag
        FROM customer ORDER BY c_custkey""",

      "q_ts_arithmetic" -> s"""$env
        SELECT date_trunc('hour', ts_nats) AS ts_hour, count(*) AS n,
               max(ts_nats + INTERVAL 2 HOUR) AS max_plus2h
        FROM env GROUP BY 1 ORDER BY ts_hour""",

      "q_join_broadcast" -> s"""$env
        SELECT c_mktsegment, count(*) AS n_events,
               count(DISTINCT CAST(string_split(subject, '.')[3] AS BIGINT)) AS n_users,
               max(seq) AS max_seq
        FROM env JOIN customer
          ON CAST(string_split(subject, '.')[3] AS BIGINT) = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "q_join_multi" -> """
        SELECT r_name, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""",

      "q_join_fact" -> """
        SELECT o_orderstatus, count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""",

      "q_semi_join" -> """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        ORDER BY c_custkey""",

      "q_anti_join" -> """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority LIKE '1-%')
        ORDER BY c_custkey""",

      "q_custom_agg" -> """
        SELECT event_type, round(var_samp(value), 2) AS var_value,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""",

      "q_cross_join" -> s"""$env, lo AS (
        SELECT min(seq) AS first_seq FROM env
        ), hi AS (
        SELECT max(seq) AS last_seq, count(*) AS n FROM env
        )
        SELECT first_seq, last_seq, n,
               (last_seq - first_seq + 1 = n) AS contiguous
        FROM lo, hi""",

      "q_scalar_subquery" -> """
        SELECT l_returnflag, count(*) AS n,
               round(avg(l_quantity), 4) AS avg_qty
        FROM lineitem
        WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag""",

      "q_window_lag" -> s"""$env, f AS (
        SELECT seq FROM env WHERE subject LIKE '%purchase%'
        ), lagged AS (
        SELECT seq, lag(seq) OVER (ORDER BY seq) AS prev_seq FROM f
        )
        SELECT seq, prev_seq, seq - prev_seq AS gap
        FROM lagged WHERE seq - prev_seq > 1 ORDER BY seq""",

      "q_window_rownum" -> """
        SELECT o_orderkey, o_totalprice, rn FROM (
          SELECT o_orderkey, o_totalprice,
                 CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
          FROM orders)
        WHERE rn <= 100 ORDER BY rn""",

      "q_window_partition" -> """
        SELECT user_id, event_id, user_event_rank, prev_event_id FROM (
          SELECT user_id, event_id,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS user_event_rank,
                 lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id
          FROM events)
        WHERE user_event_rank <= 3 ORDER BY user_id, user_event_rank""",

      "q_rollup" -> """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

      "q_asof_join" -> """
        WITH p AS (SELECT user_id, event_id + 1 AS seq FROM events
                   WHERE event_type = 'purchase'),
        s AS (SELECT user_id, event_id + 1 AS sseq FROM events
              WHERE event_type = 'signup')
        SELECT p.user_id, p.seq, s.sseq AS signup_seq
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.seq >= s.sseq
        ORDER BY seq""",

      "q_range_join" -> """
        WITH a AS (
          SELECT event_id AS win_id,
                 epoch_ns(ts) - 3600000000000 AS lo,
                 epoch_ns(ts) + 3600000000000 AS hi
          FROM events WHERE event_type = 'purchase'
          ORDER BY event_id LIMIT 20)
        SELECT win_id, count(*) AS n,
               min(e.event_id) AS min_ev, max(e.event_id) AS max_ev
        FROM a JOIN events e ON epoch_ns(e.ts) BETWEEN a.lo AND a.hi
        GROUP BY win_id ORDER BY win_id""",

      "q_sessionize" -> """
        WITH o AS (
          SELECT user_id,
                 CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 21600000000000 THEN 1 ELSE 0 END AS new_s
          FROM events)
        SELECT user_id, count(*) AS n_events,
               CAST(1 + sum(new_s) AS BIGINT) AS n_sessions
        FROM o GROUP BY user_id ORDER BY user_id""",

      "q_explode" -> """
        SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""",

      "q_pivot" -> """
        SELECT user_id % 10 AS bucket,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY 1 ORDER BY bucket""",

      "q_window_lead" -> """
        SELECT user_id, event_id,
               lead(event_id) OVER w AS next_event,
               first_value(event_id) OVER w AS first_event,
               last_value(event_id) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id""",

      "q_ntile" -> """
        SELECT user_id, quartile, count(*) AS n, min(event_id) AS first_ev
        FROM (SELECT user_id, event_id,
                     CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS quartile
              FROM events WHERE user_id < 10)
        GROUP BY user_id, quartile ORDER BY user_id, quartile""",

      "q_percentile_cont" -> """
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.75) AS p75
        FROM events GROUP BY event_type ORDER BY event_type""",

      "q_topk" -> """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",

      "q_multi_sort" -> """
        SELECT p_partkey, p_brand, p_size, p_retailprice
        FROM part ORDER BY p_brand ASC, p_size DESC, p_partkey ASC LIMIT 200""",

      "q_union_all" -> """
        SELECT band, count(*) AS n FROM (
          SELECT event_id, 'high' AS band FROM events WHERE value > 150
          UNION ALL
          SELECT event_id, 'low' AS band FROM events WHERE value < 50)
        GROUP BY band ORDER BY band""",

      "q_cte" -> s"""$env, hourly AS (
        SELECT date_trunc('hour', ts_nats) AS h, count(*) AS n FROM env GROUP BY 1
        ), stats AS (
        SELECT round(avg(n), 4) AS avg_n, max(n) AS max_n FROM hourly
        )
        SELECT h, n, avg_n, max_n
        FROM hourly CROSS JOIN stats WHERE n > avg_n ORDER BY h""",

      "q_parquet_sink" -> """
        SELECT n_regionkey, count(*) AS n_nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
    )
  }
}
