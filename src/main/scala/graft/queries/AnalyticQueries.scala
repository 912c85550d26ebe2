package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Analytic-SQL surface beyond the SURVEY §2 inventory: window FRAMES
  * (running / moving aggregates), positional window functions
  * (first/last/nth), distribution functions (percent_rank, cume_dist),
  * correlated EXISTS / NOT EXISTS subqueries, QUALIFY-style top-n per
  * group, regexp and date part extraction, array functions over tokenized
  * text, and distributed second-moment statistics.
  *
  * Scale notes (100 TB thinking):
  *   - every window here is PARTITION BY'd — no global-order single-task
  *     windows (the scale-safe global variants live in
  *     [[graft.operators.ScalableWindows]]);
  *   - running sums accumulate DECIMAL (order-invariant partial state),
  *     cast to DOUBLE only at the edge, so plans re-ordered by AQE can
  *     never change results;
  *   - the EXISTS / NOT EXISTS pair is written as SQL subqueries so
  *     Catalyst's RewriteCorrelatedSubquery turns them into semi/anti
  *     hash joins — shuffle on the correlation key, no per-row probes;
  *   - stats (stddev/corr) use Spark's mergeable central-moment
  *     aggregates: one partial pass per partition + a tiny merge, the
  *     same topology as a plain sum.
  */
object AnalyticQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Window frames: running total (UNBOUNDED PRECEDING..CURRENT ROW) and
    // 3-row moving average, both per customer. The moving average divides
    // an exact DECIMAL frame-sum by the frame count instead of avg() —
    // DuckDB's avg(DECIMAL) returns DOUBLE while Spark's widens the
    // decimal, so the explicit sum/count is the engine-portable form.
    "q_window_frame" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .withColumn("p", col("o_totalprice").cast("decimal(18,2)"))
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w3 = ord.rowsBetween(-2, Window.currentRow)
      base.select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("p")).over(run).cast("double").as("running_total"),
        round(sum(col("p")).over(w3).cast("double") /
          count(lit(1)).over(w3), 4).as("mv_avg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // first_value / last_value / nth_value over the full-partition frame
    "q_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 150)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // percent_rank + cume_dist per event type; the ORDER BY includes
    // event_id so every rank is tie-free and the doubles ((rank-1)/(n-1),
    // rank/n) are the same IEEE divisions in both engines.
    "q_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .filter(col("event_id") % 17 === 0)
        .select(
          col("event_type"), col("event_id"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("event_type", "event_id")
    }),

    // funnel analysis — the canonical event-stream product query: per
    // user, the earliest strictly-ordered view → click → purchase chain
    // and how deep it got. Three keyed aggregations/joins, all on
    // user_id (co-partitioned after the first shuffle; at 100 TB every
    // stage is a hash agg/join on the same high-cardinality key —
    // no window over the full stream, no per-user re-scan).
    "q_funnel" -> ((s, dir) => {
      // µs on both sides: DuckDB reads the TIMESTAMP(NANOS) column at µs
      // precision, so the funnel runs on the truncated value in BOTH
      // engines (matching the envelope layer's ns→µs rule)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id", "t1").agg(min("ts").as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
            + when(col("t3").isNotNull, 1).otherwise(0)).as("reached"))
        .orderBy("user_id")
    }),

    // cohort retention — users per (first-activity week, week offset):
    // the standard growth-analytics matrix. Weeks truncate to ISO Monday
    // in both engines; the distinct (user, week) reduction happens BEFORE
    // the cohort join, so the join input is bounded by users × weeks,
    // not by raw events.
    "q_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          date_trunc("week", timestamp_micros(expr("ts div 1000"))).as("wk"))
        .distinct()
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      ev.join(cohort, "user_id")
        .withColumn("week_offset",
          expr("datediff(wk, cohort_week) div 7").cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // daily-volume anomaly detection per event type: flag days whose
    // value total sits ≥ 2σ from that type's own mean — the monitoring
    // query an event pipeline runs continuously. Values round to cents
    // and sum as DECIMAL (exact at any parallelism); mean and σ derive
    // from the exact (Σ, Σ²) per-type aggregates in one closed-form
    // scalar expression (identical tree in the oracle); the per-type
    // stats table is days-bounded and broadcasts back onto the daily
    // rows. z itself is irrational (sqrt), so the ≥ 2 cut and the
    // 4-decimal round are boundary-safe (rule 6b).
    "q_anomaly" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("day"),
        round(col("value"), 2).cast("decimal(14,2)").as("v"))
      // dt steps down to DECIMAL(18,2) so dt*dt stays inside precision 38
      // in BOTH engines (a sum-widened decimal squared would overflow)
      val daily = e.groupBy("event_type", "day")
        .agg(sum("v").cast("decimal(18,2)").as("dt"),
          count(lit(1)).as("n_events"))
      val stats = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"),
        sum("dt").as("sd"), sum(col("dt") * col("dt")).as("qd"))
      val z = (col("dt").cast("double") -
          col("sd").cast("double") / col("n_days")) /
        sqrt(col("qd").cast("double") / col("n_days") -
          (col("sd").cast("double") / col("n_days")) *
          (col("sd").cast("double") / col("n_days")))
      daily.join(broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(abs(col("z")) >= 2.0)
        .select(col("event_type"), col("day"), col("n_events"),
          col("dt").cast("double").as("day_total"), round(col("z"), 4).as("z"))
        .orderBy("event_type", "day")
    }),

    // behavioral transition matrix: P(next event type | current) from each
    // user's time-ordered event sequence — the Markov-chain view of the
    // event stream (what funnel analysis generalizes to). Consecutive
    // pairs come from a USER-PARTITIONED lag window ordered by (ts,
    // event_id) — total order, no global window; the conditional
    // probability is an exact integer ratio per (from, to) cell.
    "q_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("to_type"))
        .withColumn("from_type", lag("to_type", 1).over(w))
        .filter(col("from_type").isNotNull)
      val cell = pairs.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      val fromTot = cell.groupBy("from_type").agg(sum("n").as("n_from"))
      cell.join(broadcast(fromTot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("n_from"), 6).as("p"))
        .orderBy("from_type", "to_type")
    }),

    // correlated EXISTS + NOT EXISTS — Catalyst rewrites to a semi join
    // and an anti join on l_partkey (shuffle on the key, no row probes)
    "q_exists" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_x")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_x")
      s.sql("""
        SELECT p_partkey, p_brand
        FROM part_x p
        WHERE EXISTS (SELECT 1 FROM lineitem_x l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
          AND NOT EXISTS (SELECT 1 FROM lineitem_x l2
                          WHERE l2.l_partkey = p.p_partkey
                            AND l2.l_returnflag = 'R' AND l2.l_quantity < 2)
        ORDER BY p_partkey""")
    }),

    // QUALIFY-style top-n per group: rank over a partitioned window, then
    // filter — the distributed form of "top 3 orders per market segment".
    // customer is UNHINTED on purpose: it scales with the corpus (unlike
    // nation/region), so the planner/AQE picks broadcast vs shuffle by
    // measured size — at bench SFs it still broadcasts, at 100 TB it
    // becomes a co-shuffled join instead of a driver OOM
    "q_qualify_topn" -> ((s, dir) => {
      val seg = t(s, dir, "orders").join(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      seg.select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("c_mktsegment", "rnk")
    }),

    // regexp extract/replace, token counting, substring, position
    "q_regexp" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_last"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_replace(col("p_brand"), "#", "_").as("brand_u"),
        substring(col("p_name"), 1, 5).as("name5"),
        instr(col("p_name"), "o").as("pos_o"))
        .orderBy("p_partkey")),

    // date part extraction + month truncation as grouping keys
    "q_date_parts" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .withColumn("month_start", date_trunc("month", col("o_orderdate")))
        .groupBy("yr", "mo", "month_start")
        .agg(count(lit(1)).as("n"),
          min(dayofmonth(col("o_orderdate"))).as("min_day"),
          max(dayofmonth(col("o_orderdate"))).as("max_day"))
        .orderBy("yr", "mo")),

    // array functions over whitespace-tokenized text — all map-side
    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_words"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_min(col("toks")).as("min_word"),
          array_contains(col("toks"), "the").as("has_the"))
        .orderBy("doc_id")),

    // distributed second moments: stddev / variance / correlation via
    // mergeable central-moment partials (numerically stable across any
    // partitioning); rounded at the edge because the merge order differs
    // from a single-threaded engine by O(1 ulp)
    "q_stats_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // UNPIVOT (wide metrics → long): aggregate first so the melt runs on
    // group-count rows, not raw fact rows — at 100 TB the unpivot input is
    // a handful of rows, never the fact table itself
    "q_unpivot" -> ((s, dir) => {
      val m = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum("l_discount"), 2).as("sum_disc"))
      m.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy("l_returnflag", "metric")
    }),

    // deterministic string aggregation: sort-then-join instead of
    // listagg's engine-defined order — collect_list is safe here because
    // groups are small dims (nations per region), never fact-sized
    "q_string_agg" -> ((s, dir) =>
      t(s, dir, "nation").join(
          broadcast(t(s, dir, "region").select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name")),

    // exact median per group — Spark's percentile-based median matches
    // DuckDB's interpolating median on DOUBLE input
    "q_median" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(median(col("o_totalprice")), 4).as("med"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // bitwise aggregates — order-invariant partials (AND/OR/XOR are
    // commutative+associative), so they merge like sums under any
    // partitioning; XOR over ids is the classic set-symmetric-difference
    // checksum
    "q_bitwise_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("bit_and(l_orderkey % 97)").as("band"),
          expr("bit_or(l_partkey % 97)").as("bor"),
          expr("bit_xor(l_suppkey)").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // correlated LATERAL subquery: top-2 orders per nation-sharded key.
    // Catalyst decorrelates the ranked subquery into one partitioned
    // window + join — 25 correlated "subqueries" become a single pass,
    // not per-row re-execution
    "q_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT n.n_name, o.o_orderkey, o.o_totalprice
        FROM g_nation n, LATERAL (
          SELECT o_orderkey, o_totalprice FROM g_orders
          WHERE o_orderkey % 25 = n.n_nationkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY n.n_name, o.o_totalprice DESC, o.o_orderkey""")
    }),

    // changelog compaction (CDC latest-wins upsert): one max(struct) per
    // key — an order-invariant partial aggregate that map-side-combines,
    // NOT a shuffle-everything-then-window. Ranking runs on µs-truncated
    // time (DuckDB TIMESTAMP precision; our ts carries ns) with event_id
    // breaking ties, so the lexicographic struct max is deterministic and
    // engine-identical.
    "q_upsert_latest" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max(struct(expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"), col("value"))).as("m"),
          count(lit(1)).as("n_versions"))
        .select(col("user_id"),
          col("m.event_type").as("last_type"),
          col("m.value").as("last_value"),
          col("m.event_id").as("last_event_id"),
          col("m.ts_us").as("last_ts_us"),
          col("n_versions"))
        .orderBy("user_id")),

    // calendar gap filling: generate the complete month series between the
    // observed min/max (a one-row aggregate exploded — bounded, broadcast)
    // and left-join the sparse monthly aggregate onto it, so missing
    // months surface as explicit zero rows — time-series densification
    // without a driver-side loop
    "q_gap_fill" -> ((s, dir) => {
      val hv = t(s, dir, "orders")
        .filter(col("o_totalprice") > 495000)
        .withColumn("mon", date_trunc("month", col("o_orderdate")).cast("date"))
      val m = hv.groupBy("mon").agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      val cal = hv.agg(min("mon").as("lo"), max("mon").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("mon"))
      cal.join(m, Seq("mon"), "left")
        .select(col("mon"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy("mon")
    }),

    // arg-max/arg-min aggregates (max_by/min_by ↔ DuckDB arg_max/arg_min):
    // "which user produced the latest / earliest event of each type" —
    // one partial-aggregable pass, no window, no join-back. The ordering
    // key is the unique event_id, so ties cannot make the answer
    // engine-dependent.
    "q_arg_max" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          max_by(col("user_id"), col("event_id")).as("last_user"),
          min_by(col("user_id"), col("event_id")).as("first_user"),
          max("event_id").as("last_event"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // boolean aggregates: bool_and / bool_or / count_if — order-invariant
    // partials (AND/OR are commutative), the same topology as sum
    "q_bool_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          bool_and(col("value") > 1.0).as("all_above_1"),
          bool_or(col("value") > 480.0).as("any_above_480"),
          count_if(col("value") > 250.0).as("n_above_250"))
        .orderBy("event_type")),

    // linear-regression aggregates (regr_slope/intercept/r2/count):
    // extendedprice vs quantity per returnflag — mergeable co-moment
    // state, one pass, no shuffle beyond the group key. Rounded: the
    // co-moment partials merge in cluster-dependent order.
    "q_regr" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 3)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 3)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")),

    // equi-width histogram: bucket id is pure arithmetic (map-side), the
    // count is one partial agg on a LOW-cardinality key — the shape that
    // never shuffles more than n_buckets rows per task
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(least(floor(col("o_totalprice") / 50000), lit(9))
          .cast("int").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("bucket")),

    // tumbling event-time windows in batch (the same window() the
    // streaming path uses): 6-hour buckets, DECIMAL-exact value sums.
    // ts is raw nanos (LONG) — truncate to µs exactly like the oracle's
    // epoch_us, then bucket. Aggregation key = window start: dense,
    // low-cardinality, partial-agg absorbs everything map-side.
    "q_tumbling_window" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("w", window(timestamp_micros(expr("ts div 1000")),
          "6 hours"))
        .groupBy(col("w.start").as("w_start"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(col("w_start"), col("n"), round(col("sum_value"), 4)
          .as("sum_value"))
        .orderBy("w_start")),

    // SCD TYPE-2 dimension build: collapse a per-user event stream into
    // validity intervals [valid_from, valid_to) — one row per RUN of an
    // unchanged attribute (event_type), the warehouse shape a changelog
    // becomes before joining facts "as of" a point in time (q_upsert_latest
    // is the degenerate latest-only snapshot of the same input). Change
    // detection is one lag() and interval closing one lead(), both under
    // PARTITION BY user — no global window, scales with users × changes.
    // Timestamps travel as epoch-µs BIGINT so both engines hash the same
    // cells; is_current marks the open interval.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = t(s, dir, "events")
        .filter(pmod(col("user_id"), lit(50)) === 0)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_from_us", expr("ts div 1000"))
        .withColumn("valid_to_us",
          lead("valid_from_us", 1).over(
            Window.partitionBy("user_id")
              .orderBy(col("ts"), col("event_id"))))
        .select(col("user_id"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"),
          col("valid_to_us").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_us")
    }),

    // time-RANGE window frame: trailing 6-hour moving count + exact sum
    // per user at every event — RANGE BETWEEN INTERVAL frames are the
    // event-time analog of q_window_frame's ROWS frames (peers at equal
    // ts all join the frame, so no tiebreak is needed for the aggregate).
    // Spark ranges over the raw ns LONG; the oracle over INTERVAL '6
    // hours' — identical frames since ns = µs × 1000 exactly. Window
    // partitioned by user: parallel, never global.
    "q_window_range" -> ((s, dir) => {
      val sixHoursNs = 6L * 3600L * 1000000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-sixHoursNs, 0)
      t(s, dir, "events")
        .filter(pmod(col("user_id"), lit(50)) === 0)
        .withColumn("v", round(col("value"), 2).cast("decimal(14,2)"))
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"),
          count(lit(1)).over(w).as("n_6h"),
          sum(col("v")).over(w).cast("double").as("sum_6h"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // SKYLINE (Pareto frontier): parts not dominated on (size, price) —
    // both minimized; the classic multi-criteria shortlist query. Shape:
    // collapse to one row per size (min price — dominance within a size
    // is just the min), then a point survives iff its price strictly
    // beats the minimum over all SMALLER sizes: an EXCLUSIVE global
    // prefix-min, computed by ScalableWindows' bucketed two-pass (the
    // data-bearing window stays partitioned; the only global window runs
    // over one boundary row per bucket). The naive formulation is a
    // quadratic self-join (the oracle's NOT EXISTS) or a single-task
    // global sort — both dead at 100 TB; this is O(n) + a broadcast of
    // #buckets rows.
    "q_skyline" -> ((s, dir) => {
      val sz = t(s, dir, "part").groupBy("p_size")
        .agg(min("p_retailprice").as("best_price"),
          count(lit(1)).as("n_parts"))
      graft.operators.ScalableWindows.globalRunningMinExclusive(
          sz, "p_size", 8L, "best_price", "prefix_min")
        .filter(col("prefix_min").isNull ||
          col("best_price") < col("prefix_min"))
        .select(col("p_size"), col("best_price"), col("n_parts"))
        .orderBy("p_size")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_window_frame" -> """
      WITH f AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders WHERE o_custkey <= 200)
      SELECT o_custkey, o_orderkey,
             CAST(sum(p) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_total,
             round(CAST(sum(p) OVER w3 AS DOUBLE) / (count(*) OVER w3), 4) AS mv_avg
      FROM f
      WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",

    "q_first_last" -> """
      SELECT o_custkey, o_orderkey,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER w AS last_price,
             nth_value(o_totalprice, 2) OVER w AS second_price
      FROM orders WHERE o_custkey <= 150
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",

    "q_percent_rank" -> """
      SELECT event_type, event_id,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd
      FROM events WHERE event_id % 17 = 0
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_type, event_id""",

    "q_exists" -> """
      SELECT p_partkey, p_brand
      FROM part p
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        AND NOT EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_partkey = p.p_partkey
                          AND l2.l_returnflag = 'R' AND l2.l_quantity < 2)
      ORDER BY p_partkey""",

    "q_qualify_topn" -> """
      WITH r AS (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(rank() OVER (PARTITION BY c_mktsegment
                                 ORDER BY o_totalprice DESC, o_orderkey)
                    AS INTEGER) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey)
      SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
      FROM r WHERE rnk <= 3
      ORDER BY c_mktsegment, rnk""",

    "q_regexp" -> """
      SELECT p_partkey,
             regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last,
             CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
             regexp_replace(p_brand, '#', '_') AS brand_u,
             substr(p_name, 1, 5) AS name5,
             CAST(strpos(p_name, 'o') AS INTEGER) AS pos_o
      FROM part ORDER BY p_partkey""",

    "q_transitions" -> """
      WITH p AS (SELECT user_id, event_type AS to_type,
                        lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS from_type
                 FROM events),
      cell AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM p WHERE from_type IS NOT NULL
               GROUP BY from_type, to_type),
      ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             FROM cell GROUP BY from_type)
      SELECT cell.from_type, cell.to_type, cell.n,
             round(CAST(cell.n AS DOUBLE) / ft.n_from, 6) AS p
      FROM cell JOIN ft USING (from_type)
      ORDER BY from_type, to_type""",

    "q_anomaly" -> """
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        CAST(round(value, 2) AS DECIMAL(14,2)) AS v
                 FROM events),
      daily AS (SELECT event_type, day,
                       CAST(sum(v) AS DECIMAL(18,2)) AS dt,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM e GROUP BY event_type, day),
      stats AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                       sum(dt) AS sd, sum(dt * dt) AS qd
                FROM daily GROUP BY event_type),
      zz AS (SELECT d.event_type, d.day, d.n_events,
                    CAST(d.dt AS DOUBLE) AS day_total,
                    (CAST(d.dt AS DOUBLE) - CAST(s.sd AS DOUBLE) / s.n_days)
                    / sqrt(CAST(s.qd AS DOUBLE) / s.n_days
                           - (CAST(s.sd AS DOUBLE) / s.n_days)
                             * (CAST(s.sd AS DOUBLE) / s.n_days)) AS z
             FROM daily d JOIN stats s USING (event_type))
      SELECT event_type, day, n_events, day_total, round(z, 4) AS z
      FROM zz WHERE abs(z) >= 2.0 ORDER BY event_type, day""",

    "q_funnel" -> """
      WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, s1.t1, min(epoch_us(e.ts)) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        GROUP BY e.user_id, s1.t1),
      s3 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        GROUP BY e.user_id)
      SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
             CAST(1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END
                  AS INTEGER) AS reached
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
      ORDER BY s1.user_id""",

    "q_retention" -> """
      WITH ev AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        FROM events),
      c AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id)
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, ev.wk) // 7 AS INTEGER)
               AS week_offset,
             CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
      FROM ev JOIN c ON ev.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",

    "q_date_parts" -> """
      SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
             CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             count(*) AS n,
             CAST(min(extract(day FROM o_orderdate)) AS INTEGER) AS min_day,
             CAST(max(extract(day FROM o_orderdate)) AS INTEGER) AS max_day
      FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""",

    "q_array_funcs" -> """
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id <= 200)
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_words,
             CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
             list_min(toks) AS min_word,
             list_contains(toks, 'the') AS has_the
      FROM tok ORDER BY doc_id""",

    "q_stats_funcs" -> """
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4) AS sd_qty,
             round(var_samp(l_discount), 6) AS var_disc,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_unpivot" -> """
      WITH m AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_discount), 2) AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, val
      FROM m UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
      ORDER BY l_returnflag, metric""",

    "q_string_agg" -> """
      SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
             count(*) AS n
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name ORDER BY r.r_name""",

    "q_median" -> """
      SELECT o_orderpriority, round(median(o_totalprice), 4) AS med,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_bitwise_agg" -> """
      SELECT l_returnflag,
             bit_and(l_orderkey % 97) AS band,
             bit_or(l_partkey % 97) AS bor,
             bit_xor(l_suppkey) AS bxor,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_lateral" -> """
      SELECT n.n_name, o.o_orderkey, o.o_totalprice
      FROM nation n, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey % 25 = n.n_nationkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      ORDER BY n.n_name, o.o_totalprice DESC, o.o_orderkey""",

    "q_upsert_latest" -> """
      WITH ranked AS (
        SELECT user_id, event_type, value, event_id, epoch_us(ts) AS ts_us,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_versions
        FROM events)
      SELECT user_id, event_type AS last_type, value AS last_value,
             event_id AS last_event_id, ts_us AS last_ts_us, n_versions
      FROM ranked WHERE rn = 1 ORDER BY user_id""",

    "q_gap_fill" -> """
      WITH hv AS (
        SELECT date_trunc('month', o_orderdate)::DATE AS mon, o_totalprice
        FROM orders WHERE o_totalprice > 495000),
      b AS (SELECT min(mon) AS lo, max(mon) AS hi FROM hv),
      cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))::DATE AS mon
              FROM b),
      m AS (SELECT mon, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM hv GROUP BY mon)
      SELECT cal.mon, coalesce(m.n, 0) AS n, coalesce(m.total, 0.0) AS total
      FROM cal LEFT JOIN m USING (mon) ORDER BY cal.mon""",

    "q_arg_max" -> """
      SELECT event_type,
             arg_max(user_id, event_id) AS last_user,
             arg_min(user_id, event_id) AS first_user,
             max(event_id) AS last_event,
             count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_bool_agg" -> """
      SELECT event_type,
             bool_and(value > 1.0) AS all_above_1,
             bool_or(value > 480.0) AS any_above_480,
             count(*) FILTER (WHERE value > 250.0) AS n_above_250
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_regr" -> """
      SELECT l_returnflag,
             round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept,
             round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             regr_count(l_extendedprice, l_quantity) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_histogram" -> """
      SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
             count(*) AS n,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
      FROM orders GROUP BY 1 ORDER BY bucket""",

    "q_tumbling_window" -> """
      SELECT to_timestamp((epoch_us(ts) // 21600000000) * 21600)::TIMESTAMP
               AS w_start,
             count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS sum_value
      FROM events GROUP BY 1 ORDER BY w_start""",

    "q_scd2" -> """
      WITH c AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id % 50 = 0),
      ch AS (SELECT user_id, event_id, ts, event_type
             FROM c WHERE prev_type IS NULL OR prev_type <> event_type),
      iv AS (SELECT user_id, event_type,
                    epoch_us(ts) AS valid_from_us,
                    lead(epoch_us(ts)) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to_us
             FROM ch)
      SELECT user_id, event_type, valid_from_us, valid_to_us,
             (valid_to_us IS NULL) AS is_current
      FROM iv ORDER BY user_id, valid_from_us""",

    "q_window_range" -> """
      WITH e AS (SELECT user_id, event_id, ts,
                        CAST(round(value, 2) AS DECIMAL(14,2)) AS v
                 FROM events WHERE user_id % 50 = 0)
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(count(*) OVER w AS BIGINT) AS n_6h,
             CAST(sum(v) OVER w AS DOUBLE) AS sum_6h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 6 HOURS PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_us, event_id""",

    // dominance spelled as the quadratic NOT EXISTS — fine for an oracle,
    // exactly what the prefix-min formulation exists to avoid at scale
    "q_skyline" -> """
      WITH sz AS (SELECT p_size, min(p_retailprice) AS best_price,
                         CAST(count(*) AS BIGINT) AS n_parts
                  FROM part GROUP BY p_size)
      SELECT p_size, best_price, n_parts FROM sz a
      WHERE NOT EXISTS (SELECT 1 FROM sz b
                        WHERE b.p_size < a.p_size
                          AND b.best_price <= a.best_price)
      ORDER BY p_size"""
  )
}
