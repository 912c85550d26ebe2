package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-ORDER-BY window semantics without a global sort.
  *
  * `Window.orderBy(x)` with no partition spec plans a single-partition sort:
  * every row of the input lands on one task — correct at demo scale, dead at
  * 100 TB. The operators here keep the exact semantics while keeping the
  * data-bearing windows partitioned; the only global exchange is per-bucket
  * boundary metadata (one row per bucket).
  */
object ScalableWindows {

  /** LAG(orderCol, 1) over the GLOBAL ordering of `orderCol`.
    *
    * Topology: bucket rows by `orderCol div bucketWidth` — a deterministic,
    * fixed-width range partitioning (no `repartitionByRange` sampling, so
    * the two passes below see identical bucketing by construction). Within
    * a bucket, LAG is a partitioned window (parallel). The first row of each
    * bucket takes its predecessor from the running max of per-bucket maxima
    * — one boundary row per bucket, running max computed over the tiny
    * aggregate (O(maxValue/bucketWidth) rows ≈ O(#partitions); for streams
    * where that count itself gets large, bucket the bucket table once more —
    * the recursion bottoms out immediately). Empty buckets are handled by
    * the running max: a bucket's predecessor may live many buckets back.
    *
    * Requires a numeric, non-null `orderCol` (a stream sequence number).
    */
  def globalLag(df: DataFrame, orderCol: String, bucketWidth: Long,
                prevCol: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val oc = col(orderCol)
    // narrow relation, read twice (rows + boundary aggregate): cache it
    val b = graft.Caches.tracked(
      df.withColumn("__bkt", expr(s"`$orderCol` div $bucketWidth")))
    val local = b.withColumn("__prev_local",
      lag(oc, 1).over(Window.partitionBy("__bkt").orderBy(orderCol)))
    val bounds = b.groupBy("__bkt").agg(max(oc).as("__bmax"))
    // the ONLY unpartitioned window: runs over the per-bucket aggregate
    // (boundary rows), never the data
    val prevMax = bounds.withColumn("__prev_bmax",
        max(col("__bmax")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__bkt"), col("__prev_bmax"))
    local.join(broadcast(prevMax), Seq("__bkt"))
      .withColumn(prevCol, coalesce(col("__prev_local"), col("__prev_bmax")))
      .drop("__bkt", "__prev_local")
  }

  /** Inclusive running SUM(valueCol) over the GLOBAL ordering of `orderCol`
    * — the distributed prefix-sum topology.
    *
    * Same two-pass shape as [[globalLag]]: per-bucket running sums are
    * partitioned windows (parallel); each bucket's exclusive prefix comes
    * from a window over the tiny per-bucket aggregate (one row per bucket),
    * broadcast back. The value must be integral (token counts, byte sizes):
    * LONG addition is associative, so bucket-local + prefix ≡ the global
    * left-to-right sum no matter how AQE lays out the partitions.
    *
    * Requires a numeric, non-null, unique `orderCol`.
    */
  def globalRunningSum(df: DataFrame, orderCol: String, bucketWidth: Long,
                       valueCol: String, cumCol: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val b = graft.Caches.tracked(
      df.withColumn("__bkt", expr(s"`$orderCol` div $bucketWidth")))
    val local = b.withColumn("__cum_local",
      sum(col(valueCol)).over(Window.partitionBy("__bkt").orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bounds = b.groupBy("__bkt").agg(sum(col(valueCol)).as("__bsum"))
    // the ONLY unpartitioned window: over one row per bucket, never the data
    val prefix = bounds.withColumn("__prefix",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__prefix"))
    local.join(broadcast(prefix), Seq("__bkt"))
      .withColumn(cumCol, col("__cum_local") + col("__prefix"))
      .drop("__bkt", "__cum_local", "__prefix")
  }

  /** EXCLUSIVE running MIN(valueCol) over the GLOBAL ordering of `orderCol`
    * — each row gets the minimum value among all STRICTLY PRECEDING rows
    * (null for the globally first row). The strict-prefix min is the
    * dominance test of skyline/Pareto queries: a point survives iff its
    * value beats every predecessor's.
    *
    * Same two-pass topology as [[globalRunningSum]] (min is associative):
    * per-bucket exclusive running mins are partitioned windows (parallel);
    * each bucket's full-prefix min comes from a window over the one-row-
    * per-bucket aggregate, broadcast back. `least` ignores nulls, so a
    * bucket-first row (null local prefix) falls through to the cross-bucket
    * prefix, and the global first row stays null.
    *
    * Requires a numeric, non-null, unique `orderCol`.
    */
  def globalRunningMinExclusive(df: DataFrame, orderCol: String,
                                bucketWidth: Long, valueCol: String,
                                minCol: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val b = graft.Caches.tracked(
      df.withColumn("__bkt", expr(s"`$orderCol` div $bucketWidth")))
    val local = b.withColumn("__min_local",
      min(col(valueCol)).over(Window.partitionBy("__bkt").orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, -1)))
    val bounds = b.groupBy("__bkt").agg(min(col(valueCol)).as("__bmin"))
    // the ONLY unpartitioned window: over one row per bucket, never the data
    val prefix = bounds.withColumn("__prefix",
        min(col("__bmin")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__bkt"), col("__prefix"))
    local.join(broadcast(prefix), Seq("__bkt"))
      .withColumn(minCol, least(col("__min_local"), col("__prefix")))
      .drop("__bkt", "__min_local", "__prefix")
  }
}
