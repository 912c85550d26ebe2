package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) — Spark reads it as TIMESTAMP_NTZ. The engine keeps
  * the reference's raw-nanosecond epoch contract for the column
  * (`natsMsg_GetTime()` returns ns, /root/reference/src/nats_scan.cpp:749),
  * so `load` rebuilds `ts` as LongType epoch-ns (µs × 1000 — exact, and
  * computed with NTZ-domain `timestampdiff` so the value is independent of
  * the session timezone). `loadEventsRaw` exposes the untouched
  * TIMESTAMP_NTZ column for stores that want parquet-pushable timestamp
  * predicates applied before the conversion.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** epoch-ns LongType from the parquet TIMESTAMP(MICROS) column —
    * `timestampdiff` between two NTZ values never consults the session
    * timezone, unlike `unix_micros(cast(ts AS TIMESTAMP))` */
  private val tsEpochNs: Column = expr(
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', " +
      "cast(ts AS TIMESTAMP_NTZ)) * 1000")

  /** `events` read schema, pinned so `ts` is TIMESTAMP_NTZ regardless of
    * the session's `spark.sql.parquet.inferTimestampNTZ.enabled` (a user
    * turning that off would otherwise decode ts as session-TZ TIMESTAMP and
    * make the epoch-ns rebuild timezone-dependent). */
  private val eventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEventsRaw(spark, dir).withColumn("ts", tsEpochNs)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` left as the parquet TIMESTAMP_NTZ column (µs):
    * timestamp predicates on it reach the scan as PushedFilters, which the
    * ns-long computed column cannot */
  def loadEventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")

  /** TIMESTAMP_NTZ literal at `us` epoch-µs (UTC epoch arithmetic only —
    * no session-timezone dependence) */
  def ntzMicros(us: Long): Column =
    lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))
}
