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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", tsEpochNs) else df
  }

  /** `events` with `ts` left as the parquet TIMESTAMP_NTZ column (µs):
    * timestamp predicates on it reach the scan as PushedFilters, which the
    * ns-long computed column cannot */
  def loadEventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** TIMESTAMP_NTZ literal at `us` epoch-µs (UTC epoch arithmetic only —
    * no session-timezone dependence) */
  def ntzMicros(us: Long): Column =
    lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))
}
