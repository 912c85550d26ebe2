package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS) which Spark cannot
  * read natively; we flip the legacy conf to read it as raw nanos (LongType)
  * and convert at the envelope layer (ns → µs truncation, mirroring the
  * reference's `natsMsg_GetTime()/1000`, /root/reference/src/nats_scan.cpp:749).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // dynamic SQLConf; harmless for the µs/ms tables
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
