package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL-surface registration (the `LOAD nats_js` analog): with the extension
  * installed, proto_encode/proto_decode are callable from plain SQL. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val proto = graft.queries.ProtoQueries.deviceProtoPath

  test("proto_encode/proto_decode round-trip from plain SQL") {
    val row = spark.sql(
      s"""SELECT d.device_id, d.position.zone AS zone, d.reading.kw AS kw, d.online
         |FROM (SELECT proto_decode(
         |    proto_encode(
         |      named_struct(
         |        'device_id', 'dev-7', 'ts', CAST(42 AS BIGINT),
         |        'position', named_struct('zone', 'z1', 'rack', 'r2', 'building', 'b3'),
         |        'reading', named_struct('kw', 70.5, 'pf', 0.93, 'voltage', 480.0),
         |        'online', true, 'firmware', 'v9'),
         |      '$proto', 'DeviceEvent'),
         |    '$proto', 'DeviceEvent') AS d)""".stripMargin).head()
    assert(row.getString(0) == "dev-7")
    assert(row.getString(1) == "z1")
    assert(row.getDouble(2) == 70.5)
    assert(row.getBoolean(3))
  }

  test("similarity functions from SQL == Column API, bit for bit") {
    import org.apache.spark.sql.functions._
    val sqlRow = spark.sql(
      """SELECT cosine_sim(array(1.0F, 2.0F, 3.0F), array(3.0F, 2.0F, 1.0F)) AS c,
        |       lsh_bucket(array(1.0F, -2.0F, 3.0F, 0.5F), 4, 4) AS b,
        |       graft_hash60('samp:42') AS h""".stripMargin).head()
    val api = spark.range(1).select(
      graft.functions.Similarity.cosine(
        typedLit(Array(1.0f, 2.0f, 3.0f)), typedLit(Array(3.0f, 2.0f, 1.0f))).as("c"),
      graft.functions.Similarity.lshBucket(
        typedLit(Array(1.0f, -2.0f, 3.0f, 0.5f)), 4, 4).as("b"),
      graft.functions.Similarity.hash60(lit("samp:42")).as("h")).head()
    assert(sqlRow.getDouble(0) == api.getDouble(0))
    assert(sqlRow.getLong(1) == api.getLong(1))
    assert(sqlRow.getLong(2) == api.getLong(2))
    assert(sqlRow.getLong(2) == graft.functions.Similarity.hash60Scala("samp:42"))
  }

  test("non-literal proto path is rejected at plan time") {
    val e = intercept[Exception] {
      spark.sql("SELECT proto_decode(CAST('x' AS BINARY), concat('a', 'b.proto'), 'M')")
        .collect()
    }
    assert(e.getMessage.contains("string literal") ||
      e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("wrong arity gives the contract error") {
    val e = intercept[Exception] {
      spark.sql("SELECT proto_decode(CAST('x' AS BINARY))").collect()
    }
    assert(e.getMessage.contains("3 arguments") ||
      e.getMessage.toLowerCase.contains("argument"), e.getMessage)
  }
}
