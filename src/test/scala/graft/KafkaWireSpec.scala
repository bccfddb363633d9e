package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, KafkaWire}

/** The "Kafka is a format swap" claim, made checkable without a broker
  * (VERDICT r2 item 4): the reference's streaming layer is Kafka-fronted
  * (StreamProcessor.java:29-36), ours is source-agnostic DataFrame
  * functions. These tests drive a topology over a stream bearing the EXACT
  * kafka-source wire schema and assert it equals the same topology over a
  * direct event stream — if a topology ever grows a source-specific
  * dependency, the wire path diverges and this fails. The `format("kafka")`
  * builders themselves are exercised when the connector jar is present
  * (assume-skipped here: no spark-sql-kafka in this container).
  */
class KafkaWireSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L

  /** (key, value, topic, partition, offset, timestamp, timestampType) —
    * the tuple form of the kafka wire record. */
  private type Wire = (Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)

  private def wireRecord(offset: Long, eventId: Long, tsS: String, userId: Long,
                         eventType: String, value: Double): Wire = {
    val payload =
      s"""{"event_id":$eventId,"ts_us":${us(tsS)},"user_id":$userId,""" +
        s""""event_type":"$eventType","value":$value,"props":"{}"}"""
    (eventType.getBytes("UTF-8"), payload.getBytes("UTF-8"),
      // broker timestamp deliberately NOT the event time: fromWire must
      // window on the payload's ts_us, never the ingestion clock
      "events", 0, offset, ts("2030-01-01 00:00:00"), 0)
  }

  test("wire stream schema matches the kafka source contract") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Wire]
    val df = ms.toDF().toDF(KafkaWire.wireSchema.fieldNames: _*)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      KafkaWire.wireSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.isStreaming)
  }

  test("windowed-distinct over the kafka wire equals the direct-source run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      (1L, "2024-01-01 10:00:10", 1L, "A"), (2L, "2024-01-01 10:00:40", 2L, "A"),
      (3L, "2024-01-01 10:00:50", 1L, "B"), (4L, "2024-01-01 10:01:05", 3L, "A"),
      (5L, "2024-01-01 10:01:30", 3L, "B"), (6L, "2024-01-01 10:02:10", 4L, "A"))

    // Kafka-wire path: records arrive as (key, value-JSON, broker metadata)
    val wire = MemoryStream[Wire]
    wire.addData(data.zipWithIndex.map { case ((id, t, u, e), off) =>
      wireRecord(off.toLong, id, t, u, e, 1.0) })
    val wireOut = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(
        KafkaWire.fromWire(wire.toDF().toDF(KafkaWire.wireSchema.fieldNames: _*)),
        col("event_type"), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet

    // Direct path: the same events as a plain stream
    val direct = MemoryStream[(Timestamp, String, Long)]
    direct.addData(data.map { case (_, t, u, e) => (ts(t), e, u) })
    val directOut = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(
        EventStreams.normalize(direct.toDF().toDF("ts", "event_type", "user_id")),
        col("event_type"), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet

    assert(wireOut == directOut, s"wire=$wireOut direct=$directOut")
    assert(wireOut.nonEmpty)
  }

  test("malformed wire payloads are dropped by the normalize null filter") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wire = MemoryStream[Wire]
    wire.addData(Seq(
      wireRecord(0L, 1L, "2024-01-01 10:00:10", 1L, "A", 1.0),
      ("k".getBytes, "not json at all".getBytes, "events", 0, 1L, ts("2030-01-01 00:00:00"), 0),
      wireRecord(2L, 2L, "2024-01-01 10:01:10", 2L, "A", 1.0)))
    val out = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(
        KafkaWire.fromWire(wire.toDF().toDF(KafkaWire.wireSchema.fieldNames: _*)),
        col("event_type"), "event_type"))
      .select("win_start", "event_type", "distinct_users")
      .as[(String, String, Long)].collect().toSet
    // only the closed [10:00, 10:01) window, one valid user; junk dropped
    assert(out == Set(("2024-01-01 10:00:00", "a", 1L)), s"got $out")
  }

  test("toWire emits the keyed binary key/value shape a kafka sink requires") {
    import spark.implicits._
    val df = Seq(("a", "2024-01-01 10:00:00", 3L))
      .toDF("event_type", "win_start", "distinct_users")
    val wire = KafkaWire.toWire(df, "event_type")
    assert(wire.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("key", "binary"), ("value", "binary")))
    val row = wire.collect().head
    assert(new String(row.getAs[Array[Byte]]("key"), "UTF-8") == "a")
    val json = new String(row.getAs[Array[Byte]]("value"), "UTF-8")
    assert(json.contains(""""event_type":"a"""") &&
      json.contains(""""distinct_users":3"""))
  }

  test("format(\"kafka\") source builder analyzes when the connector is present") {
    val connectorPresent =
      try {
        org.apache.spark.sql.execution.datasources.DataSource
          .lookupDataSource("kafka", spark.sessionState.conf)
        true
      } catch { case _: Throwable => false }
    assume(connectorPresent, "spark-sql-kafka connector not on classpath")
    val df = KafkaWire.kafkaSource(spark, "localhost:9092", "events")
    assert(df.isStreaming)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
