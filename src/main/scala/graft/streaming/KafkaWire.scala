package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka source/sink parity (SURVEY §2.1 S5 / §2.5 K3): the reference's
  * entire streaming layer is Kafka-fronted — StreamProcessor.java:29-36
  * consumes JSON payloads from topic `flights`, keyed sinks publish keyed
  * JSON back (:54). In Structured Streaming, Kafka is a FORMAT, not a
  * topology: every topology in [[EventStreams]] is a streaming
  * DataFrame => DataFrame function, so the swap is source/sink-deep only.
  * This object makes that claim concrete and checkable:
  *
  *   - [[wireSchema]] is the exact record shape `format("kafka")` produces;
  *   - [[fromWire]] decodes it to the engine's event shape (value = JSON
  *     payload, event time from the payload — the broker timestamp is
  *     ingestion time, the wrong clock for event-time windows);
  *   - [[toWire]] encodes any result to the keyed key/value shape
  *     `format("kafka")` requires of a sink.
  *
  * KafkaWireSpec drives a topology end-to-end over a MemoryStream bearing
  * [[wireSchema]] and asserts the result matches the same topology over a
  * direct event stream — so the format-swap claim fails loudly if a
  * topology ever grows a source-specific dependency. The `format("kafka")`
  * builders below additionally need the spark-sql-kafka connector jar on
  * the classpath (not in this container; the spec `assume`s them away when
  * absent and exercises them when a deployment runs the suite with the
  * connector present).
  */
object KafkaWire {

  /** The fixed record schema of `spark.readStream.format("kafka")`. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON payload carried in the Kafka `value`: the event fields with event
    * time as epoch micros (JSON has no timestamp type; micros matches the
    * engine's internal precision). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Decode a wire-schema record stream to the engine's normalized event
    * shape. Malformed payloads parse to null fields and are dropped by the
    * same normalize() null filter as the reference's lenient parse
    * (StreamProcessor.java:89-92). */
  def fromWire(records: DataFrame): DataFrame = {
    val parsed = records
      .select(from_json(col("value").cast("string"), payloadSchema).as("e"))
      .select(
        col("e.event_id").as("event_id"),
        timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))
    EventStreams.normalize(parsed)
  }

  /** Encode any result frame to the kafka-sink shape: key = the chosen key
    * column as utf-8 bytes, value = the full row as JSON bytes (the keyed
    * JSON the reference's Connect sinks consume). */
  def toWire(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).cast("binary").as("value"))

  /** The one-line source swap for [[EventStreams.fileReplaySource]].
    * Requires the spark-sql-kafka connector on the classpath. */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String): DataFrame =
    fromWire(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())

  /** The one-line sink swap for [[EventStreams.runToMemory]]'s memory sink:
    * start() publishes each result row as a keyed JSON record. */
  def kafkaSink(df: DataFrame, keyCol: String, brokers: String, topic: String,
                checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    toWire(df, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
}
