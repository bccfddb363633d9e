package graft

import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The driver's testdata writer has shipped `ts` in three physical shapes
  * across rounds: TIMESTAMP(NANOS) (surfacing as nano-epoch long under
  * nanosAsLong), TIMESTAMP(MICROS, adjustedToUTC=true) (plain TIMESTAMP),
  * and TIMESTAMP(MICROS, adjustedToUTC=false) (surfacing as TIMESTAMP_NTZ
  * in Spark 4). The round-11 regeneration switched to the NTZ shape and
  * silently broke every `unix_micros` consumer (six queries errored in
  * BENCH_r11). This spec pins the source-layer contract: whatever shape
  * the file carries, Tables hands every query a plain TIMESTAMP `ts`
  * with the same micro values (exact under the UTC session timezone). */
class TimestampShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val micros = Seq(0L, 1700000000000000L, 1700000000123456L)

  private def readBack(writeShape: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-ts-$writeShape").toString
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, ZoneOffset.UTC))
    }
    val ntzSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), ntzSchema)
    val out = writeShape match {
      case "ntz" => df // parquet TIMESTAMP(MICROS, adjustedToUTC=false)
      case "utc" => df.withColumn("ts", col("ts").cast(TimestampType))
    }
    out.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Tables(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType,
      s"$writeShape shape must normalize to TIMESTAMP")
    val us = got.orderBy(col("event_id")).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(us == micros, s"$writeShape shape must preserve micro values")
  }

  test("NTZ parquet timestamps normalize to TIMESTAMP with exact micros") {
    readBack("ntz")
  }

  test("UTC-adjusted parquet timestamps pass through unchanged") {
    readBack("utc")
  }
}
