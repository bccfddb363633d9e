package graft.functions

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` payloads with typed metadata, and decode/feature-extract
  * runs as a batched per-partition pass (the Scala analogue of a Pandas UDF
  * over `mapInPandas`: executors pull fixed-size batches, run the codec, and
  * emit a typed row per asset).
  *
  * The actual media decode is STUBBED — codec libraries (JPEG/PNG/ffmpeg)
  * are not in this container — with a deterministic fake that derives
  * "frames" from the payload bytes, so the Spark-side contract (schema,
  * batch shape, partition parallelism, constant memory per batch) is real
  * and tested while the codec call is a drop-in replacement point.
  */
object Multimodal {

  /** An opaque media asset: payload plus the typed metadata a binary-asset
    * table carries at scale (content-addressed id, mime, declared length). */
  final case class MediaBlob(doc_id: Long, mime: String, payload: Array[Byte])

  /** Features extracted per asset. `frames` stands in for decoded content
    * (e.g. sampled frame histograms); real decoders keep the same shape. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int, checksum: String,
      frames: Array[Int])

  /** Batch size mirrors a Pandas-UDF arrow batch: bounded memory per task
    * regardless of partition size. */
  val DefaultBatchSize = 64

  /** STUB decoder — deterministic fake standing in for a real codec call.
    * Replace the body with the actual image/audio decode when codecs are
    * available; everything around it (batching, schema, distribution) stays. */
  private def decodeFrames(payload: Array[Byte], frameSize: Int = 256): Array[Int] =
    payload.grouped(frameSize).map(chunk => chunk.foldLeft(0)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff)).toArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Per-partition, batched feature extraction. Narrow (no shuffle): each
    * executor decodes only its partitions; batches bound peak memory the
    * way arrow batches do for `mapInPandas`. */
  def extractFeatures(blobs: Dataset[MediaBlob],
                      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A real codec would decode `batch` in one vectorized call here.
        batch.iterator.map { b =>
          MediaFeatures(b.doc_id, b.mime, b.payload.length,
            md5Hex(b.payload), decodeFrames(b.payload))
        }
      }
    }
  }

  /** Lift the documents table into a MediaBlob dataset (text bytes standing
    * in for media payloads — same schema a real asset table has). */
  def documentsAsBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "'text/plain' AS mime", "encode(text, 'UTF-8') AS payload")
      .as[MediaBlob]
  }
}
