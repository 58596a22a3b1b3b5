package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in distributed batches.
  *
  * The real Spark-side concerns — schema (binary + metadata struct),
  * partition-parallel batch processing, deterministic feature output
  * shape — are implemented and tested. The actual media codec is STUBBED
  * (`decodeStub`): this container has no image/audio libraries, so decode
  * is a deterministic fake over the payload bytes. Swapping in a real
  * codec (e.g. a JNI decoder per executor) changes only that one
  * function.
  */
object Multimodal {

  /** STUB — stands in for a real image/audio decode. Deterministic
    * features derived from the payload bytes: [n_bytes, crc32 bucket,
    * xxhash bucket, first-byte]. A real implementation would decode the
    * media and emit e.g. resolution / duration / frame features with the
    * exact same schema and batch shape.
    */
  private def decodeStub(payload: org.apache.spark.sql.Column) = array(
    length(payload).cast("double"),
    (crc32(payload) % 1000).cast("double"),
    abs(xxhash64(payload) % 1000).cast("double"),
    expr("cast(conv(substr(hex(payload), 1, 2), 16, 10) as double)"))

  /** Binary ingestion + stubbed decode + feature extraction, batched
    * across partitions. The payload here is the document text re-cast to
    * binary (standing in for image bytes); metadata is a typed struct —
    * the pattern a 100 TB image pipeline needs (binary column never
    * leaves the executors, features are small and columnar).
    */
  /** Record shape for the batched decode path. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, first_byte: Int, last_byte: Int, checksum: Long)

  /** Decoded-image stand-in: typed metadata a real codec would emit. */
  final case class DecodedImage(
      doc_id: Long, width: Int, height: Int, channels: Int, batch_id: Long)

  /** Sampled frame from a "video" payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_hash: Long)

  private val BatchSize = 64

  /** STUB decode to image metadata — deterministic dims derived from the
    * payload. Batch semantics mirror a pandas-UDF `mapInPandas` stage:
    * records are processed in bounded batches (BatchSize) with one codec
    * "call" per batch; batch_id is surfaced so the spec can assert the
    * batch shape. A real decoder replaces `decodeOne` only.
    */
  def decodeImages(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    def decodeOne(r: MediaRecord, batchId: Long): DecodedImage = {
      val n = r.payload.length
      DecodedImage(r.doc_id, 64 + n % 512, 64 + (n * 7) % 512, 3, batchId)
    }
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).zipWithIndex.flatMap { case (batch, i) =>
          // one per-batch codec invocation happens here in a real impl
          batch.map(decodeOne(_, i.toLong))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** STUB resize: new dims + a deterministic resampled checksum. The
    * plumbing point: resize composes on the decoded schema without
    * another shuffle (narrow transform).
    */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** STUB frame sampling: every k-th "frame" of a video payload, as an
    * exploded (doc, frame) table — the shape a frame-level training
    * pipeline consumes.
    */
  def sampleFrames(t: Tables, everyK: Int = 10): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = math.max(1, r.payload.length / 16)
        (0 until nFrames by everyK).map { i =>
          val h = r.payload.slice(i * 16, i * 16 + 16)
            .foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xFF))
          Frame(r.doc_id, i, h)
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Partition-batched decode via `mapPartitions` — the Scala analog of a
    * pandas-UDF `mapInPandas` stage: the (stub) codec is initialized once
    * per partition, then streams records through it. This is the seam
    * where a real decoder (JNI image/audio lib) plugs in per executor.
    */
  def decodeBatched(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition "codec" init happens here (stubbed: plain arithmetic)
        it.map { r =>
          val b = r.payload
          MediaFeatures(
            r.doc_id,
            b.length,
            if (b.nonEmpty) b.head & 0xFF else -1,
            if (b.nonEmpty) b.last & 0xFF else -1,
            b.foldLeft(0L)((acc, x) => acc * 31 + (x & 0xFF)))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  def binaryPipeline(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          col("source").as("origin"),
          col("n_chars").cast("long").as("n_bytes_declared"),
          lit("text/plain").as("mime")).as("meta"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        col("meta.origin").as("origin"),
        col("meta.mime").as("mime"),
        to_json(decodeStub(col("payload"))).as("features"))
      .orderBy("doc_id")
}
