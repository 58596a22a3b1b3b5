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
        decodeStub(col("payload")).as("features"))
      .orderBy("doc_id")
}
