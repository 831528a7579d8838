package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded record per multimodal payload. */
case class DecodedMedia(doc_id: Long, n_bytes: Long, width: Long,
                        height: Long, channels: Long, checksum: String)

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with the decode step isolated behind a per-partition
  * batch function — exactly where a real image/audio decoder would
  * sit (`mapPartitions` is the Scala analog of `mapInPandas`: one
  * iterator per partition, so a decoder can amortize native-library
  * init across the batch).
  *
  * The decode itself is STUBBED with a deterministic fake (no media
  * libraries in this container): dimensions derive from byte length
  * and the first payload byte. Everything AROUND the stub — the
  * binary column, schema, partitioning, batch iteration, typed
  * output Encoder — is the real production plumbing and is what the
  * oracle verifies.
  */
object Multimodal {

  /** Binary payload column: utf-8 bytes of the text stand in for an
    * encoded image (same plumbing, checkable against the oracle).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** The stub decoder: REPLACE the body marked below with a real
    * codec call (e.g. javax.imageio / ffmpeg binding) — signature,
    * batching, and schema stay identical.
    */
  private def decodePartition(rows: Iterator[(Long, Array[Byte])]): Iterator[DecodedMedia] = {
    // real decoder init would happen ONCE here, before the batch loop
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, bytes) =>
      // --- stub: deterministic fake decode ---------------------------
      val n = bytes.length.toLong
      val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xff).toLong
      val checksum = md.digest(bytes).map("%02x".format(_)).mkString
      DecodedMedia(id, n,
        width = 64L + n % 577L,
        height = 64L + first % 97L,
        channels = 3L,
        checksum = checksum)
      // ---------------------------------------------------------------
    }
  }

  /** Decode payloads partition-batched; returns a typed Dataset whose
    * schema is the decoded-metadata contract.
    */
  def decode(s: SparkSession, payloads: DataFrame): Dataset[DecodedMedia] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodePartition)
  }

  def decodeQuery(s: SparkSession, dir: String): DataFrame =
    decode(s, withPayload(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  /** Feature extraction over the opaque payload: byte-level stats
    * (count, distinct alphabet, mean byte value) — the deterministic
    * stand-in for an embedding/feature model, with the same
    * plumbing: narrow projection over the binary column, all
    * codegen'd, no driver round-trip. The mean runs through the
    * native [[graft.functions.ByteSum]] kernel (the previous
    * aggregate/transform lambdas evaluated interpreted per BYTE —
    * the hot path at multimodal scale); the alphabet count keeps
    * `array_distinct`, which is a native function, not a lambda.
    */
  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        expr("size(array_distinct(split(decode(payload, 'UTF-8'), '')))")
          .cast("long").as("n_distinct_chars"),
        round(graft.functions.ByteSum(col("payload")).cast("double")
          / length(col("payload")), 4).as("mean_byte"))
      .orderBy("doc_id")

  /** Frame sampling: take every `stride`-th byte of the payload (the
    * shape of every-k-th-video-frame extraction), emit the sample
    * count and an md5 over the sampled "frames". Runs through the
    * native [[graft.functions.ByteSample]] kernel — the
    * transform-over-sequence lambda it replaces built one
    * single-char string per frame, interpreted.
    */
  def frameSampleQuery(s: SparkSession, dir: String,
                       stride: Int = 16): DataFrame =
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"),
        graft.functions.ByteSample(col("payload"), stride).as("sample"))
      .select(col("doc_id"),
        length(col("sample")).cast("long").as("n_frames"),
        md5(col("sample")).as("sample_md5"))
      .orderBy("doc_id")
}
