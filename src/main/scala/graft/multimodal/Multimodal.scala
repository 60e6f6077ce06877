package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The decode step is a clearly-marked STUB (this container has no image or
  * audio codecs): [[decodeStub]] derives a deterministic fake feature
  * vector (a normalized 16-bin byte histogram) from the raw bytes. The
  * Spark-side plumbing — schema, batching via mapPartitions, feature
  * schema, frame sampling — is real and tested; a production deployment
  * replaces only the stub body with a codec call.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long, features: Array[Float], checksum: Long)

  /** STUB: stands in for an image/audio decode. Deterministic pure function
    * of the bytes so tests and oracles are stable.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length.toFloat; j += 1 }
    }
    hist
  }

  /** "Frame sampling": every stride-th fixed-size block of the payload
    * (the video-frame analog; a real impl samples decoded frames).
    */
  def frameSampleStub(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + frameSize <= bytes.length) {
      out += java.util.Arrays.copyOfRange(bytes, off, off + frameSize)
      off += frameSize * stride
    }
    out.result()
  }

  /** Batched feature extraction over a media Dataset. mapPartitions keeps
    * the (real-world expensive) decode amortized per partition — the same
    * batch shape a Pandas-UDF/Arrow path would use.
    */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = decodeStub(m.media)
        val checksum = m.media.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        MediaFeatures(m.doc_id, m.media_type, m.media.length.toLong, f, checksum)
      }
    }
  }

  /** Wraps the documents table as a media table (text bytes as the opaque
    * payload) — the fixture path used by queries and tests.
    */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4")
          .as("media_type"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height")
      )
      .as[MediaRow]
  }

  /** Feature table with a stable scalar per doc (used by q32). */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurize(documentsAsMedia(spark, dir))
      .select(
        col("doc_id"),
        col("media_type"),
        col("n_bytes"),
        col("checksum"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
        round(element_at(col("features"), 8).cast("double"), 4).as("f7")
      )
      .orderBy("doc_id")
  }
}
