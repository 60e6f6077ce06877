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
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      features: Array[Float],
      /** raw 16-bin high-nibble byte histogram `features` normalizes —
        * integer counts so downstream fractions can be computed in double
        * precision (the float vector alone is lossy at the oracle's
        * 4-decimal rounding).
        */
      hist: Array[Long],
      /** md5 hex of the payload bytes — integrity pin of the byte
        * plumbing, cross-engine comparable.
        */
      checksum: String
  )

  /** STUB decode, count form: stands in for an image/audio decode.
    * Deterministic pure function of the bytes so tests and oracles are
    * stable — a 16-bin histogram of each byte's high nibble.
    */
  def decodeCounts(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1L
      i += 1
    }
    hist
  }

  /** STUB: the normalized feature-vector form of [[decodeCounts]]. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val counts = decodeCounts(bytes)
    val hist = new Array[Float](16)
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) = counts(j).toFloat / bytes.length.toFloat; j += 1 }
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
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val counts = decodeCounts(m.media)
        val n = m.media.length
        val f = new Array[Float](16)
        if (n > 0) { var j = 0; while (j < 16) { f(j) = counts(j).toFloat / n.toFloat; j += 1 } }
        md.reset()
        val checksum = md.digest(m.media).map("%02x".format(_)).mkString
        MediaFeatures(m.doc_id, m.media_type, n.toLong, f, counts, checksum)
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

  /** Feature table with stable scalars per doc (used by q32). Fractions
    * derive from the integer counts in DOUBLE precision on both engines —
    * f2 = share of bytes with high nibble 2 (space/punctuation in text
    * payloads), f7 = high nibble 7 (letters p-z) — so the DuckDB oracle
    * matches bit-for-bit at 4-decimal rounding.
    */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    featurize(documentsAsMedia(spark, dir))
      .select(
        col("doc_id"),
        col("media_type"),
        col("n_bytes"),
        col("checksum"),
        round(element_at(col("hist"), 3).cast("double") / col("n_bytes").cast("double"), 4).as("f2"),
        round(element_at(col("hist"), 8).cast("double") / col("n_bytes").cast("double"), 4).as("f7")
      )
      .orderBy("doc_id")
  }
}
