package graft.round

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-table IO behind a thin trait (SURVEY.md §7.1).
  *
  * The sandbox has no Iceberg runtime jar, so the shipped implementation is
  * plain Parquet with per-round snapshot directories and an explicit
  * completion marker — the same semantics an Iceberg snapshot commit gives
  * (atomic visibility of a round's state, resumability from the last
  * complete round). An Iceberg-backed implementation drops in behind the
  * same trait where the runtime exists (MERGE INTO replaces
  * overwrite-per-round).
  */
trait TableIO {
  def write(round: Long, name: String, df: DataFrame): Unit
  def read(round: Long, name: String): DataFrame
  def exists(round: Long, name: String): Boolean
  def commitRound(round: Long): Unit

  /** Largest round with a commit marker, or -1. */
  def lastCompleteRound(): Long
}

class ParquetTableIO(spark: SparkSession, val root: String) extends TableIO {
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(root),
    spark.sparkContext.hadoopConfiguration
  )
  private def roundDir(round: Long) = s"$root/r=$round"
  private def marker(round: Long) =
    new org.apache.hadoop.fs.Path(s"${roundDir(round)}/_COMPLETE")

  override def write(round: Long, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"${roundDir(round)}/$name")

  override def read(round: Long, name: String): DataFrame =
    spark.read.parquet(s"${roundDir(round)}/$name")

  override def exists(round: Long, name: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"${roundDir(round)}/$name/_SUCCESS"))

  override def commitRound(round: Long): Unit = {
    val out = fs.create(marker(round), true)
    out.close()
  }

  override def lastCompleteRound(): Long = {
    val base = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(base)) return -1L
    fs.listStatus(base)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("r=") => s.substring(2).toLong }
      .filter(r => fs.exists(marker(r)))
      .foldLeft(-1L)(math.max)
  }
}
