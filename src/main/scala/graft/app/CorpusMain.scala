package graft.app

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.queries.CorpusPipeline

/** `spark-submit`-style corpus-curation entry: runs the full training-data
  * pipeline (exact dedup → LSH near-dup removal → quality cascade →
  * content-hash split) over a documents parquet and writes the curated
  * corpus partitioned by split plus a drop-accounting manifest.
  *
  *   CorpusMain <sfDirOrParquet> <outDir> [cores] [minJaccard]
  *
  * Output: `<outDir>/corpus/split={train,val,test}/…` parquet and
  * `<outDir>/manifest.json`; the manifest line is also printed as the
  * final `{"event":"corpus",…}` JSON line for harness capture.
  */
object CorpusMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: CorpusMain <sfDirOrParquet> <outDir> [cores] [minJaccard]")
      sys.exit(2)
    }
    val docsPath = if (args(0).endsWith(".parquet")) args(0) else s"${args(0)}/documents.parquet"
    val outDir = args(1)
    val cores = if (args.length > 2) args(2).toInt else 8
    val minJaccard = if (args.length > 3) args(3).toDouble else 0.5

    val spark: SparkSession = Sessions.local(cores, appName = "graft-corpus")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (curated, manifest, release) =
      CorpusPipeline.curate(spark, spark.read.parquet(docsPath), minJaccard)
    curated.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
    release()

    val fs = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$outDir/manifest.json"), true)
    try out.write((manifest.json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()

    val secs = (System.nanoTime() - t0) / 1e9
    println(s"""{"event":"corpus","wallSec":${"%.3f".formatLocal(java.util.Locale.ROOT, secs)},""" +
      s""""manifest":${manifest.json}}""")
    spark.stop()
  }
}
