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
  *   CorpusMain crawl <tiny|small|bench> <stateDir> <outDir> [cores] [minJaccard]
  *
  * The `crawl` form curates a crawl checkpoint's fetched corpus (newest
  * page versions, CorpusPipeline.crawlDocuments) — the crawl → train-ready
  * loop closed in one command. It skips the cascade's `non_english` rule
  * (the crawl fixture corpus is link soup with no English stopword
  * markers — the skip is recorded in the manifest's `skipped_rules`).
  *
  * Output: `<outDir>/corpus/split={train,val,test}/…` parquet and
  * `<outDir>/manifest.json`; the manifest line is also printed as the
  * final `{"event":"corpus",…}` JSON line for harness capture.
  */
object CorpusMain {
  private val usage =
    "usage: CorpusMain <sfDirOrParquet> <outDir> [cores] [minJaccard] | " +
      "CorpusMain crawl <tiny|small|bench> <stateDir> <outDir> [cores] [minJaccard]"

  def main(args: Array[String]): Unit = {
    val crawlMode = args.nonEmpty && args(0) == "crawl"
    if ((crawlMode && args.length < 4) || (!crawlMode && args.length < 2)) {
      System.err.println(usage)
      sys.exit(2)
    }
    val outDir = if (crawlMode) args(3) else args(1)
    val tailArgs = if (crawlMode) args.drop(4) else args.drop(2)
    val cores = tailArgs.headOption.map(_.toInt).getOrElse(8)
    val minJaccard = tailArgs.lift(1).map(_.toDouble).getOrElse(0.5)

    val spark: SparkSession = Sessions.local(cores, appName = "graft-corpus")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val documents =
      if (crawlMode) {
        val cfg = args(1) match {
          case "tiny"  => graft.fixtures.PagesGen.Tiny
          case "small" => graft.fixtures.PagesGen.Small
          case "bench" => graft.fixtures.PagesGen.Bench
          case other   => System.err.println(s"unknown scale '$other'\n$usage"); sys.exit(2); null
        }
        val io =
          if (sys.env.get("GRAFT_BUCKETED_IO").contains("1"))
            new graft.round.BucketedTableIO(spark, args(2))
          else new graft.round.ParquetTableIO(spark, args(2))
        CorpusPipeline.crawlDocuments(spark, io, cfg)
      } else {
        val docsPath = if (args(0).endsWith(".parquet")) args(0) else s"${args(0)}/documents.parquet"
        spark.read.parquet(docsPath)
      }
    val skipRules: Set[String] = if (crawlMode) Set("non_english") else Set.empty
    val (curated, manifest, release) =
      CorpusPipeline.curate(spark, documents, minJaccard, skipRules = skipRules)
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
