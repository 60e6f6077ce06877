package graft.app

import graft.core.Sessions
import graft.fixtures.PagesGen
import graft.round.CrawlEngine

/** Diagnostic: allocation-heavy scaling probe (corpus generation +
  * extraction only). Args: <cores> [pages]
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val pages = if (args.length > 1) args(1).toInt else 200000
    val spark = Sessions.local(cores, appName = s"gen-probe-$cores")
    val cfg = PagesGen.Config(pages, 2000)
    val t0 = System.nanoTime()
    val n1 = PagesGen.generate(spark, cfg, partitions = cores * 4).count()
    val genSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val pagesDF = PagesGen.generate(spark, cfg, partitions = cores * 4).toDF
    val n2 = CrawlEngine.extractPages(spark, pagesDF).filter(!org.apache.spark.sql.functions.col("rejected")).count()
    val exSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"probe":"gen","cores":$cores,"pages":$pages,"genRows":$n1,"extractRows":$n2,"genSec":$genSec,"extractSec":$exSec,"heapMax":${Runtime.getRuntime.maxMemory() / (1L << 20)}}""")
    spark.stop()
  }
}
