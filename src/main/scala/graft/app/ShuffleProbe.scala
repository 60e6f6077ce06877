package graft.app

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Sessions, WalkRow}

/** Diagnostic: shuffle + cache + parquet-write scaling (the phases that
  * dominate a crawl round). Args: <cores> [walks]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nWalks = if (args.length > 1) args(1).toInt else 2000000
    val spark = Sessions.local(cores, appName = s"shuffle-probe-$cores")
    import spark.implicits._
    val dir = Files.createTempDirectory("shuffle-probe").toString

    val walks = spark
      .range(0, nWalks.toLong, 1, cores * 4)
      .map { i =>
        val len = 1 + (graft.core.Rng.hash(1L, i, 0, 0) & 7).toInt
        WalkRow(i, i % 100000, Array.tabulate(len)(j => graft.core.Rng.hash(2L, i, j, 0) % 100000))
      }
      .persist()
    val t0 = System.nanoTime()
    walks.count() // materialize cache (gen + cache build)
    val cacheSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val visits = walks.select(explode($"path").as("node")).groupBy("node").count()
    val total = visits.agg(sum("count")).first().getLong(0)
    val shuffleSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    walks.toDF.write.mode("overwrite").parquet(s"$dir/walks")
    val writeSec = (System.nanoTime() - t2) / 1e9

    val t3 = System.nanoTime()
    val mapped = walks.map(w => WalkRow(w.walkId, w.start, w.path.map(_ + 1))).persist()
    mapped.count()
    val mapSec = (System.nanoTime() - t3) / 1e9

    println(
      s"""{"probe":"shuffle","cores":$cores,"walks":$nWalks,"total":$total,""" +
        s""""cacheSec":$cacheSec,"shuffleSec":$shuffleSec,"writeSec":$writeSec,"mapSec":$mapSec}"""
    )
    spark.stop()
  }
}
