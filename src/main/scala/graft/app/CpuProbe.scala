package graft.app

import org.apache.spark.sql.SparkSession
import graft.core.Sessions

/** Diagnostic: pure-CPU Spark task scaling at two parallelism levels
  * (isolates task-execution scaling from the engine's logic).
  */
object CpuProbe {
  def work(spark: SparkSession, cores: Int): Double = {
    import spark.implicits._
    val t0 = System.nanoTime()
    // CPU-heavy deterministic work: hash chains per row
    val n = spark
      .range(0, 512L, 1, cores * 4)
      .map { i =>
        var h = i
        var k = 0
        while (k < 3000000) { h = graft.core.Rng.hash(42L, h, k.toLong, 7L); k += 1 }
        h
      }
      .filter(_ != 0L)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    require(n > 0)
    sec
  }

  def main(args: Array[String]): Unit = {
    Seq(8, 32).foreach { cores =>
      val spark = Sessions.local(cores, appName = s"cpu-probe-$cores")
      val warm = work(spark, cores)
      val timed = work(spark, cores)
      println(s"""{"probe":"cpu","cores":$cores,"warmSec":$warm,"sec":$timed}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
