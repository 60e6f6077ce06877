package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. This host's run-to-run
  * variance is up to 50% (BASELINE.md §3), so each query is timed
  * SPARK_GRAFT_BENCH_REPS times (default 3, rep-major order) and the
  * reported per-query number is the MEDIAN; `queries_spread` carries
  * max−min per query so round-over-round comparisons can ignore
  * noise-dominated deltas.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up (codegen + parquet footer caches) so the first timed
    // query doesn't absorb ~3.5s of one-time session cost
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = SparkEntry.queries.keys.toSeq
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L
        }
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val med = names.map(n => n -> median(times(n)))
    val spread = names.map(n => n -> (times(n).max - times(n).min))
    def js(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    // nothing may follow the JSON line on either stream: the harness
    // extracts it from captured output, and shutdown INFO logging after it
    // can push it out of a tail window (round-3 capture parsed as None)
    spark.sparkContext.setLogLevel("ERROR")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""queries":${js(med)},"queries_spread":${js(spread)},"sf":"$sfDir"}"""
    )
    System.out.flush()
    spark.stop()
  }
}
