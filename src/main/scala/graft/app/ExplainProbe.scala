package graft.app
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8, appName = "explain-probe")
    for (q <- args.tail) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
