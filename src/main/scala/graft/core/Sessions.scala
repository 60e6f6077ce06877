package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the local-mode defaults this project assumes.
  *
  * All knobs are chosen for correctness-parity with the DuckDB oracle
  * (UTC session time zone) and for local[N] execution (shuffle
  * partitions sized to cores, AQE on so skewed joins re-plan at
  * runtime — see SURVEY.md §4 "What Catalyst gives us for free").
  */
object Sessions {
  def local(cores: Int, shufflePartitions: Int = -1, appName: String = "graft"): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // The round fetch pushes an InSet(url) of up to a full batch into the
      // bucketed extracted store's scan. Above this threshold Spark
      // degrades the parquet-level filter to a min/max range — useless for
      // a random url batch — so raise it to the fetch prefilter cap:
      // bucket pruning prunes files at planning, and within a selected
      // url-SORTED bucket the exact IN predicate lets parquet skip row
      // groups outside the batch's url ranges (the point-lookup story at
      // production file sizes).
      .config("spark.sql.parquet.pushdown.inFilterThreshold", graft.round.RoundDriver.MaxFetchPrefilterUrls.toString)
      // Spark renders every action's FULL plan string for the
      // SQLExecutionStart event even with the UI off; iterative plans with
      // nested cached relations (the walker's hop chains) can make that
      // string gigabytes — a 12-round all-scale-paths soak OOMed the
      // driver INSIDE explainString. Cap it: truncating a debug string has
      // zero semantic effect and also removes minutes of string building
      // from generation-heavy rounds.
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
