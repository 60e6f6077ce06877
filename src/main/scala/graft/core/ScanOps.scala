package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism adaptation (guide §2.5 "input skew": one small
  * unsplittable file → repartition immediately after the read).
  *
  * A single-row-group parquet file cannot be split, so a scan of it is ONE
  * task — and everything Spark fuses into that scan stage (the tokenize /
  * shingle / hash explodes that dominate the text operators, the vector
  * folds over embeddings) serializes onto one core while the other 31 idle.
  * [[spread]] round-robin-repartitions the scan up to the session's default
  * parallelism, but ONLY when the plan's native parallelism is below it: a
  * production-scale corpus scan has thousands of splits, making this a
  * structural no-op there — the repartition cost (one shuffle of the raw
  * rows) is paid exactly when the data is small enough for it to be trivial.
  *
  * Round-robin repartition is retry-safe: sort-before-repartition
  * (SPARK-23207) is on by default, and the inputs here are deterministic
  * scans/checkpoints. Callers must pass plans whose `.rdd` is cheap to ask
  * for partitions — raw scans, narrow projections over scans, or
  * checkpoints (an AQE plan with shuffles would materialize them eagerly).
  */
object ScanOps {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
