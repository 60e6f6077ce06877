package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CrawlParams
import graft.walks.WalkAlgebra

/** Engine-native operators exposed as driver queries. These use the seeded
  * walk machinery / Spark-specific sketches that ANSI SQL cannot express,
  * so they carry no DuckDB oracle (the driver records rows-only checks);
  * their real correctness gates are the ScalaTest suites (closed-form rank
  * vectors, crawl equivalence).
  */
object EngineQueries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** q29 — seeded Monte-Carlo walk rank (U1/U5/A2-A4) over the same derived
    * graph as q17: distributed walk generation with broadcast adjacency,
    * visit-count rank estimator. Deterministic under the counter-based RNG.
    */
  def q29WalkRank(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val n = t(dir, "customer").count()
    val nodes = t(dir, "customer").select(col("c_custkey").cast("long").as("node"))
    val edges = t(dir, "orders")
      .select(col("o_custkey").cast("long").as("src"), ((col("o_orderkey") * 7) % n + 1).cast("long").as("dst"))
      .distinct()
    val adjMap = edges
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    val bAdj = spark.sparkContext.broadcast(adjMap)
    val p = CrawlParams(walksPerNode = 100)
    val visits = nodes
      .as[Long]
      .flatMap { node =>
        val adjF: WalkAlgebra.Adjacency = v => bAdj.value.getOrElse(v, Array.empty)
        (0 until p.walksPerNode).flatMap { i =>
          WalkAlgebra.generateWalk(adjF, node, node * p.walksPerNode + i, 0L, 15, p)
        }
      }
      .toDF("node")
      .groupBy("node")
      .agg(count(lit(1)).as("visits"))
    val total = visits.agg(sum("visits")).first().getLong(0)
    visits
      .withColumn("rank", round(col("visits").cast("double") / total, 6))
      .orderBy("node")
  }

  /** q30 — bloom-filter seen-set pre-filter feeding an exact anti-join
    * (O4/J9: the LRU-dedup replacement, SURVEY.md §4). Single summary row:
    * bloom pass count is a superset of the exact unseen count.
    */
  def q30BloomSeen(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val seen = t(dir, "lineitem").select(col("l_orderkey").as("k"))
    val candidates = t(dir, "orders").select(col("o_orderkey").as("k"))
    val nCandidates = candidates.count()
    val bloom = seen.stat.bloomFilter("k", math.max(nCandidates, 1000L), 0.01)
    val bBloom = spark.sparkContext.broadcast(bloom)
    val maybeSeen = candidates.filter(r => bBloom.value.mightContain(r.getLong(0))).count()
    val exactUnseen = candidates.join(seen, Seq("k"), "left_anti").count()
    Seq((nCandidates, nCandidates - maybeSeen, exactUnseen))
      .toDF("n_candidates", "bloom_definitely_unseen", "exact_unseen")
  }

  /** q31 — HLL daily distinct (A7 stats.Record: approx_count_distinct is
    * the reference's HyperLogLog, /root/reference/pkg/stats/stats.go:60-81).
    */
  def q31ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n")
      )
      .orderBy("day")
  }

  /** q32 — multimodal feature extraction (stubbed decode, real batching —
    * graft.multimodal.Multimodal).
    */
  def q32MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.featureTable(spark, dir)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_walk_rank" -> q29WalkRank _,
    "q30_bloom_seen" -> q30BloomSeen _,
    "q31_approx_distinct" -> q31ApproxDistinct _,
    "q32_media_features" -> q32MediaFeatures _
  )
}
