package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-inventory queries over the driver's testdata tables, each with
  * a DuckDB oracle (SparkEntry.oracleSql). Every query maps to entries of
  * SURVEY.md §2 (cited per query) — the same operator the crawl engine uses,
  * expressed over the TPC-H-ish tables so the DuckDB gate can check it.
  *
  * Parity rules (driver hashes values after sorting columns by name):
  * float aggregates are rounded and cast to double on both sides; sums of
  * integers are cast to bigint (DuckDB sums int32 into hugeint); every
  * query has a deterministic ORDER BY on a unique key.
  */
object RelationalQueries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** q01 — newest-per-key argmax (W1/S3: Pool.Query dedup keeping newest,
    * tie-break smallest id; /root/reference/pkg/relays/pool.go:307-329).
    */
  def q01NewestPerKey(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").asc)
    t(dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), round(col("value"), 2).as("value_r"))
      .orderBy("user_id")
  }
  val q01Sql: String =
    """SELECT user_id, event_id, event_type, CAST(round(value, 2) AS DOUBLE) AS value_r
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q02 — semi join (F2 TrustPolicy / J4 known-author filter: keep events
    * whose author exists in the graph).
    */
  def q02SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .join(t(dir, "customer"), col("user_id") === col("c_custkey"), "left_semi")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }
  val q02Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events WHERE user_id IN (SELECT c_custkey FROM customer)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q03 — anti join (J9 frontier × seen-set: the central dedup join of the
    * crawl engine; /root/reference/pkg/pipe/firehose/firehose.go:61-64).
    */
  def q03AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "customer")
      .join(t(dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }
  val q03Sql: String =
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q04 — 3-way delta partition (A1/E1 NewDelta Remove/Keep/Add,
    * /root/reference/pkg/graph/graph.go:84-92): per user, the event-type
    * set of the first half-month vs the second.
    */
  def q04DeltaPartition(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = t(dir, "events")
    val cut = lit("2024-01-16").cast("timestamp")
    val early = ev.filter(col("ts") < cut).select("user_id", "event_type").distinct()
    val late = ev.filter(col("ts") >= cut).select("user_id", "event_type").distinct()
    early
      .withColumn("e", lit(1))
      .join(late.withColumn("l", lit(1)), Seq("user_id", "event_type"), "full_outer")
      .groupBy("user_id")
      .agg(
        sum(when(col("e").isNotNull && col("l").isNull, 1).otherwise(0)).cast("long").as("n_remove"),
        sum(when(col("e").isNotNull && col("l").isNotNull, 1).otherwise(0)).cast("long").as("n_keep"),
        sum(when(col("e").isNull && col("l").isNotNull, 1).otherwise(0)).cast("long").as("n_add")
      )
      .orderBy("user_id")
  }
  val q04Sql: String =
    """WITH early AS (SELECT DISTINCT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-16'),
      |late AS (SELECT DISTINCT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
      |j AS (SELECT coalesce(e.user_id, l.user_id) AS user_id,
      |             CASE WHEN e.user_id IS NOT NULL THEN 1 END AS e,
      |             CASE WHEN l.user_id IS NOT NULL THEN 1 END AS l
      |      FROM early e FULL OUTER JOIN late l ON e.user_id = l.user_id AND e.event_type = l.event_type)
      |SELECT user_id,
      |       CAST(sum(CASE WHEN e IS NOT NULL AND l IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_remove,
      |       CAST(sum(CASE WHEN e IS NOT NULL AND l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |       CAST(sum(CASE WHEN e IS NULL AND l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_add
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q05 — degree counts (A6 FollowCounts/FollowerCounts,
    * /root/reference/pkg/regraph/graph.go:317-324).
    */
  def q05Degree(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("out_degree"), round(sum(col("o_totalprice")), 2).as("total_spend"))
      .orderBy("o_custkey")
  }
  val q05Sql: String =
    """SELECT o_custkey, count(*) AS out_degree, CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q06 — per-group top-k (W3 politeness window: top hostBudget per host;
    * /root/reference/pkg/pipe/fetcher/fetcher.go:82-93 analog).
    */
  def q06PolitenessTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("c_nationkey"), col("rn"), col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal_r"))
      .orderBy("c_nationkey", "rn")
  }
  val q06Sql: String =
    """SELECT c_nationkey, rn, c_custkey, CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal_r
      |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      |      FROM customer)
      |WHERE rn <= 2 ORDER BY c_nationkey, rn""".stripMargin

  /** q07 — daily tumbling stats (A7/A8/W4/T6 recorder daily HLL stats;
    * exact distinct here so the oracle matches bit-for-bit;
    * /root/reference/pkg/stats/stats.go:60-127).
    */
  def q07DailyStats(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value")
      )
      .orderBy("day", "event_type")
  }
  val q07Sql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
      |       CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** q08 — running aggregate window (frame spec; generalizes the windowed
    * sampling of W2).
    */
  def q08RunningSum(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(dir, "orders")
      .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "running_spend")
      .orderBy("o_custkey", "o_orderkey")
  }
  val q08Sql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q09 — global top-k (L1 query result cap,
    * /root/reference/pkg/relays/relay.go:565-574).
    */
  def q09TopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price_r"))
  }
  val q09Sql: String =
    """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice, 2) AS DOUBLE) AS price_r
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q10 — multi-way join + aggregation (J1/J2 id↔key lookup joins; join
    * reorder is Catalyst's job, SURVEY.md §4).
    */
  def q10Join3Agg(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "region")
      .join(t(dir, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(t(dir, "customer"), col("n_nationkey") === col("c_nationkey"))
      .join(t(dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("r_name")
  }
  val q10Sql: String =
    """SELECT r_name, count(*) AS n_orders, CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |JOIN customer ON n_nationkey = c_nationkey JOIN orders ON c_custkey = o_custkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q11 — string normalization pipeline (F6 URL canonicalization analog:
    * lowercase + regex strip; /root/reference/pkg/relays/relay.go:467-547).
    */
  def q11StringCanon(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        regexp_replace(lower(col("p_name")), "[aeiou]", "").as("name_novowels"),
        length(col("p_name")).cast("int").as("name_len")
      )
      .orderBy("p_partkey")
  }
  val q11Sql: String =
    """SELECT p_partkey, lower(p_type) AS type_lc,
      |       regexp_replace(lower(p_name), '[aeiou]', '', 'g') AS name_novowels,
      |       CAST(length(p_name) AS INT) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q12 — table-level set operations (E2/E3 dedup + union), computed as
    * ONE full-outer join + aggregate (one Spark job, not three actions).
    */
  def q12SetOps(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val users = t(dir, "events").select(col("user_id").cast("long").as("k")).distinct().withColumn("u", lit(1))
    val custs = t(dir, "customer").select(col("c_custkey").cast("long").as("k")).distinct().withColumn("c", lit(1))
    users
      .join(custs, Seq("k"), "full_outer")
      .agg(
        count(lit(1)).as("n_union"),
        sum(when(col("u").isNotNull && col("c").isNotNull, 1).otherwise(0)).cast("long").as("n_intersect"),
        sum(when(col("u").isNotNull && col("c").isNull, 1).otherwise(0)).cast("long").as("n_except")
      )
  }
  val q12Sql: String =
    """WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS k FROM events),
      |c AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k FROM customer)
      |SELECT (SELECT count(*) FROM (SELECT k FROM u UNION SELECT k FROM c)) AS n_union,
      |       (SELECT count(*) FROM (SELECT k FROM u INTERSECT SELECT k FROM c)) AS n_intersect,
      |       (SELECT count(*) FROM (SELECT k FROM u EXCEPT SELECT k FROM c)) AS n_except""".stripMargin

  /** q13 — kind-dependent canonical key (P4,
    * /root/reference/pkg/relays/pool.go:307-317): replaceable kinds key by
    * (kind, author), others by id.
    */
  def q13CanonicalKey(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .withColumn(
        "ckey",
        when(
          col("event_type").isin("signup", "purchase"),
          concat(col("event_type"), lit(":"), col("user_id").cast("string"))
        ).otherwise(col("event_id").cast("string"))
      )
      .groupBy("event_type")
      .agg(countDistinct(col("ckey")).as("n_keys"), count(lit(1)).as("n_rows"))
      .orderBy("event_type")
  }
  val q13Sql: String =
    """SELECT event_type, count(DISTINCT ckey) AS n_keys, count(*) AS n_rows
      |FROM (SELECT event_type,
      |             CASE WHEN event_type IN ('signup','purchase')
      |                  THEN event_type || ':' || CAST(user_id AS VARCHAR)
      |                  ELSE CAST(event_id AS VARCHAR) END AS ckey
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q14 — JSON field extraction (C12 profile JSON → FTS projection,
    * /root/reference/pkg/store/schema.sql:19-23).
    */
  def q14JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(pmod(col("k_val"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("n"), max(col("k_val")).as("max_k"))
      .orderBy("k_mod")
  }
  val q14Sql: String =
    """SELECT CAST(json_extract_string(props, 'k') AS INT) % 10 AS k_mod, count(*) AS n,
      |       max(CAST(json_extract_string(props, 'k') AS INT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  /** q15 — lag/gap analytics (sessionization primitive; streaming T1-T3
    * batch analog).
    */
  def q15UserGaps(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn(
        "gap_us",
        unix_micros(col("ts").cast("timestamp")) - unix_micros(col("prev_ts").cast("timestamp"))
      )
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_us")).cast("long").as("sum_gap_us"))
      .orderBy("user_id")
  }
  val q15Sql: String =
    """SELECT user_id, count(*) AS n_gaps,
      |       CAST(sum(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS sum_gap_us
      |FROM (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      |      FROM events)
      |WHERE prev_ts IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q16 — value histogram (A5 frequencyMap analog,
    * /root/reference/pkg/pagerank/pagerank.go:296-310).
    */
  def q16Histogram(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .withColumn("bucket", floor(col("value") / 50.0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 3).as("avg_value"))
      .orderBy("bucket")
  }
  val q16Sql: String =
    """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS n,
      |       CAST(round(avg(value), 3) AS DOUBLE) AS avg_value
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q17 — iterative PageRank (U5 rank analog with a FULL oracle: the Scala
    * loop vs a DuckDB recursive CTE; damping 0.85, 5 iterations, dangling
    * mass dropped identically on both sides). Graph: customers as nodes,
    * synthetic deterministic edges derived from orders.
    */
  def q17PagerankIter(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val n = t(dir, "customer").count()
    val nodes = t(dir, "customer").select(col("c_custkey").cast("long").as("node"))
    // NO persist: the edges-distinct and degree subplans recur in every
    // iteration of the lazy plan, and Spark's exchange reuse materializes
    // each shared shuffle once per evaluation — same recompute bound as a
    // cache, but nothing outlives the query (the r2 persist leaked across
    // a long driver session) and count()-style consumers keep full
    // column-pruning freedom.
    val edges = t(dir, "orders")
      .select(
        col("o_custkey").cast("long").as("src"),
        ((col("o_orderkey") * 7) % n + 1).cast("long").as("dst")
      )
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks, col("src") === col("node"))
        .join(deg, Seq("src"))
        .select(col("dst"), (col("rank") / col("d")).as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), (lit(0.15 / n) + lit(0.85) * coalesce(col("inflow"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node"), round(col("rank") * 1000, 6).as("rank_k")).orderBy("node")
  }
  val q17Sql: String =
    """WITH RECURSIVE
      |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer),
      |params AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer),
      |edges AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
      |                 CAST((o_orderkey * 7) % (SELECT CAST(n AS BIGINT) FROM params) + 1 AS BIGINT) AS dst
      |          FROM orders),
      |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
      |pr(iter, node, rank) AS (
      |  SELECT 0, node, 1.0 / (SELECT n FROM params) FROM nodes
      |  UNION ALL
      |  SELECT it.iter + 1, nd.node,
      |         0.15 / (SELECT n FROM params) + 0.85 * coalesce((
      |           SELECT sum(p2.rank / deg.d) FROM pr p2
      |           JOIN edges e ON e.src = p2.node JOIN deg ON deg.src = e.src
      |           WHERE e.dst = nd.node AND p2.iter = it.iter), 0)
      |  FROM (SELECT DISTINCT iter FROM pr WHERE iter < 5) it, nodes nd
      |)
      |SELECT node, CAST(round(rank * 1000, 6) AS DOUBLE) AS rank_k
      |FROM pr WHERE iter = 5 ORDER BY node""".stripMargin

  /** q35 — robots-style prefix gate: a (key, prefix) rules table anti-joined
    * against the stream, key-equality + prefix-match (the engine's robots
    * disallow join in Politeness.schedule, re-expressed over events so the
    * DuckDB oracle can verify it).
    */
  def q35PrefixGate(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val rules = Seq(("click", "1"), ("view", "2"), ("purchase", "3")).toDF("r_type", "r_prefix")
    t(dir, "events")
      .join(
        broadcast(rules),
        col("event_type") === col("r_type") && col("user_id").cast("string").startsWith(col("r_prefix")),
        "left_anti"
      )
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }
  val q35Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events e
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (VALUES ('click','1'), ('view','2'), ('purchase','3')) r(r_type, r_prefix)
      |  WHERE r.r_type = e.event_type AND CAST(e.user_id AS VARCHAR) LIKE r.r_prefix || '%')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q36 — first-detection records (the engine's leak-records table shape,
    * reference leaks.Record{DetectedAt, Status confirmed/suspected},
    * /root/reference/pkg/leaks/leaks.go:146-151): per user, the earliest
    * qualifying event, tiered by severity.
    */
  def q36DetectionRecords(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "events")
      .filter(col("value") >= 180)
      .groupBy("user_id")
      .agg(
        min(when(col("value") >= 220, col("ts"))).as("confirmed_at"),
        min(col("ts")).as("first_at"),
        count(lit(1)).as("n_evidence"),
        round(max(col("value")), 2).as("max_value")
      )
      .select(
        col("user_id"),
        when(col("confirmed_at").isNotNull, "confirmed").otherwise("suspected").as("status"),
        coalesce(col("confirmed_at"), col("first_at")).as("detected_at"),
        col("n_evidence"),
        col("max_value")
      )
      .orderBy("user_id")
  }
  val q36Sql: String =
    """SELECT user_id,
      |       CASE WHEN confirmed_at IS NOT NULL THEN 'confirmed' ELSE 'suspected' END AS status,
      |       coalesce(confirmed_at, first_at) AS detected_at, n_evidence, max_value
      |FROM (SELECT user_id, min(CASE WHEN value >= 220 THEN ts END) AS confirmed_at,
      |             min(ts) AS first_at, count(*) AS n_evidence,
      |             CAST(round(max(value), 2) AS DOUBLE) AS max_value
      |      FROM events WHERE value >= 180 GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  /** q37 — day-range enumeration + gap fill (C2 DailyRange,
    * /root/reference/pkg/stats/stats.go:191-200): for each low-id user,
    * every day of the global range with zero-filled daily event counts —
    * `sequence()` day generation left-joined to the sparse daily counts.
    */
  def q37DayFill(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = t(dir, "events")
    val bounds = ev.agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
    val days = bounds.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val users = ev.filter(col("user_id") <= 10).select(col("user_id")).distinct()
    val daily = ev
      .filter(col("user_id") <= 10)
      .groupBy(col("user_id").as("u"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    users
      .crossJoin(broadcast(days))
      .join(daily, users("user_id") === daily("u") && days("day") === daily("day"), "left")
      .select(users("user_id"), days("day"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("user_id", "day")
  }
  val q37Sql: String =
    """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
      |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
      |users AS (SELECT DISTINCT user_id FROM events WHERE user_id <= 10),
      |daily AS (SELECT user_id AS u, CAST(ts AS DATE) AS day, count(*) AS n
      |          FROM events WHERE user_id <= 10 GROUP BY 1, 2)
      |SELECT user_id, days.day AS day, coalesce(n, 0) AS n
      |FROM users CROSS JOIN days LEFT JOIN daily ON user_id = u AND daily.day = days.day
      |ORDER BY user_id, day""".stripMargin

  /** q40 — the engine's ACTUAL robots gate over a (host, prefix) rules
    * table against frontier-shaped urls (q35 oracles the prefix-gate shape
    * over events; this one runs the real url-path derivation —
    * Politeness.pathOf, the exact column expression Politeness.schedule
    * uses — so the regexp_replace + startsWith semantics are cross-engine
    * pinned, including non-http schemes and scheme-less urls). URLs are
    * synthesized deterministically from orders; every 7th gets an ftp
    * scheme, every 7th+1 none at all.
    */
  def q40RobotsGate(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val scheme = when(col("o_orderkey") % 7 === 0, lit("ftp://"))
      .when(col("o_orderkey") % 7 === 1, lit(""))
      .otherwise(lit("https://"))
    val host = concat(lit("h"), (col("o_custkey") % 20).cast("string"), lit(".example"))
    val urls = t(dir, "orders")
      .select(
        concat(
          scheme,
          host,
          lit("/p"),
          (col("o_orderkey") % 5).cast("string"),
          lit("/"),
          col("o_orderkey").cast("string")
        ).as("url"),
        host.as("host")
      )
    val rules = Seq(("h3.example", "/p1"), ("h7.example", "/p"), ("h11.example", "/p2/"))
      .toDF("host", "prefix")
    urls
      .withColumn("__path", graft.frontier.Politeness.pathOf(col("url")))
      .join(
        broadcast(rules.select(col("host").as("rhost"), col("prefix").as("rprefix"))),
        col("host") === col("rhost") && col("__path").startsWith(col("rprefix")),
        "left_anti"
      )
      .groupBy("host")
      .agg(count(lit(1)).as("n_allowed"), min(col("url")).as("first_url"))
      .orderBy("host")
  }
  val q40Sql: String =
    """WITH u AS (
      |  SELECT (CASE o_orderkey % 7 WHEN 0 THEN 'ftp://' WHEN 1 THEN '' ELSE 'https://' END)
      |           || 'h' || CAST(o_custkey % 20 AS VARCHAR) || '.example/p'
      |           || CAST(o_orderkey % 5 AS VARCHAR) || '/' || CAST(o_orderkey AS VARCHAR) AS url,
      |         'h' || CAST(o_custkey % 20 AS VARCHAR) || '.example' AS host
      |  FROM orders),
      |p AS (SELECT url, host, regexp_replace(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://)?[^/]*', '') AS path FROM u)
      |SELECT host, count(*) AS n_allowed, min(url) AS first_url
      |FROM p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (VALUES ('h3.example','/p1'), ('h7.example','/p'), ('h11.example','/p2/')) r(rhost, rprefix)
      |  WHERE r.rhost = p.host AND starts_with(p.path, r.rprefix))
      |GROUP BY host ORDER BY host""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_newest_per_key" -> q01NewestPerKey _,
    "q02_semi_join" -> q02SemiJoin _,
    "q03_anti_join" -> q03AntiJoin _,
    "q04_delta_partition" -> q04DeltaPartition _,
    "q05_degree" -> q05Degree _,
    "q06_politeness_topk" -> q06PolitenessTopK _,
    "q07_daily_stats" -> q07DailyStats _,
    "q08_running_sum" -> q08RunningSum _,
    "q09_topk" -> q09TopK _,
    "q10_join3_agg" -> q10Join3Agg _,
    "q11_string_canon" -> q11StringCanon _,
    "q12_set_ops" -> q12SetOps _,
    "q13_canonical_key" -> q13CanonicalKey _,
    "q14_json_extract" -> q14JsonExtract _,
    "q15_user_gaps" -> q15UserGaps _,
    "q16_histogram" -> q16Histogram _,
    "q17_pagerank_iter" -> q17PagerankIter _,
    "q35_prefix_gate" -> q35PrefixGate _,
    "q36_detection_records" -> q36DetectionRecords _,
    "q37_day_fill" -> q37DayFill _,
    "q40_robots_gate" -> q40RobotsGate _
  )

  val oracles: Map[String, String] = Map(
    "q01_newest_per_key" -> q01Sql,
    "q02_semi_join" -> q02Sql,
    "q03_anti_join" -> q03Sql,
    "q04_delta_partition" -> q04Sql,
    "q05_degree" -> q05Sql,
    "q06_politeness_topk" -> q06Sql,
    "q07_daily_stats" -> q07Sql,
    "q08_running_sum" -> q08Sql,
    "q09_topk" -> q09Sql,
    "q10_join3_agg" -> q10Sql,
    "q11_string_canon" -> q11Sql,
    "q12_set_ops" -> q12Sql,
    "q13_canonical_key" -> q13Sql,
    "q14_json_extract" -> q14Sql,
    "q15_user_gaps" -> q15Sql,
    "q16_histogram" -> q16Sql,
    "q17_pagerank_iter" -> q17Sql,
    "q35_prefix_gate" -> q35Sql,
    "q36_detection_records" -> q36Sql,
    "q37_day_fill" -> q37Sql,
    "q40_robots_gate" -> q40Sql
  )
}
