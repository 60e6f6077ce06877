package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph/event analytics operators rounding out the engine's query surface:
  * degree-ordered triangle counting (q64 — the canonical "think about the
  * skew before you join" graph op), inactivity-gap sessionization (q65),
  * an ordered conversion funnel (q66), last-click attribution as a
  * joinless same-stream as-of (q67), and exact per-group percentiles
  * (q68). q64-q67 are integer/timestamp exact — no doubles anywhere a
  * summation order could bite — so their DuckDB oracles are bit-exact
  * with no rounding discipline; q68 follows the standard 4-decimal round.
  */
object AnalyticsQueries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------- q64

  /** q64 — triangle counting by degree orientation over q17's derived
    * customer/orders graph. The naive triangle join explodes on hubs: a
    * degree-d node contributes d² wedge candidates, and a web-scale hub
    * (d ~ 10^6) is a quadratic shuffle key. The standard fix, used here:
    * make edges undirected-distinct, then orient every edge from the
    * LOWER-(degree, id) endpoint to the higher one — each triangle is
    * counted exactly once from its minimum-rank corner, and the wedge join
    * fans out per node by its ORIENTED out-degree, which is O(√m) for any
    * graph (arboricity bound) no matter how skewed the raw degrees. Two
    * equi-joins, all integer keys; per-node counts + the global total.
    */
  def q64Triangles(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val n = t(dir, "customer").count()
    val dir0 = t(dir, "orders")
      .select(
        col("o_custkey").cast("long").as("src"),
        ((col("o_orderkey") * 7) % n + 1).cast("long").as("dst")
      )
    val (tc, rel) = triangleCountsReleasable(dir0)
    graft.core.CacheOps.drainSmall(
      tc.orderBy(col("n_triangles").desc, col("node").asc).limit(20),
      rel
    )
  }

  /** Core of q64 over any directed (src, dst) edge list: per-node triangle
    * participation counts in the undirected simple graph. The ORIENTED edge
    * table is checkpointed (r6): it feeds three join sides (both wedge legs
    * + the closing probe), each of which used to replay the
    * distinct + degree-join orientation from scratch.
    */
  private[graft] def triangleCountsReleasable(edges: DataFrame): (DataFrame, () => Unit) = {
    val dir0 = edges.filter(col("src") =!= col("dst"))
    // undirected-distinct: canonical (min, max) form
    val und = dir0
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und
      .select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("d"))
    // orient by (degree, id) rank: from lower to higher
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), Seq("b"))
    val (oriented, relO) = graft.core.CacheOps.checkpointReleasable(
      withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b"))
          .as("u"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a"))
          .as("v")
      )
    )
    // wedges from each min-rank corner, closed against oriented edges
    val e1 = oriented.select(col("u"), col("v").as("x"))
    val e2 = oriented.select(col("u").as("__u2"), col("v").as("y"))
    val wedges = e1.join(e2, col("u") === col("__u2")).filter(col("x") < col("y")).select("u", "x", "y")
    val tri = wedges
      .join(oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    // per-corner participation: every triangle credits all three nodes
    val out = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
    (out, relO)
  }

  /** [[triangleCountsReleasable]] with the cache left to the ContextCleaner
    * — the convenience form for specs.
    */
  private[graft] def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsReleasable(edges)._1
  val q64Sql: String =
    """WITH nn AS (SELECT count(*) AS n FROM customer),
      |d0 AS (SELECT CAST(o_custkey AS BIGINT) AS src,
      |              CAST((o_orderkey * 7) % (SELECT n FROM nn) + 1 AS BIGINT) AS dst
      |       FROM orders),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM d0 WHERE src <> dst),
      |deg AS (SELECT node, count(*) AS d FROM (
      |          SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
      |        GROUP BY node),
      |o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS u,
      |             CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS v
      |      FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b),
      |tri AS (SELECT e1.u, e1.v AS x, e2.v AS y
      |        FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v
      |        JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
      |per AS (SELECT node, count(*) AS n_triangles FROM (
      |          SELECT u AS node FROM tri UNION ALL
      |          SELECT x AS node FROM tri UNION ALL
      |          SELECT y AS node FROM tri)
      |        GROUP BY node)
      |SELECT node, n_triangles FROM per
      |ORDER BY n_triangles DESC, node ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q65

  /** Session inactivity gap: a new session starts when a user's gap from
    * their previous event exceeds 30 minutes — the classic web-analytics
    * convention.
    */
  private[graft] val SessionGapMin = 30L

  /** q65 — sessionization + per-user session summary. Per-user event
    * ordering (lag → gap > 30 min → running sum of session starts) is a
    * user-keyed window — the scale-safe kind: partitions are users, never
    * the global stream (contrast q57's global prefix sum, which needed the
    * two-phase form). Output is the per-user summary, all integers:
    * session count, largest session, total in-session minutes.
    */
  def q65Sessionize(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    val ev = t(dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val gapUs = SessionGapMin * 60L * 1000000L
    val sess = ev
      .withColumn("prev", lag("ts_us", 1).over(byUser))
      .withColumn("new_s", when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum("new_s").over(byUser))
    sess
      .groupBy("user_id", "sess")
      // `div`, not `/`: Spark's `/` on longs returns DOUBLE and a cast back
      // truncates while DuckDB's CAST rounds — integer division on both
      // sides keeps the oracle bit-exact
      .agg(count(lit(1)).as("n_ev"), expr("(max(ts_us) - min(ts_us)) div 60000000").as("mins"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("n_ev").as("max_session_events"),
        sum("mins").as("total_session_mins")
      )
      .orderBy("user_id")
  }
  val q65Sql: String = {
    val gapUs = SessionGapMin * 60L * 1000000L
    s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |g AS (SELECT user_id, event_id, ts_us,
      |             CASE WHEN lag(ts_us) OVER w IS NULL
      |                    OR ts_us - lag(ts_us) OVER w > $gapUs THEN 1 ELSE 0 END AS new_s
      |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
      |s AS (SELECT user_id, ts_us,
      |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |      FROM g),
      |per AS (SELECT user_id, sess, count(*) AS n_ev,
      |               (max(ts_us) - min(ts_us)) // 60000000 AS mins
      |        FROM s GROUP BY user_id, sess)
      |SELECT user_id, count(*) AS n_sessions,
      |       max(n_ev) AS max_session_events,
      |       CAST(sum(mins) AS BIGINT) AS total_session_mins
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q66

  /** q66 — ordered conversion funnel signup → click → purchase: a user
    * counts at stage k only with a stage-k event STRICTLY AFTER their
    * stage-(k−1) entry time (first-touch attribution). Three user-key
    * aggregations chained by broadcast-joinable per-user stage times —
    * each stage's survivor set only shrinks, so the joins get cheaper down
    * the funnel. All timestamps integer microseconds: exact.
    */
  def q66Funnel(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val ev = t(dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val s1 = ev.filter(col("event_type") === "signup").groupBy("user_id").agg(min("ts_us").as("t1"))
    val s2 = ev
      .filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts_us") > col("t1"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t2"))
    val s3 = ev
      .filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts_us") > col("t2"))
      .groupBy("user_id")
      .agg(min("ts_us").as("t3"))
    val sp = spark; import sp.implicits._
    Seq(
      ("1_signup", s1.count()),
      ("2_click_after_signup", s2.count()),
      ("3_purchase_after_click", s3.count())
    ).toDF("stage", "n_users")
  }
  val q66Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, min(ts_us) AS t2 FROM ev JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > t1 GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, min(ts_us) AS t3 FROM ev JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY ev.user_id)
      |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_click_after_signup', count(*) FROM s2
      |UNION ALL SELECT '3_purchase_after_click', count(*) FROM s3
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q67

  /** q67 — last-click attribution: for every purchase, the same user's
    * most recent click at-or-before it. This is an AS-OF JOIN — and the
    * Spark-first observation is that when both sides live in the SAME
    * stream, it needs no join at all: one per-user ordered window pass
    * carries the running "last click time" (`max(when(click, ts))` over
    * unbounded-preceding — max skips nulls), and every purchase row reads
    * its attribution off the frame. One shuffle on the user key, zero
    * join build sides, no range-condition blowup. Ties (a click and a
    * purchase on the same microsecond) break by event_id order, mirrored
    * in the oracle. All integers via `div`.
    */
  def q67Attribution(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    attribution(
      t(dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    ).orderBy("user_id")
  }

  /** Core of q67 over any (user_id, event_id, event_type, ts_us) stream. */
  private[graft] def attribution(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("last_click", max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("last_click")).as("n_attributed"),
        coalesce(expr("max((ts_us - last_click) div 60000000)"), lit(-1L)).as("max_lag_mins"),
        coalesce(expr("sum((ts_us - last_click) div 60000000)"), lit(-1L)).as("sum_lag_mins")
      )
  }
  val q67Sql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |a AS (SELECT user_id, event_type, ts_us,
      |             max(CASE WHEN event_type = 'click' THEN ts_us END)
      |               OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      |      FROM ev)
      |SELECT user_id, count(*) AS n_purchases,
      |       count(last_click) AS n_attributed,
      |       coalesce(max((ts_us - last_click) // 60000000), -1) AS max_lag_mins,
      |       coalesce(CAST(sum((ts_us - last_click) // 60000000) AS BIGINT), -1) AS sum_lag_mins
      |FROM a WHERE event_type = 'purchase' GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q68

  /** q68 — exact per-group percentiles (p50/p90/p99 of order value per
    * nation): Spark's `percentile` and DuckDB's `quantile_cont` share the
    * linear-interpolation definition, so the oracle is value-level after
    * the standard 4-decimal rounding (the two engines may fuse the
    * interpolation differently — 1-ulp noise, 9 orders of magnitude under
    * the rounding). Exact percentile buffers each group, which is right
    * for BOUNDED group counts like nations; an unbounded-cardinality
    * grouping at 100 TB would switch to `approx_percentile` (t-digest,
    * mergeable, bounded memory) and a rows-only check — documented here,
    * deliberately not what this query pins.
    */
  def q68Percentiles(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "orders")
      .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9D)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99D)"), 4).as("p99")
      )
      .orderBy("nation")
  }
  val q68Sql: String =
    """SELECT n.n_name AS nation, count(*) AS n_orders,
      |       CAST(round(quantile_cont(o.o_totalprice, 0.5), 4) AS DOUBLE) AS p50,
      |       CAST(round(quantile_cont(o.o_totalprice, 0.9), 4) AS DOUBLE) AS p90,
      |       CAST(round(quantile_cont(o.o_totalprice, 0.99), 4) AS DOUBLE) AS p99
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY nation""".stripMargin

  // ---------------------------------------------------------------- q71

  /** Trailing-window length (rows, i.e. active days) for q71. */
  private[graft] val BurstTrailDays = 7
  /** Minimum trailing active days before a day can be judged a burst. */
  private[graft] val BurstMinTrail = 3
  /** Burst rule: today ≥ [[BurstMult]] × trailing mean. */
  private[graft] val BurstMult = 2L

  /** q71 — trailing-window burst detection: flag (entity, day) pairs whose
    * event count is ≥ [[BurstMult]]× the entity's trailing mean over its
    * previous [[BurstTrailDays]] active days. This is the crawler's
    * hot-host detector — the signal a politeness budget allocator throttles
    * on (a host whose new-URL rate doubles overnight is a crawler trap or
    * a site migration; q62's Poisson rate covers the SLOW drift, this
    * covers the spike). Scale shape: one entity/day aggregation (map-side
    * combinable), then an entity-keyed bounded-frame window — partitions
    * are entities, never the global stream, and the frame is O(1) rows.
    * The burst predicate is ALL-INTEGER (`n·cnt ≥ mult·s` instead of
    * `n ≥ mult·s/cnt`), so the cut is bit-exact across engines AND
    * overflow-safe: n·cnt ≤ [[BurstTrailDays]]·max_daily_count. The two
    * emitted doubles are single divisions of identical integers, rounded.
    */
  def q71BurstDetection(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val counts = t(dir, "events")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n"))
    burstDays(counts).orderBy("user_id", "day")
  }

  /** Core of q71 over any (user_id, day, n) daily-count table. */
  private[graft] def burstDays(counts: DataFrame): DataFrame = {
    val tw = Window
      .partitionBy("user_id")
      .orderBy(col("day").asc)
      .rowsBetween(-BurstTrailDays, -1)
    counts
      .withColumn("cnt", count("n").over(tw))
      .withColumn("s", sum("n").over(tw))
      .filter(
        col("cnt") >= BurstMinTrail && col("s") > 0 &&
          col("n") * col("cnt") >= lit(BurstMult) * col("s")
      )
      .select(
        col("user_id"),
        col("day"),
        col("n"),
        col("cnt").as("trail_days"),
        round(col("s").cast("double") / col("cnt"), 4).as("trail_mean"),
        round((col("n") * col("cnt")).cast("double") / col("s"), 4).as("ratio")
      )
  }
  val q71Sql: String =
    s"""WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT user_id, day, n,
      |             count(n) OVER tw AS cnt, sum(n) OVER tw AS s
      |      FROM c WINDOW tw AS (PARTITION BY user_id ORDER BY day
      |                           ROWS BETWEEN $BurstTrailDays PRECEDING AND 1 PRECEDING))
      |SELECT user_id, day, n, CAST(cnt AS BIGINT) AS trail_days,
      |       CAST(round(CAST(s AS DOUBLE) / cnt, 4) AS DOUBLE) AS trail_mean,
      |       CAST(round(CAST(n * cnt AS DOUBLE) / s, 4) AS DOUBLE) AS ratio
      |FROM w WHERE cnt >= $BurstMinTrail AND s > 0 AND n * cnt >= $BurstMult * s
      |ORDER BY user_id, day""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_triangles" -> q64Triangles _,
    "q65_sessionize" -> q65Sessionize _,
    "q66_funnel" -> q66Funnel _,
    "q67_attribution" -> q67Attribution _,
    "q68_percentiles" -> q68Percentiles _,
    "q71_burst_days" -> q71BurstDetection _
  )

  val oracles: Map[String, String] = Map(
    "q64_triangles" -> q64Sql,
    "q65_sessionize" -> q65Sql,
    "q66_funnel" -> q66Sql,
    "q67_attribution" -> q67Sql,
    "q68_percentiles" -> q68Sql,
    "q71_burst_days" -> q71Sql
  )
}
