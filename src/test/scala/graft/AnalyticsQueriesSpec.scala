package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries

/** Pins the analytics operators (q64-q66) on hand-countable fixtures:
  *
  *  - q64: exact triangle participation on a planted 2-triangle graph,
  *    invariant to edge direction, duplicates, and self-loops,
  *  - q65: session boundaries land exactly at the 30-minute gap rule,
  *  - q66: the funnel only counts stages reached IN ORDER.
  */
class AnalyticsQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "analytics-queries-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q64: planted triangles counted once per corner; direction/dupes/self-loops ignored") {
    val sp = spark; import sp.implicits._
    // triangles {1,2,3} and {2,3,4}; plus a self-loop, a duplicate edge
    // (both directions), and a dangling edge 5→6
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 4L), (4L, 3L),
      (3L, 2L), // duplicate of 2→3, reversed
      (4L, 4L), // self-loop
      (5L, 6L)
    ).toDF("src", "dst")
    val out = AnalyticsQueries
      .triangleCounts(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), s"got $out")
  }

  test("q65: session boundaries at the 30-minute gap rule, exactly") {
    val sp = spark; import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // user 1: events at 0, 10, 50, 51 → gap 40 splits: sessions {0,10}, {50,51}
    //   (10 + 1 session-minutes); user 2: single event → one 1-event session
    val events = Seq(
      (1L, 100L, at(0)), (1L, 101L, at(10)), (1L, 102L, at(50)), (1L, 103L, at(51)),
      (2L, 200L, at(0))
    ).toDF("user_id", "event_id", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("sessfix").toString
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = AnalyticsQueries
      .q65Sessionize(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((2L, 2L, 11L)), s"user 1: two sessions of 2 events, 10+1 mins: $out")
    assert(out(2L) === ((1L, 1L, 0L)), s"user 2: one single-event session: $out")
  }

  test("q67: attribution picks the LAST click at-or-before each purchase; unattributed stays -1") {
    val sp = spark; import sp.implicits._
    // user 1: click@0, click@5, purchase@7 (lag 2), purchase@8 (lag 3 —
    //   still attributed to the click@5); user 2: purchase before any click
    val events = Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "click", 300000000L),
      (1L, 3L, "purchase", 420000000L), (1L, 4L, "purchase", 480000000L),
      (2L, 5L, "purchase", 0L), (2L, 6L, "click", 60000000L)
    ).toDF("user_id", "event_id", "event_type", "ts_us")
    val out = AnalyticsQueries
      .attribution(events)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) === ((2L, 2L, 3L, 5L)), s"both purchases attribute to the latest prior click: $out")
    assert(out(2L) === ((1L, 0L, -1L, -1L)), s"purchase before any click is unattributed: $out")
  }

  test("q66: funnel counts stages only when reached in order") {
    val sp = spark; import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "signup", at(0)), (1L, "click", at(1)), (1L, "purchase", at(2)),
      // user 2: click BEFORE signup, purchase after — stage 2 never reached,
      // so the purchase cannot count either
      (2L, "click", at(0)), (2L, "signup", at(1)), (2L, "purchase", at(2)),
      // user 3: signup then click, purchase missing
      (3L, "signup", at(0)), (3L, "click", at(5)),
      // user 4: purchase only — no funnel entry
      (4L, "purchase", at(0))
    ).toDF("user_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("funnelfix").toString
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = AnalyticsQueries
      .q66Funnel(spark, tmp)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out === Map(
      "1_signup" -> 3L,              // users 1, 2, 3
      "2_click_after_signup" -> 2L,  // users 1, 3 (user 2's click precedes signup)
      "3_purchase_after_click" -> 1L // user 1 only
    ), s"got $out")
  }

  test("q71: burst rule fires at exactly mult x trailing mean, needs min trailing days, frame slides") {
    val sp = spark; import sp.implicits._
    // user 1: days 1-3 at n=2 (trail builds), day 4 n=4 = exactly 2x mean
    //   → flagged; day 5 n=3 < 2 x mean((2+2+2+4)/4 = 2.5) → not flagged
    // user 2: only 2 trailing days before its spike → below BurstMinTrail,
    //   never flagged however large the spike
    // user 3: a huge day 1 then 7 quiet days — day 9's verdict uses only
    //   the last 7 trailing rows, so the old spike has slid OUT of the
    //   frame and a modest n=4 (2 x the quiet mean 2) IS flagged
    val counts = (
      Seq((1L, 1L, 2L), (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 4L), (1L, 5L, 3L)) ++
        Seq((2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 100L)) ++
        (Seq((3L, 1L, 1000L)) ++ (2L to 8L).map(d => (3L, d, 2L)) ++ Seq((3L, 9L, 4L)))
    ).toDF("user_id", "day", "n")
    val out = AnalyticsQueries
      .burstDays(counts)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet === Set((1L, 4L), (3L, 9L)), s"got $out")
    assert(out((1L, 4L)) === ((4L, 3L, 2.0, 2.0)))
    // user 3 day 9: trailing frame = days 2-8 (7 rows, all n=2) — the
    // day-1 spike is outside the 7-row frame
    assert(out((3L, 9L)) === ((4L, 7L, 2.0, 2.0)))
  }
}
