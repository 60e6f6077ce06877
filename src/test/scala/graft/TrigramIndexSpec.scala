package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrigramIndex

/** Pins the persisted trigram index's two contracts (VERDICT r4 next-#7):
  *
  *  - probe-only IO: a search reads O(query trigrams) buckets of the
  *    postings, not the corpus — task-metrics records-read plus the plan's
  *    SelectedBucketsCount, the same evidence shape as the bucketed fetch
  *    store (BucketedIOSpec / N17);
  *  - value parity: index-backed search returns exactly the scan-based
  *    answer, including after a catalog drop (fresh-JVM resume path).
  */
class TrigramIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "trigram-index-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 5000 word-soup docs; doc 7 contains the needle phrase. */
  private def docs(): DataFrame = {
    val sp = spark; import sp.implicits._
    (0L until 5000L)
      .map { i =>
        val base = (0 until 20).map(j => s"w${(i * 31 + j * 7) % 997}").mkString(" ")
        val text = if (i == 7L) s"zqxjkvzq needle $base" else base
        (i, text)
      }
      .toDF("doc_id", "text")
  }

  test("probe reads O(query trigrams) buckets, matches the scan answer, survives a catalog drop") {
    val d = docs()
    val path = Files.createTempDirectory("trigram-idx").toString + "/idx"
    TrigramIndex.build(spark, d, path)
    assert(TrigramIndex.exists(spark, path))

    // short query = 4 distinct trigrams → at most 4 of 32 buckets
    val query = "zqxjkv"
    val qTri = query.sliding(3).toSeq.distinct
    assert(qTri.size == 4)

    val expected = TrigramIndex
      .postingsOf(d)
      .filter(col("g").isin(qTri: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_match"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(expected.contains((7L, 4L)), s"needle doc must match all 4 query trigrams: $expected")

    @volatile var recordsRead = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead += t.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    def settle(): Unit = {
      var last = -1L
      var spins = 0
      while (recordsRead != last && spins < 40) { last = recordsRead; Thread.sleep(200); spins += 1 }
    }
    def recordsReadBy(f: => Unit): Long = {
      settle(); recordsRead = 0L; f; settle(); recordsRead
    }
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = recordsReadBy {
        val res = TrigramIndex.search(spark, path, query).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(res == expected, s"index search mismatch: $res vs $expected")
      }
      val full = recordsReadBy(TrigramIndex.postings(spark, path).count())
      assert(full >= 100000L, s"control read $full postings; fixture should have ≥100k")
      assert(
        got <= full * (qTri.size + 2) / 32,
        s"probe read $got of $full postings; expected ≤ ~${qTri.size}/32 of the index"
      )

      // the plan itself reports the pruned bucket count
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probe = TrigramIndex.postings(spark, path).filter(col("g").isin(qTri: _*))
      probe.count()
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.nonEmpty, s"expected bucket pruning in the probe plan, got:\n$plan")
      assert(sel.get.group(1).toInt <= qTri.size, s"probe must read at most one bucket per query trigram: ${sel.get}")
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")

      // fresh-catalog resume: drop the catalog entry, search re-registers
      // from the on-disk marker and still prunes
      spark.catalog.listTables().collect().filter(_.name.startsWith("graft_tri_")).foreach { t =>
        spark.sql(s"DROP TABLE ${t.name}")
      }
      val res2 = TrigramIndex.search(spark, path, query).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(res2 == expected, "re-registered index must return the same answer")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("q48 == q44 on the same corpus dir (index path is value-identical to the scan path)") {
    val dir = Files.createTempDirectory("trigram-q48").toString
    docs()
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val q44 = graft.queries.TextQueries
      .q44TrigramSearch(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val q48 = graft.queries.TextQueries
      .q48IndexedSearch(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(q48 == q44, s"indexed search diverged from the scan: $q48 vs $q44")
  }
}
