package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.core.CrawlParams
import graft.fixtures.PagesGen
import graft.round.ParquetTableIO
import graft.streaming.StreamIngest

/** Streaming semantics T1-T6 (SURVEY.md §2.9) against the deterministic
  * corpus: watermarked dedup, daily tumbling stats, and crawl rounds driven
  * per micro-batch with offset + snapshot resumability.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, appName = "streaming-spec")

  val cfg = PagesGen.Tiny

  private def writeCorpusChunks(dir: String): Unit = {
    import spark.implicits._
    // chunk 1: first versions; chunk 2: re-published second versions
    val v1 = (0L until cfg.pages.toLong).map(pid => PagesGen.pageOf(cfg, pid, 1))
    val v2 = (0L until cfg.pages.toLong).filter(PagesGen.isRepublished).map(pid => PagesGen.pageOf(cfg, pid, 2))
    spark.createDataset(v1).toDF.coalesce(1).write.mode("append").parquet(dir)
    spark.createDataset(v2).toDF.coalesce(1).write.mode("append").parquet(dir)
  }

  test("watermarked dedup keeps one row per url (bounded-state LRU analog)") {
    val dir = Files.createTempDirectory("stream-pages").toString
    writeCorpusChunks(dir)
    val q = StreamIngest
      .dedupedStream(StreamIngest.pagesStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName("deduped")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("select count(*) as n, count(distinct url) as u from deduped").first()
    assert(got.getLong(0) === got.getLong(1)) // no url twice
    assert(got.getLong(0) === cfg.pages.toLong)
  }

  test("daily tumbling stats stream matches batch aggregation") {
    val dir = Files.createTempDirectory("stream-stats").toString
    writeCorpusChunks(dir)
    val q = StreamIngest
      .dailyStats(StreamIngest.pagesStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName("daily")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select lang, sum(n_pages) as n from daily group by lang order by lang").collect()
    import spark.implicits._
    val batch = spark
      .createDataset((0L until cfg.pages.toLong).map(p => PagesGen.pageOf(cfg, p, 1)) ++
        (0L until cfg.pages.toLong).filter(PagesGen.isRepublished).map(p => PagesGen.pageOf(cfg, p, 2)))
      .groupBy("lang")
      .count()
      .orderBy("lang")
      .collect()
    assert(streamed.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      batch.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("foreachBatch crawl: rounds advance as pages arrive, state resumes across batches") {
    val pagesDir = Files.createTempDirectory("stream-crawl-pages").toString
    val accumDir = Files.createTempDirectory("stream-crawl-accum").toString
    val stateDir = Files.createTempDirectory("stream-crawl-state").toString
    val ckptDir = Files.createTempDirectory("stream-crawl-ckpt").toString
    import spark.implicits._
    val params = CrawlParams(walksPerNode = 10, batch = 20, hostBudget = 5)
    val seeds = PagesGen.seedUrls(cfg, 3)

    // chunk 1 arrives
    val v1 = (0L until cfg.pages.toLong).map(pid => PagesGen.pageOf(cfg, pid, 1))
    spark.createDataset(v1).toDF.coalesce(1).write.mode("append").parquet(pagesDir)

    val q = StreamIngest.crawlPerBatch(
      spark,
      StreamIngest.pagesStream(spark, pagesDir, maxFilesPerTrigger = 10),
      accumDir,
      stateDir,
      seeds,
      params,
      roundsPerBatch = 2,
      checkpointDir = ckptDir
    )
    q.processAllAvailable()
    val io = new ParquetTableIO(spark, stateDir)
    val afterChunk1 = io.lastCompleteRound()
    assert(afterChunk1 >= 2, s"expected ≥2 rounds after first batch, got $afterChunk1")
    val seen1 = io.read(afterChunk1, "fetched").count()
    // incremental extraction: the first epoch extracted exactly the arriving pages
    val exDir = StreamIngest.extractedDir(accumDir)
    assert(spark.read.parquet(s"$exDir/batch=0").count() === cfg.pages.toLong)

    // chunk 2 arrives (re-published versions) → more rounds on the union
    val v2 = (0L until cfg.pages.toLong).filter(PagesGen.isRepublished).map(pid => PagesGen.pageOf(cfg, pid, 2))
    spark.createDataset(v2).toDF.coalesce(1).write.mode("append").parquet(pagesDir)
    q.processAllAvailable()
    q.stop()

    val afterChunk2 = io.lastCompleteRound()
    assert(afterChunk2 > afterChunk1, "crawl did not advance on the second micro-batch")
    val seen2 = io.read(afterChunk2, "fetched").count()
    assert(seen2 > seen1, "seen set did not grow")
    // second epoch extracted ONLY the newly arrived re-published versions,
    // with version numbers continuing above the first epoch's (ver = 2)
    val nRepub = (0L until cfg.pages.toLong).count(PagesGen.isRepublished).toLong
    val b1 = spark.read.parquet(s"${StreamIngest.extractedDir(accumDir)}/batch=1")
    assert(b1.count() === nRepub)
    assert(b1.filter(org.apache.spark.sql.functions.col("ver") === 2).count() === nRepub)
    // crawl invariants hold on streamed state
    val walks = io.read(afterChunk2, "walks").collect()
    walks.foreach { r =>
      val path = r.getSeq[Long](2)
      assert(path.nonEmpty && path.distinct.size === path.size)
    }
  }
}
