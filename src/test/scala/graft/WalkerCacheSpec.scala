package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CrawlParams, Rng}
import graft.fixtures.PagesGen
import graft.round.{CrawlEngine, ParquetTableIO, RoundDriver}
import graft.walks.IterativeWalker

/** Pins deterministic cache release (round-5 profiling finding): every
  * iterative drain takes one `localCheckpoint(true)` per hop, and
  * `Dataset.unpersist` cannot release those — before `core.CacheOps` the
  * orphaned slices lingered until the JVM's ContextCleaner, piling storage
  * pressure across a 48-query bench JVM or a many-round crawl (the round-4
  * bench's sporadic >60 s walker reps). After a drain, exactly ONE cache
  * (the output) may remain; after a crawl run, only the live state-table
  * checkpoints.
  */
class WalkerCacheSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, appName = "walker-cache-spec")

  private def clearAll(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  private def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("iterative walkers release every intermediate cache") {
    import spark.implicits._
    clearAll()
    val p = CrawlParams(alpha = 0.85, walksPerNode = 50)
    val n = 40L
    val edges = (0L until n).flatMap { src =>
      val d = Rng.uniformIndex(7L, src, 0, 0, 5)
      (0 until d).map(j => (src, Math.floorMod(Rng.hash(7L, src, 1, j), n))).filter(e => e._2 != e._1)
    }.distinct
    val adjDS = IterativeWalker.adjacencyTable(spark, spark.createDataset(edges))
    val starts = spark.createDataset((0L until n).toSeq)

    val (w1, rel1) = IterativeWalker.generateReleasable(spark, starts, adjDS, 3L, 15, p)
    assert(w1.count() > 0)
    assert(cachedCount == 1, s"generate must leave only its output cache: ${spark.sparkContext.getPersistentRDDs}")
    rel1()
    assert(cachedCount == 0, "the output handle must release the last cache")

    val (w2, rel2) = IterativeWalker.generateExplodedReleasable(spark, starts, adjDS, 3L, 15, p)
    assert(w2.count() > 0)
    assert(cachedCount == 1, s"generateExploded must leave only its output cache: ${spark.sparkContext.getPersistentRDDs}")
    rel2()
    assert(cachedCount == 0)
  }

  test("a forced-iterative crawl run leaves only the live state caches") {
    import spark.implicits._
    clearAll()
    val cfg = PagesGen.Tiny
    val params = CrawlParams(
      seed = 42L,
      alpha = 0.85,
      walksPerNode = 10,
      batch = 20,
      hostBudget = 5,
      promotion = 0.1,
      demotion = 0.05,
      activation = 0.01,
      promotionWait = 0L
    )
    val v1 = (0L until cfg.pages.toLong).map(pid => PagesGen.pageOf(cfg, pid, 1))
    val v2 = (0L until cfg.pages.toLong).filter(PagesGen.isRepublished).map(pid => PagesGen.pageOf(cfg, pid, 2))
    val pagesDF = spark.createDataset(v1 ++ v2).toDF
    val dir = Files.createTempDirectory("walker-cache-crawl").toString
    val io = new ParquetTableIO(spark, dir)
    val extracted = CrawlEngine.extractPages(spark, pagesDF).persist()
    // force the iterative walker AND iterative repair on every round — the
    // drains whose per-hop checkpoints used to leak
    val driver = new RoundDriver(spark, io, params, broadcastMaxEdges = 0L, iterativeRepairMinEntries = 0L)
    driver.init(PagesGen.seedUrls(cfg, 3))
    driver.run(extracted, 4)
    extracted.unpersist()
    val left = spark.sparkContext.getPersistentRDDs
    // live state = 7 table checkpoints (nodes, edges, walks, fetched,
    // enqueued, leaks, visits); allow slack of 2 for in-flight cleaner work
    assert(left.size <= 9, s"crawl leaked ${left.size} caches: ${left.values.map(_.toString).take(12).mkString("; ")}")
    clearAll()
  }
}
