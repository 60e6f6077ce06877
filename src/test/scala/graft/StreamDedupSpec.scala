package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries
import graft.streaming.StreamDedup

/** Pins the incremental (on-ingest) LSH dedup:
  *
  *  - a real multi-micro-batch stream emits, across all batches, EXACTLY
  *    the batch q33 pipeline's verified pair set (pairs planted to cross
  *    micro-batch boundaries in both directions),
  *  - the q49 batch-mode replay equals the batch pipeline on the same
  *    corpus (the driver-gate equality, locally),
  *  - the append-time probe cap: a boilerplate mega-bucket costs each
  *    arriving doc O(probeCap) candidates and stops growing the store,
  *    while a genuine near-dup pair in the same batch still surfaces,
  *  - dedupBatch is deterministic (same inputs → same emissions).
  */
class StreamDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "stream-dedup-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private def filler(i: Long): String = (0 until 40).map(j => s"u${i}w$j").mkString(" ")

  /** Near-dup families planted so that pairs cross micro-batch boundaries:
    * ids 1/10/11 are exact copies and 2 a near-dup (family A), 3/7 a
    * near-dup pair (family B); the chunking below puts 1,3 in batch 1 —
    * 2,10 in batch 2 — 7,11 in batch 3.
    */
  private def fixtureRows: Seq[(Long, String)] = {
    val baseA = (0 until 60).map(j => s"nd$j").mkString(" ")
    val nearA = ((0 until 59).map(j => s"nd$j") :+ "ndX").mkString(" ")
    val baseB = (0 until 50).map(j => s"pq$j").mkString(" ")
    val nearB = ((0 until 49).map(j => s"pq$j") :+ "pqX").mkString(" ")
    Seq((1L, baseA), (2L, nearA), (10L, baseA), (11L, baseA), (3L, baseB), (7L, nearB)) ++
      (20L until 60L).map(i => (i, filler(i)))
  }

  private def chunkOf(id: Long): Int = id match {
    case 1 | 3  => 0
    case 2 | 10 => 1
    case 7 | 11 => 2
    case i      => (i % 3).toInt
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double, Boolean)] =
    df.select("doc_a", "doc_b", "jaccard_r", "is_dup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet

  test("stream of 3 micro-batches emits exactly the batch pipeline's pairs") {
    val rows = fixtureRows
    val docsDir = Files.createTempDirectory("sdedup-docs").toString
    (0 until 3).foreach { k =>
      docsDF(rows.filter(r => chunkOf(r._1) == k)).coalesce(1).write.mode("append").parquet(docsDir)
    }
    val stateRoot = Files.createTempDirectory("sdedup-state").toString
    val ckpt = Files.createTempDirectory("sdedup-ckpt").toString
    val q = StreamDedup.run(
      spark,
      StreamDedup.docsStream(spark, docsDir, maxFilesPerTrigger = 1),
      stateRoot,
      ckpt
    )
    q.processAllAvailable()
    q.stop()

    // batch truth over the full corpus (write it as a documents table so
    // the comparison runs the PUBLIC q33 entry point)
    val corpusDir = Files.createTempDirectory("sdedup-corpus").toString
    docsDF(rows).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val expected = pairSet(TextQueries.q33LshDedupPairs(spark, corpusDir))

    val got = pairSet(StreamDedup.emittedPairs(spark, stateRoot).get)
    assert(got === expected)
    // the planted cross-batch pairs are all present
    assert(Set((1L, 2L), (1L, 10L), (1L, 11L), (10L, 11L), (2L, 10L), (2L, 11L), (3L, 7L))
      .subsetOf(got.map(p => (p._1, p._2))))
  }

  test("q49 batch-mode replay equals the batch pipeline on the same corpus") {
    val corpusDir = Files.createTempDirectory("sdedup-q49").toString
    docsDF(fixtureRows).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val expected = pairSet(TextQueries.q33LshDedupPairs(spark, corpusDir))
    val got = pairSet(TextQueries.q49StreamDedup(spark, corpusDir))
    assert(got === expected)
  }

  test("mega-bucket: append-time cap bounds probe fan-out; genuine pair still surfaces") {
    val template = (0 until 60).map(j => s"tpl$j").mkString(" ")
    val cap = 8
    val batchA = docsDF((0L until 20L).map(i => (i, template)))
    val nearX = (0 until 60).map(j => s"gx$j").mkString(" ")
    val nearY = ((0 until 59).map(j => s"gx$j") :+ "gxZ").mkString(" ")
    val batchB = docsDF((20L until 30L).map(i => (i, template)) ++ Seq((100L, nearX), (101L, nearY)))

    val (pairsA, postA, _) = StreamDedup.dedupBatch(spark, batchA, None, None, probeCap = cap)
    // intra bucket of 20 > cap: dropped, like the batch pipeline
    assert(pairsA.count() === 0L)
    // the store accepted only cap postings per band bucket (lowest ids win)
    val postAKept = postA.collect()
    assert(postAKept.length === 2 * cap) // 2 bands
    assert(postAKept.map(_.getLong(0)).toSet === (0L until cap.toLong).toSet)

    val (pairsB, postB, _) =
      StreamDedup.dedupBatch(spark, batchB, Some(postA), Some(batchA), probeCap = cap)
    val got = pairSet(pairsB)
    // each of the 10 arriving template docs probed exactly cap prior docs
    val templatePairs = got.filter(_._1 < 20L)
    assert(templatePairs.size === 10 * cap)
    assert(templatePairs.forall(p => p._1 < cap.toLong && p._2 >= 20L && p._3 === 1.0))
    // the genuine near-dup pair in the same batch surfaces despite the hub
    assert(got.exists(p => p._1 === 100L && p._2 === 101L && p._4))
    // a full bucket accepts nothing more
    assert(postB.filter(col("doc_id") < 100L).count() === 0L)
  }

  test("dedupBatch is deterministic") {
    val batch1 = docsDF(fixtureRows.filter(r => chunkOf(r._1) == 0))
    val batch2 = docsDF(fixtureRows.filter(r => chunkOf(r._1) == 1))
    def emit(): Set[(Long, Long, Double, Boolean)] = {
      val (_, p1, _) = StreamDedup.dedupBatch(spark, batch1, None, None)
      val (pairs, _, _) = StreamDedup.dedupBatch(spark, batch2, Some(p1), Some(batch1))
      pairSet(pairs)
    }
    assert(emit() === emit())
  }

  test("a small batch probes a bounded fraction of a large compacted postings store (r5 verdict #2)") {
    // 4000 stored docs' postings (8000 rows) across 4 epochs, compacted
    // into the bucketed-by-`b` layout; then a 3-doc batch probes. The
    // batch's ≤ 6 band keys push into the scan as InSet(b), so with 64
    // buckets the probe may touch at most ~6/64 of the store per
    // evaluation — asserted via task-metrics records-read (the
    // TrigramIndexSpec / BucketedIOSpec evidence shape).
    val storedDocs = docsDF((0L until 4000L).map(i => (i, filler(i + 50000))))
    val root = Files.createTempDirectory("sdedup-postings").toString + "/postings"
    val store = new graft.streaming.BucketedPostingsStore(spark, root, buckets = 64)
    (0 until 4).foreach { k =>
      store.writeIncrement(
        k.toLong,
        TextQueries.bandBuckets(storedDocs.filter(pmod(col("doc_id"), lit(4)) === k))
      )
    }
    store.maybeCompact(3L, minBatches = 1)
    assert(store.lastCompaction() === 3L, "all four epochs must fold into one bucketed compaction")
    assert(store.batchIds().isEmpty, "increments must be cleaned up after the marker")
    val prior = store.readAll().map(_.drop("batch"))
    val storeRows = prior.get.count()
    assert(storeRows === 8000L, s"2 band postings per stored doc: $storeRows")

    // the batch: one near-dup of stored doc 123 (its text + one appended
    // token: 38 of 39 trigrams shared, jaccard ≈ 0.97 — the deterministic
    // md5 minhashes collide in a band) + two fillers
    val nearOfStored = filler(123L + 50000L) + " extraTok"
    val batch = docsDF(Seq((9001L, nearOfStored), (9002L, filler(1)), (9003L, filler(2))))

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
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      settle(); recordsRead = 0L
      val (pairs, np, rel) =
        StreamDedup.dedupBatch(spark, batch, prior, Some(storedDocs.unionByName(batch)))
      val emitted = pairSet(pairs)
      np.count()
      rel()
      settle()
      val got = recordsRead
      // near-dup against the STORED corpus surfaces through the pruned probe
      assert(
        emitted.exists(p => p._1 === 123L && p._2 === 9001L && p._4),
        s"the planted cross-store near-dup must be found: $emitted"
      )
      // unpruned, the two store evaluations (cross-probe + cap fill) would
      // read ≥ 2 × 8000 postings rows; the bucket-pruned probe stays far
      // under one full scan even with skew headroom
      assert(got < storeRows / 2, s"probe read $got input records — expected ≪ $storeRows (bucket pruning)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
