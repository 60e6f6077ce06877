package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Pins the scale guards of the LSH dedup pipeline:
  *
  *  - the band-bucket cap (a boilerplate mega-bucket must NOT go quadratic
  *    in the candidate self-join — VERDICT r2 "what's wrong #1"),
  *  - pointer-jumping connected components (O(log diameter) iterations on
  *    long chains, bounded lineage),
  *  - the empty-input path of q34 (no pair above the dup threshold ⇒ empty
  *    result, not an NPE — ADVICE r2).
  */
class TextDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "text-dedup-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** docs fixture: (doc_id, text). */
  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  /** A 40-word unique filler text for doc i (no shingle shared with any
    * other doc).
    */
  private def filler(i: Long): String =
    (0 until 40).map(j => s"u${i}w$j").mkString(" ")

  private val template: String = (0 until 60).map(j => s"tpl$j").mkString(" ")

  test("mega-bucket cap: a 30% boilerplate bucket cannot go quadratic") {
    // 300 identical template docs (one band bucket holding ~43% of docs) +
    // one genuine near-dup pair + 398 unique docs.
    val nearA = (0 until 60).map(j => s"nd$j").mkString(" ")
    val nearB = ((0 until 59).map(j => s"nd$j") :+ "ndX").mkString(" ")
    val rows =
      (0L until 300L).map(i => (i, template)) ++
        Seq((300L, nearA), (301L, nearB)) ++
        (302L until 700L).map(i => (i, filler(i)))
    val docs = docsDF(rows)
    val cap = 50

    // the mega bucket is visible to monitoring
    val oversize = TextQueries.oversizeBandBuckets(docs, cap).collect()
    assert(oversize.nonEmpty, "expected the template bucket to be reported oversize")
    assert(oversize.forall(_.getLong(2) == 300L), s"oversize=${oversize.mkString(",")}")

    // capped: no pair among the 300 template docs; the real near-dup pair
    // survives; total candidate work is O(cap^2 * buckets), nowhere near
    // the 44850 pairs the mega bucket alone would emit
    val capped = TextQueries.candidatePairs(docs, cap).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.contains((300L, 301L)), "near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 300L && b < 300L }, "no pairs from the dropped mega bucket")
    assert(capped.length <= cap * cap * 4, s"candidate count ${capped.length} not bounded by cap")

    // uncapped the same input goes quadratic — the cap is load-bearing
    val uncapped = TextQueries.candidatePairs(docs, Int.MaxValue).count()
    assert(uncapped >= 300L * 299L / 2, s"uncapped=$uncapped should include the mega bucket's pairs")
  }

  test("q41 block cap: a dense sign-block cannot go quadratic") {
    val sp = spark; import sp.implicits._
    // 8-dim embeddings; the 4-bit sign code comes from dims 1-4, dims 5-8
    // get seed-dependent signs so the 8-bit code genuinely refines blocks
    def vec(signs: Seq[Int], seed: Int): Array[Float] =
      (signs ++ (signs.length until 8).map(j => if (((seed >> (j - 4)) & 1) == 1) 1 else -1)).zipWithIndex.map {
        case (s, j) => s * (0.1f + ((seed * 31 + j * 7) % 11) * 0.013f)
      }.toArray
    // 200 vectors all landing in block "1111" (near-zero/template embeddings
    // do exactly this in a real corpus) + one genuine near-dup pair in block
    // "1010" + 40 scatter vectors in block "0000"
    val rows: Seq[(Long, Array[Float])] =
      (0L until 200L).map(i => (i, vec(Seq(1, 1, 1, 1), i.toInt))) ++
        Seq((300L, vec(Seq(1, -1, 1, -1), 5)), (301L, vec(Seq(1, -1, 1, -1), 5).map(x => x * 1.001f))) ++
        (400L until 440L).map(i => (i, vec(Seq(-1, -1, -1, -1), i.toInt)))
    val docs = rows.toDF("vec_id", "embedding")
    val cap = 50

    val capped = TextQueries.embeddingCandidatePairs(docs, 4, cap).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.contains((300L, 301L)), "near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 200L && b < 200L }, "no pairs from the dropped mega block")
    assert(capped.length <= cap * cap * 16, s"candidate count ${capped.length} not bounded by cap")

    // uncapped the same input goes quadratic — the cap is load-bearing
    val uncapped = TextQueries.embeddingCandidatePairs(docs, 4, Int.MaxValue).count()
    assert(uncapped >= 200L * 199L / 2, s"uncapped=$uncapped should include the mega block's pairs")

    // the 8-bit code splits the mega block across 16 sub-blocks (the
    // recall/parallelism knob the scale path widens to) — candidate work
    // drops sharply while the near-dup pair (identical sign pattern)
    // stays blocked together
    val wide = TextQueries.embeddingCandidatePairs(docs, 8, Int.MaxValue).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.length < uncapped / 4, s"8-bit blocking should cut candidates: ${wide.length} vs $uncapped")
    assert(wide.contains((300L, 301L)), "near-dup pair must survive the wider code")
  }

  test("q46 batch-ANN cap: a dense sign-block bounds candidates PER QUERY, every query still answered") {
    val sp = spark; import sp.implicits._
    def vec(signs: Seq[Int], seed: Int): Array[Float] =
      (signs ++ (signs.length until 8).map(j => if (((seed >> (j - 4)) & 1) == 1) 1 else -1)).zipWithIndex.map {
        case (s, j) => s * (0.1f + ((seed * 31 + j * 7) % 11) * 0.013f)
      }.toArray
    // same shape as the q41 fixture: a 200-member mega-block + a genuine
    // near-dup pair in its own block + scatter
    val rows: Seq[(Long, Array[Float])] =
      (0L until 200L).map(i => (i, vec(Seq(1, 1, 1, 1), i.toInt))) ++
        Seq((300L, vec(Seq(1, -1, 1, -1), 5)), (301L, vec(Seq(1, -1, 1, -1), 5).map(x => x * 1.001f))) ++
        (400L until 440L).map(i => (i, vec(Seq(-1, -1, -1, -1), i.toInt)))
    val docs = rows.toDF("vec_id", "embedding")
    val cap = 50

    // queries: one INSIDE the mega-block (7), one in the near-dup block (300)
    val cand = TextQueries
      .batchAnnCandidates(docs, 4, cap, Seq(7L, 300L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perQuery = cand.groupBy(_._1).view.mapValues(_.length).toMap
    // unlike the dedup caps, the mega-block query is NOT dropped — it gets
    // candidates, just a bounded list (the first `cap` members by vec_id)
    assert(perQuery.getOrElse(7L, 0) > 0, "mega-block query must still get candidates")
    assert(perQuery.values.forall(_ <= cap), s"per-query candidates must be <= cap: $perQuery")
    assert(cand.contains((300L, 301L)), "genuine neighbor must survive the cap")

    // uncapped, the mega-block query pays O(block) candidates — the cap is
    // load-bearing
    val uncapped = TextQueries
      .batchAnnCandidates(docs, 4, Int.MaxValue, Seq(7L))
      .count()
    assert(uncapped >= 199L, s"uncapped=$uncapped should be O(block)")
  }

  test("q47 decontamination: a planted contaminated doc surfaces at overlap 1.0; boilerplate shingles are DF-capped") {
    val contaminated = (0 until 40).map(j => s"c$j").mkString(" ")
    val boiler = "b0 b1 b2 b3 b4"
    val rows =
      // bench set (doc_id < 8): unique fillers, except doc 5 (the leaked
      // eval doc) and doc 3 (ends with the boilerplate every corpus doc has)
      (0L until 8L).map {
        case 5L => (5L, contaminated)
        case 3L => (3L, filler(3) + " " + boiler)
        case i  => (i, filler(i))
      } ++
        // corpus: doc 100 is an exact copy of bench doc 5; 101-160 unique
        // but all carrying the boilerplate suffix
        Seq((100L, contaminated)) ++
        (101L until 161L).map(i => (i, filler(i) + " " + boiler))
    val docs = docsDF(rows)

    val capped = TextQueries.decontaminationScan(docs, benchMaxId = 8L, dfCap = 10, topK = 5).collect()
    val byBench = capped.groupBy(_.getLong(0))
    // the planted copy is rank 1 for bench doc 5 at ratio 1.0
    val top5 = byBench(5L).minBy(_.getLong(1))
    assert(top5.getLong(2) == 100L && top5.getDouble(4) == 1.0, s"planted doc must surface: ${top5}")
    // the boilerplate shingles sit in 60 corpus docs > dfCap ⇒ dropped:
    // bench doc 3 must NOT report 60 boilerplate matches
    assert(!byBench.contains(3L), s"DF cap must drop boilerplate-only matches, got ${byBench.get(3L).map(_.mkString(";"))}")

    // uncapped, the boilerplate dominates — the cap is load-bearing
    val uncapped = TextQueries.decontaminationScan(docs, benchMaxId = 8L, dfCap = Int.MaxValue, topK = 5).collect()
    assert(uncapped.exists(r => r.getLong(0) == 3L), "without the cap bench doc 3 matches the boilerplate docs")
  }

  test("connected components: label sum cannot overflow with ids near Long.MAX (ANSI-mode landmine)") {
    val sp = spark; import sp.implicits._
    // 6 nodes at ~Long.MAX/1: the Long sum is ~5.5e19 > Long.MAX — the old
    // sum(label) convergence detector threw ArithmeticException under
    // Spark 4's default ANSI mode (VERDICT r4 "what's wrong #3")
    val ids = (0L until 6L).map(i => Long.MaxValue - 1000L + i)
    val edges = ids.sliding(2).toSeq.flatMap { case Seq(a, b) => Seq((a, b), (b, a)) }
    val (labels, _, release) = TextQueries.connectedComponents(spark, edges.toDF("node", "nbr"))
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    release()
    assert(got.size == 6)
    assert(got.values.forall(_ == ids.min), s"all labels must be the chain min, got $got")
  }

  test("connected components: pointer jumping resolves a 64-chain in O(log n) iterations") {
    val sp = spark; import sp.implicits._
    val n = 64L
    val edges = (0L until n - 1).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edgesBoth = edges.toDF("node", "nbr")
    val (labels, iters, release) = TextQueries.connectedComponents(spark, edgesBoth)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    release()
    assert(got.size == n.toInt)
    assert(got.values.forall(_ == 0L), s"all labels must be the chain min, got ${got.toSeq.sortBy(_._1).take(8)}")
    // plain min-propagation needs ~63 iterations on this chain; path
    // halving needs ~log2(63)+1. Allow slack for the convergence-detect
    // iteration.
    assert(iters <= 12, s"pointer jumping should converge in O(log n): took $iters")
  }

  test("connected components: two components keep distinct min labels") {
    val sp = spark; import sp.implicits._
    val edges = Seq((5L, 7L), (7L, 5L), (7L, 9L), (9L, 7L), (20L, 21L), (21L, 20L))
    val (labels, _, release) = TextQueries.connectedComponents(spark, edges.toDF("node", "nbr"))
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    release()
    assert(got == Map(5L -> 5L, 7L -> 5L, 9L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: empty edge table converges without NPE") {
    val sp = spark; import sp.implicits._
    val (labels, iters, release) = TextQueries.connectedComponents(spark, Seq.empty[(Long, Long)].toDF("node", "nbr"))
    assert(labels.count() == 0L)
    assert(iters == 1)
    release()
  }

  test("q34 on a corpus with no near-dups returns empty (ADVICE r2: no NPE)") {
    val dir = java.nio.file.Files.createTempDirectory("dedupspec").toString
    val docs = docsDF((0L until 20L).map(i => (i, filler(i))))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.q34DedupClusters(spark, dir)
    assert(out.count() == 0L)
  }

  test("no cached RDDs survive the dedup queries (persist sweep)") {
    val dir = java.nio.file.Files.createTempDirectory("dedupsweep").toString
    val nearA = (0 until 60).map(j => s"sw$j").mkString(" ")
    val nearB = ((0 until 59).map(j => s"sw$j") :+ "swX").mkString(" ")
    val rows = Seq((0L, nearA), (1L, nearB)) ++ (2L until 30L).map(i => (i, filler(i + 9000)))
    docsDF(rows)
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // drop anything earlier suites may have left, then run the two heavy
    // dedup queries plus the previously-leaking q17/q23 shapes end-to-end
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    TextQueries.q33LshDedupPairs(spark, dir).collect()
    TextQueries.q34DedupClusters(spark, dir).collect()
    TextQueries.q23Jaccard(spark, dir).collect()
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty, s"cached RDDs leaked: ${leftover.values.map(_.toString).mkString("; ")}")
  }

  test("q80: a cross-split near-dup is reported; an exact dup can never leak (same split by construction)") {
    // the q51 split formula, replayed in plain Scala to PLANT a pair whose
    // two variants land in different splits
    def splitOf(text: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8"))
      val b = java.lang.Integer.parseInt(d.take(2).map("%02x".format(_)).mkString, 16) % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val passage = (0 until 60).map(j => s"leak$j").mkString(" ")
    val v0 = s"$passage extraA"
    val vk = (1 to 200)
      .map(k => s"$passage extraB$k")
      .find(splitOf(_) != splitOf(v0))
      .getOrElse(fail("no variant landed in a different split — formula drift?"))
    val exact = (0 until 60).map(j => s"same$j").mkString(" ")
    val rows = Seq(
      1L -> v0,
      2L -> vk,
      3L -> exact, // identical texts: jaccard 1.0 but identical md5 ⇒ same
      4L -> exact, // split ⇒ NEVER a leak row
      5L -> filler(5),
      6L -> filler(6)
    )
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q80fix").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries
      .q80SplitLeakage(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
      .toSeq
    assert(got.length === 1, s"exactly the planted cross-split near-dup: $got")
    val (a, b, sa, sb, j) = got.head
    assert((a, b) === (1L, 2L))
    assert(sa === splitOf(v0) && sb === splitOf(vk))
    assert(j >= 0.5 && j < 1.0, s"near-dup similarity, not exact: $j")
  }
}
