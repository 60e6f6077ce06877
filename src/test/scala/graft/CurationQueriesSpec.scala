package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CurationQueries, TextQueries}

/** Pins the curation back-end operators (q54-q57) on planted fixtures:
  *
  *  - q54: a passage shared verbatim by two docs IS counted as duplicated
  *    in both, a unique doc counts zero (the planted-contamination
  *    discipline of q47, applied corpus-internally),
  *  - q55: the keeper of a near-dup cluster is the highest-QUALITY member,
  *    beating the min-id default precisely where the two disagree,
  *  - q56: an under-share source keeps everything, an over-share source is
  *    rate-limited to exactly the formula, and the mix is deterministic,
  *  - q57: the two-phase distributed prefix sum is row-identical to the
  *    single-partition window spelling under FORCED multi-partitioning,
  *    and shard boundaries land exactly where the start-offset convention
  *    says.
  */
class CurationQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "curation-queries-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Unique filler: no 8-gram (or 3-shingle) shared across docs. */
  private def filler(i: Long, words: Int = 20): String =
    (0 until words).map(j => s"u${i}w$j").mkString(" ")

  // ---------------------------------------------------------------- q54

  test("q54: a planted shared passage is duplicated in both docs, unique docs count zero") {
    val passage = (0 until 8).map(j => s"p$j").mkString(" ") // exactly one shared 8-gram
    val docs = docsDF(
      Seq(
        1L -> s"${filler(1)} $passage",
        2L -> s"$passage ${filler(2)}",
        3L -> filler(3)
      )
    )
    // inline the q54 pipeline over the fixture (the query reads parquet)
    val w = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= CurationQueries.DupPassageN)
    val grams = w.select(
      col("doc_id"),
      explode(array_distinct(TextQueries.wordGrams(CurationQueries.DupPassageN))).as("gram")
    )
    val dupG = grams.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    val dupPerDoc = grams
      .join(dupG.select("gram"), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // docs 1 and 2 share exactly the one planted 8-gram: filler words are
    // doc-unique so every gram touching them is unique too
    assert(dupPerDoc === Map(1L -> 1L, 2L -> 1L))
    val n = dupG.count()
    assert(n === 1L, s"exactly the planted gram should be duplicated, got $n")
  }

  test("q54: mostly_dup fires on a doc that is one long shared passage") {
    val shared = (0 until 30).map(j => s"s$j").mkString(" ")
    val docs = docsDF(
      Seq(
        1L -> s"$shared ${filler(1, 4)}", // 30 shared words + 4 unique
        2L -> shared,
        3L -> filler(3, 30)
      )
    )
    val w = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= CurationQueries.DupPassageN)
    val grams = w.select(
      col("doc_id"),
      explode(array_distinct(TextQueries.wordGrams(CurationQueries.DupPassageN))).as("gram")
    )
    val dupG = grams.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") >= 2).select("gram")
    val frac = grams
      .join(dupG, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup"))
      .join(grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams")), Seq("doc_id"))
      .select(col("doc_id"), (col("n_dup").cast("double") / col("n_grams")).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    // doc 2 is wholly contained in doc 1: every one of its grams is shared
    assert(frac(2L) === 1.0)
    // doc 1: 27 grams inside the 34-word text come from the shared span
    assert(frac(1L) > 0.5 && frac(1L) < 1.0)
    assert(!frac.contains(3L))
  }

  // ---------------------------------------------------------------- q55

  test("q55: the higher-quality member beats the min-id default as keeper") {
    // doc 2 is the clean original (20 distinct words, diversity 1.0);
    // doc 1 is the same text with a repeated trailing word (diversity
    // 20/22) — near-dup by construction, LOWER id, LOWER quality.
    val base = (0 until 20).map(j => s"b$j").mkString(" ")
    val docs = docsDF(
      Seq(
        1L -> s"$base b0 b0",
        2L -> base,
        10L -> filler(10, 25)
      )
    )
    val dup = TextQueries
      .verifiedPairs(docs)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect()
    assert(dup.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)), s"fixture must collide in LSH: ${dup.mkString(",")}")
    val q = docs.select(col("doc_id").as("node"), CurationQueries.qualityScore.as("quality"))
    val edgesBoth = {
      val sp = spark; import sp.implicits._
      val e = Seq((1L, 2L)).toDF("doc_a", "doc_b")
      e.select(col("doc_a").as("node"), col("doc_b").as("nbr"))
        .union(e.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
    }
    val (lab, _, release) = TextQueries.connectedComponents(spark, edgesBoth)
    val wk = Window.partitionBy(col("cluster")).orderBy(col("quality").desc, col("node").asc)
    val out = lab
      .select(col("label").as("cluster"), col("node"))
      .join(q, Seq("node"))
      .withColumn("rn", row_number().over(wk))
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("node"))).as("keeper")
      )
      .collect()
    release()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L, "cluster label is the min member")
    assert(r.getLong(1) === 2L, "cluster has two members")
    assert(r.getLong(2) === 2L, "keeper is the higher-quality doc 2, NOT min-id doc 1")
  }

  // ---------------------------------------------------------------- q56

  test("q56: under-share sources keep everything; over-share sources get the formula rate") {
    val sp = spark; import sp.implicits._
    // source A: 10 docs × 1000 chars; source B: 2 docs × 50 chars.
    // total = 10100; budget = floor(0.4 × 10100 / 2) = 2020 per source.
    // A: rate = floor(2020 × 10000 / 10000) = 2020 bp. B: capped at 10000.
    val docs = (0 until 10)
      .map(i => (i.toLong, "a" + ("x" * 999), "srcA", 1000L)) ++
      Seq((100L, "b1", "srcB", 50L), (101L, "b2", "srcB", 50L))
    val df = docs.toDF("doc_id", "text", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("q56fix").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CurationQueries
      .q56SourceMixing(spark, tmp)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("srcA")._1 === 2020L, "over-share source rate is the exact formula value")
    assert(out("srcB")._1 === 10000L, "under-share source keeps rate 10000")
    assert(out("srcB")._2 === 2L && out("srcB")._3 === 100L, "under-share source keeps ALL docs")
    // determinism: same input ⇒ identical mix
    val again = CurationQueries
      .q56SourceMixing(spark, tmp)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(again === out)
  }

  // ---------------------------------------------------------------- q57

  test("q57: two-phase prefix sum is row-identical to the window spelling under forced partitioning") {
    val sp = spark; import sp.implicits._
    implicit val s: SparkSession = spark
    val rng = new scala.util.Random(42)
    val docs = (0 until 1000)
      .map(i => (i.toLong, 10L + rng.nextInt(500)))
      .toDF("doc_id", "n_chars")
      .repartition(5) // scrambled input partitioning
    val twoPhase = CurationQueries
      .withStartOffset(docs, "doc_id", "n_chars", numPartitions = 7)
      .select("doc_id", "n_chars", "start_off")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val naive = docs
      .withColumn(
        "start_off",
        coalesce(
          sum("n_chars").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("doc_id", "n_chars", "start_off")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(twoPhase.toSeq === naive.toSeq)
  }

  test("q57: shard boundaries follow the start-offset convention exactly") {
    val sp = spark; import sp.implicits._
    implicit val s: SparkSession = spark
    // target 60: offsets 0,30,60,150 → shards 0,0,1,2 (doc 3 OVERHANGS:
    // starts in shard 1 at offset 60+90 > 120 — no, starts at 60,
    // spans to 150; doc 4 starts at 150 → shard 2). The overhang doc
    // belongs wholly to the shard of its first byte.
    val docs = Seq((1L, 30L), (2L, 30L), (3L, 90L), (4L, 10L)).toDF("doc_id", "n_chars")
    val shards = CurationQueries
      .shardAssign(docs, targetChars = 60L, numPartitions = 3)
      .select("doc_id", "shard")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(shards === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  // ---------------------------------------------------------------- q70

  test("q70: a window-spanning doc is split across windows, boundary accounting exact") {
    val sp = spark; import sp.implicits._
    implicit val s: SparkSession = spark
    // C = 10. Concatenated stream: doc1 [0,4), doc2 [4,12) — SPANS the
    // seq0/seq1 boundary — doc3 [12,22), doc4 [22,47) — spans THREE
    // windows. Totals: 47 tokens → windows 0..4, last one ragged (7).
    val docs = Seq((1L, 4L), (2L, 8L), (3L, 10L), (4L, 25L)).toDF("doc_id", "n_tokens")
    val out = CurationQueries
      .sequencePack(docs, contextLen = 10L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(
      out === Map(
        0L -> ((2L, 2L, 10L, 1L, 2L)), // doc1 whole + doc2's first 6
        1L -> ((2L, 1L, 10L, 2L, 3L)), // doc2's tail 2 + doc3's first 8
        2L -> ((2L, 1L, 10L, 3L, 4L)), // doc3's tail 2 + doc4's first 8
        3L -> ((1L, 0L, 10L, 4L, 4L)), // doc4 alone, mid-doc: zero starts
        4L -> ((1L, 0L, 7L, 4L, 4L)) // ragged final window
      ),
      s"got $out"
    )
  }

  test("q70: packing invariants hold under forced partitioning on a random corpus") {
    val sp = spark; import sp.implicits._
    implicit val s: SparkSession = spark
    val rng = new scala.util.Random(7)
    val c = 64L
    val docs = (0 until 500)
      .map(i => (i.toLong, 1L + rng.nextInt(200)))
      .toDF("doc_id", "n_tokens")
      .repartition(5)
    val total = docs.agg(sum("n_tokens")).first().getLong(0)
    val rows = CurationQueries
      .sequencePack(docs, contextLen = c)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // windows are contiguous 0..last; every window except the last carries
    // exactly C tokens; token mass and doc starts are conserved
    assert(rows.map(_._1).toSeq === (0L until rows.length.toLong).toSeq)
    assert(rows.dropRight(1).forall(_._4 == c), "non-final window not full")
    assert(rows.map(_._4).sum === total)
    assert(rows.map(_._3).sum === 500L)
    assert(rows.last._4 === total - c * (rows.length - 1))
  }

  // ---------------------------------------------------------------- q77

  test("q77: maximal duplicate spans — cross-doc, within-doc, touching-window merge, gap split") {
    def toks(p: String, n: Int) = (1 to n).map(j => s"$p$j").mkString(" ")
    val pa = toks("pa", 10) // 10-token passage shared by docs 1 and 2
    val pb = toks("pb", 8)  // 8-gram repeated WITHIN doc 3
    val pe = toks("pe", 16) // docs 5/6 are full duplicates
    val pf = toks("pf", 8)  // doc 7 = pf ++ pg; pf also in doc 8, pg also in doc 9
    val pg = toks("pg", 8)
    val docs = docsDF(
      Seq(
        1L -> s"$pa q1 q2 q3",
        2L -> s"z1 z2 $pa z3",
        3L -> s"$pb ${toks("pc", 9)} $pb",
        4L -> toks("pd", 10), // unique control — must be absent
        5L -> pe,
        6L -> pe,
        7L -> s"$pf $pg",
        8L -> s"$pf ${toks("ph", 8)}",
        9L -> s"${toks("pi", 8)} $pg"
      )
    )
    val got = CurationQueries
      .dupSpans(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    val want = Seq(
      (1L, 1L, 1L, 11L, 10L, 3L),  // 3 overlapping dup windows merge to the 10-token passage
      (2L, 1L, 3L, 13L, 10L, 3L),  // same passage at offset 2
      (3L, 1L, 1L, 9L, 8L, 1L),    // within-doc repeat: two spans, gap 17 > 8 splits them
      (3L, 2L, 18L, 26L, 8L, 1L),
      (5L, 1L, 1L, 17L, 16L, 9L),  // full-dup doc: every window dup, one span covers the doc
      (6L, 1L, 1L, 17L, 16L, 9L),
      (7L, 1L, 1L, 17L, 16L, 2L),  // starts 1 and 9: gap == 8 TOUCHES, so the spans merge
      (8L, 1L, 1L, 9L, 8L, 1L),
      (9L, 1L, 9L, 17L, 8L, 1L)
    )
    assert(got === want, s"got ${got.mkString(",")}")
    assert(!got.exists(_._1 == 4L), "the all-unique doc must produce no spans")
  }
}
