package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Pins the corpus-curation operators q50-q52 on planted documents. The
  * synthetic corpus is near-uniform word soup — no doc trips the
  * repetition flags or the cascade's drop rules hard enough to exercise
  * every branch — so the flag/rule semantics are proven here with docs
  * crafted to hit each signal, including hand-computed fraction values and
  * the first-failing-rule ordering.
  */
class TextFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "text-filter-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  /** n distinct filler words with a per-doc prefix (no cross-doc overlap). */
  private def words(prefix: String, n: Int): Seq[String] = (0 until n).map(j => s"$prefix$j")

  test("q50: hand-computed fractions on a 5-token doc") {
    // ws = [a b a b a]: 2-grams (a b, b a, a b, b a) -> top 2/4 = 0.5;
    // 3-grams (a b a, b a b, a b a) -> 1 - 2/3 = 0.3333
    val out = TextQueries.repetitionSignals(docsDF(Seq((1L, "a b a b a")))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(1) == 0.5, s"top2gram_frac = ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.3333, s"dup3gram_frac = ${r.getDouble(2)}")
    assert(r.getBoolean(3), "top2 = 0.5 > 0.2 must flag")
  }

  test("q50: dominant phrase and template churn flag; clean docs do not") {
    val phrase = "spam ham " * 30 // one 2-gram dominates
    val churn = (words("c", 40) ++ words("c", 40) ++ words("c", 40)).mkString(" ") // 3x-repeated 40-gram
    val clean = words("u", 60).mkString(" ")
    val out = TextQueries
      .repetitionSignals(docsDF(Seq((1L, phrase.trim), (2L, churn), (3L, clean), (4L, "too short"))))
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(out(1L).getBoolean(3), "dominant 2-gram must flag")
    assert(out(2L).getBoolean(3) && out(2L).getDouble(2) > 0.4, "3x-repeated phrase must flag via dup3")
    assert(!out(3L).getBoolean(3), "all-distinct doc must not flag")
    assert(!out.contains(4L), "docs under 3 tokens are excluded (oracle mirrors the filter)")
  }

  test("q52: each rule fires, in first-failing order") {
    val lowDiv = ("the " * 50).trim // 199 chars, diversity 1/50; ' the ' present but low_diversity first
    val repetitive = (words("r", 40) ++ words("r", 40) ++ words("r", 40)).mkString(" ") // div 1/3, dup3 ~0.66
    val nonEn = words("zq", 40).mkString(" ") // diverse, length ok, no English markers
    val kept = (words("k", 38) :+ "the k0 again").mkString(" ")
    val rows = Seq(
      (1L, "x y z"), // too_short wins over non_english (ordering)
      (2L, words("L", 600).mkString(" ")), // > 2000 chars
      (3L, lowDiv),
      (4L, repetitive),
      (5L, nonEn),
      (6L, kept)
    )
    val out = TextQueries.filterCascade(docsDF(rows)).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(
      out == Map(
        "too_short" -> 1L,
        "too_long" -> 2L,
        "low_diversity" -> 3L,
        "repetitive" -> 4L,
        "non_english" -> 5L,
        "kept" -> 6L
      ),
      s"cascade verdicts = $out"
    )
  }

  test("q53: redaction handles multiple, adjacent, and absent PII") {
    val sp = spark; import sp.implicits._
    val notes = Seq(
      (1L, "s", "two mails a@b.example and c.d@e-f.example plus 555-123-4567"),
      (2L, "s", "adjacent 111-222-3333 444-555-6666 and x%y+z@host.example trailing"),
      (3L, "s", "nothing sensitive here, just 12-34 and not@all"),
      (4L, "s", "a@b.example")
    ).toDF("note_id", "segment", "note")
    // reuse the aggregate path for counts...
    val agg = TextQueries.piiRedact(notes).collect().head
    assert(agg.getLong(1) == 4L && agg.getLong(2) == 3L && agg.getLong(3) == 2L, s"agg = $agg")
    // ...and pin the redacted strings byte-exactly
    val red = notes
      .select(
        col("note_id"),
        regexp_replace(regexp_replace(col("note"), TextQueries.EmailRe, "<EMAIL>"), TextQueries.PhoneRe, "<PHONE>")
          .as("red")
      )
      .as[(Long, String)]
      .collect()
      .toMap
    assert(red(1L) == "two mails <EMAIL> and <EMAIL> plus <PHONE>")
    assert(red(2L) == "adjacent <PHONE> <PHONE> and <EMAIL> trailing")
    assert(red(3L) == "nothing sensitive here, just 12-34 and not@all")
    assert(red(4L) == "<EMAIL>")
  }

  test("q51: split is a pure function of content — duplicate texts co-locate, row order is irrelevant") {
    val sp = spark; import sp.implicits._
    val texts = (0 until 200).map(i => words(s"t$i-", 30).mkString(" "))
    // the same 200 texts under two sources: identical per-split counts
    val rows = texts.zipWithIndex.flatMap { case (tx, i) =>
      Seq((i.toLong, tx, "srcA", tx.length.toLong), (1000L + i, tx, "srcB", tx.length.toLong))
    }
    val docs = rows.toDF("doc_id", "text", "source", "n_chars")
    val out = TextQueries.hashSplit(docs).collect()
    val bySrc = out.groupBy(_.getString(0)).map { case (s, rs) =>
      s -> rs.map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    }
    assert(bySrc("srcA") == bySrc("srcB"), "identical content must land in identical splits per source")
    assert(bySrc("srcA").values.map(_._1).sum == 200L)
    assert(bySrc("srcA").keySet.contains("train"), s"200 docs must populate train: ${bySrc("srcA")}")
    // reordering and repartitioning the input must not move any doc
    val shuffled = TextQueries.hashSplit(docs.orderBy(rand(7)).repartition(13)).collect()
    assert(shuffled.toSet == out.toSet, "split assignment must be independent of row order/partitioning")
  }
}
