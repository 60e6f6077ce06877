package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.extract.Extract
import graft.fixtures.PagesGen

/** Extraction semantics: pure-Scala path == Spark-column path ==
  * co-generated `text` column (the byte-identical invariant of
  * BASELINE.json input_hint), URL canonicalization table (web analog of
  * /root/reference/pkg/relays/relay_test.go:66-245), secret corpus
  * (pkg/leaks/leaks_test.go), oversize gate (pkg/events/events.go:19-27).
  */
class ExtractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, appName = "extract-spec")

  test("byte-identical text extraction: column path == pure path == stored text") {
    import spark.implicits._
    val ds = PagesGen.generate(spark, PagesGen.Tiny, partitions = 4)
    val mismatches = ds
      .withColumn("recomputed", Extract.extractTextCol(col("html")))
      .filter(col("recomputed") =!= col("text"))
      .count()
    assert(mismatches === 0)
    // and the pure path agrees row-by-row
    val rows = ds.collect()
    assert(rows.nonEmpty)
    rows.foreach(p => assert(Extract.extractText(p.html) === p.text, s"url=${p.url}"))
  }

  test("url canonicalization table") {
    val cases = Seq(
      "https://Example.COM/path/" -> Some("https://example.com/path"),
      "HTTP://a.b/x" -> Some("http://a.b/x"),
      "https://h0.example/p1" -> Some("https://h0.example/p1"),
      "https://h0.example/" -> Some("https://h0.example"),
      "https://h0.example" -> Some("https://h0.example"),
      " https://h0.example/p2 " -> Some("https://h0.example/p2"),
      "ftp://h0.example/x" -> None,
      "https://user@h0.example/" -> None,
      "https://h0.example/x?q=1" -> None,
      "https://h0.example/x#frag" -> None,
      "https://evil.onion/x" -> None,
      "" -> None,
      "not a url" -> None
    )
    cases.foreach { case (in, want) => assert(Extract.canonicalUrl(in) === want, s"input=$in") }
  }

  test("host extraction") {
    assert(Extract.hostOf("https://h3.example/p77") === "h3.example")
    assert(Extract.hostOf("https://h3.example") === "h3.example")
  }

  test("outlinks: document order, dedup, self-excluded") {
    val html =
      ("""<html><body><a href="https://b.x/1">l</a><a href="https://a.x/2">l</a>""" +
        """<a href="https://b.x/1">dup</a><a href="https://self.x/me">s</a></body></html>""").getBytes("UTF-8")
    val got = Extract.extractOutlinks(html, "https://self.x/me")
    assert(got.toSeq === Seq("https://b.x/1", "https://a.x/2"))
  }

  test("secret corpus: valid fixture accepted, near-miss rejected") {
    assert(Extract.validBech32Secret(PagesGen.ValidSecret))
    assert(!Extract.validBech32Secret(PagesGen.NearMissSecret))
    assert(Extract.findSecrets(s"text ${PagesGen.ValidSecret} more").toSeq === Seq(PagesGen.ValidSecret))
    assert(Extract.findSecrets(s"text ${PagesGen.NearMissSecret} more").isEmpty)
    assert(Extract.findSecrets("no secrets here").isEmpty)
    assert(Extract.findSecrets(null).isEmpty)
    // cheap prefilter path: "nsec1" absent
    assert(Extract.findSecrets("nsec2aaaa").isEmpty)
  }

  test("oversize gate") {
    assert(Extract.tooBig(new Array[Byte](Extract.MaxContentBytes + 1), 0))
    assert(Extract.tooBig(Array[Byte](1), Extract.MaxOutlinks + 1))
    assert(!Extract.tooBig(Array[Byte](1), 10))
  }

  test("legacy store adoption pins corpus content, not just size") {
    // a stored extraction from the Tiny corpus matches Tiny...
    val stored = graft.round.CrawlEngine
      .extractPages(spark, PagesGen.generate(spark, PagesGen.Tiny, partitions = 4).toDF)
    assert(graft.app.CrawlMain.legacyStoreMatches(spark, stored, PagesGen.Tiny))
    // ...but NOT a same-page-count corpus from a different seed or host
    // config (the silent-adopt gap the count-only check left open), nor a
    // different size
    assert(!graft.app.CrawlMain.legacyStoreMatches(spark, stored, PagesGen.Tiny.copy(seed = 43L)))
    assert(!graft.app.CrawlMain.legacyStoreMatches(spark, stored, PagesGen.Tiny.copy(hosts = 7)))
    assert(!graft.app.CrawlMain.legacyStoreMatches(spark, stored, PagesGen.Small))
  }
}
