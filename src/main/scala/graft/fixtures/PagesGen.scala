package graft.fixtures

import java.sql.Timestamp
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{Page, Rng}
import graft.extract.Extract

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Every page is a pure function of (seed, pageId), so generation is
  * embarrassingly parallel (`spark.range(P).map`) and reproducible at any
  * scale and partitioning. Structure:
  *
  *  - Zipf-ish host skew: host 0 owns ~30% of pages (exercises the
  *    mega-host salting path), remaining pages spread over H-1 hosts.
  *  - Outlink graph with dangling pages (pid % 11 == 7 has no links) and
  *    natural cycles (targets drawn uniformly over all pages).
  *  - Re-published pages: pid % 17 == 3 gets a second, later version whose
  *    outlinks keep the first half of v1 and add fresh ones → guaranteed
  *    Remove/Keep/Add deltas, like the reference's repeated kind:3 events
  *    (/root/reference/pkg/graph/graph.go:84-92).
  *  - Leak fixtures: pid % 97 == 13 embeds a valid nsec secret in the text,
  *    pid % 97 == 14 embeds a near-miss (checksum-broken) candidate.
  *
  * `text` is co-generated as `Extract.extractText(html)` so the
  * byte-identical-extraction invariant holds by construction; the test
  * suite re-derives it through the independent Spark-column path.
  */
object PagesGen extends Serializable {

  // Valid fixture secret from the reference's test corpus
  // (/root/reference/pkg/events/events_test.go:15-19).
  val ValidSecret = "nsec1zjlj7zp29dhk92fzn9ettntkag9wdyaxuugmmmn7gtve7xlqtupqwtyx8z"
  val NearMissSecret = "nsec1zjlj7zp29dhk92fzn9ettntkag9wdyaxuugmmmn7gtve7xlqtupqwtyx8q"

  private val Words = Array(
    "web", "crawl", "rank", "page", "link", "graph", "walk", "host", "index",
    "fetch", "queue", "batch", "seed", "frontier", "robots", "text", "parse",
    "score", "merge", "round", "shuffle", "join", "filter", "spark", "scala"
  )

  val BaseEpochSec: Long = 1767225600L // 2026-01-01T00:00:00Z

  case class Config(pages: Int, hosts: Int, seed: Long = 42L)
  val Tiny = Config(200, 5)
  val Small = Config(20000, 50)
  val Bench = Config(2000000, 1000)

  /** Host id of a page: 30% mass on host 0, rest uniform over 1..H-1. */
  def hostId(cfg: Config, pid: Long): Int =
    if (pid % 10 < 3) 0
    else 1 + Rng.uniformIndex(cfg.seed, pid, 0, 0, cfg.hosts - 1)

  def urlOf(cfg: Config, pid: Long): String =
    s"https://h${hostId(cfg, pid)}.example/p$pid"

  def isDangling(pid: Long): Boolean = pid % 11 == 7
  def isRepublished(pid: Long): Boolean = pid % 17 == 3

  /** Outlink target page-ids for version v (1 or 2) of page pid. */
  def outlinkPids(cfg: Config, pid: Long, version: Int): Array[Long] = {
    if (isDangling(pid)) return Array.empty
    val d1 = 1 + Rng.uniformIndex(cfg.seed, pid, 1, 0, 4)
    val v1 = Array.tabulate(d1) { j =>
      Rng.hash(cfg.seed, pid, 2, j) match { case h => Math.floorMod(h, cfg.pages.toLong) }
    }.distinct.filterNot(_ == pid)
    if (version == 1) v1
    else {
      val kept = v1.take((v1.length + 1) / 2)
      val d2 = 1 + Rng.uniformIndex(cfg.seed, pid, 4, 0, 4)
      val added = Array.tabulate(d2) { j =>
        Math.floorMod(Rng.hash(cfg.seed, pid, 5, j), cfg.pages.toLong)
      }.distinct.filterNot(t => t == pid || kept.contains(t))
      kept ++ added
    }
  }

  def bodyText(cfg: Config, pid: Long): String = {
    val n = 20 + Rng.uniformIndex(cfg.seed, pid, 6, 0, 30)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Words(Rng.uniformIndex(cfg.seed, pid, 7, i, Words.length)))
      i += 1
    }
    if (pid % 97 == 13) sb.append(' ').append(ValidSecret)
    if (pid % 97 == 14) sb.append(' ').append(NearMissSecret)
    sb.toString
  }

  def htmlOf(cfg: Config, pid: Long, version: Int): Array[Byte] = {
    val links = outlinkPids(cfg, pid, version)
    val sb = new StringBuilder
    sb.append("<html><head><title>doc ").append(pid).append("</title></head><body><p>")
    sb.append(bodyText(cfg, pid))
    sb.append("</p>")
    links.foreach { t =>
      sb.append("<a href=\"").append(urlOf(cfg, t)).append("\">link ").append(t).append("</a>")
    }
    sb.append("</body></html>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  def pageOf(cfg: Config, pid: Long, version: Int): Page = {
    val html = htmlOf(cfg, pid, version)
    val ts = BaseEpochSec + (if (version == 1) pid else cfg.pages.toLong + pid)
    Page(
      url = urlOf(cfg, pid),
      warc_ts = new Timestamp(ts * 1000L),
      html = html,
      text = Extract.extractText(html),
      lang = if (pid % 13 == 0) "de" else "en"
    )
  }

  /** All rows of the corpus as a distributed Dataset (v1 for every page,
    * v2 for re-published pages).
    */
  def generate(spark: SparkSession, cfg: Config, partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    val v1 = spark.range(0, cfg.pages.toLong, 1, partitions).map(pid => pageOf(cfg, pid, 1))
    val v2 = spark
      .range(0, cfg.pages.toLong, 1, partitions)
      .filter(pid => isRepublished(pid))
      .map(pid => pageOf(cfg, pid, 2))
    v1.union(v2)
  }

  def writeParquet(spark: SparkSession, cfg: Config, dir: String, partitions: Int = 32): Unit =
    generate(spark, cfg, partitions).write.mode("overwrite").parquet(dir)

  /** Deterministic robots.txt disallow rules: host h disallows the path
    * prefix "/p{7h+3}" (that pid and its decimal extensions, when they live
    * on host h). Used by the robots-gate equivalence fixture.
    */
  def robotsRules(cfg: Config): Seq[(String, String)] =
    (0 until cfg.hosts).map(h => (s"h$h.example", s"/p${7 * h + 3}"))

  /** Seed URLs: first page of each of the first n distinct hosts
    * (FIXTURES.md §2: 3 seeds into distinct hosts).
    */
  def seedUrls(cfg: Config, n: Int = 3): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pid = 0L
    while (out.size < n && pid < cfg.pages) {
      val h = hostId(cfg, pid)
      if (!seen.contains(h)) { seen += h; out += urlOf(cfg, pid) }
      pid += 1
    }
    out.toSeq
  }
}
