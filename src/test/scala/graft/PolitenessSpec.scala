package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.frontier.Politeness

/** The salted two-phase politeness cut must equal the naive single-window
  * per-host top-k exactly, including on a skewed host distribution.
  */
class PolitenessSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, appName = "politeness-spec")

  test("salted top-k == single-window top-k on a skewed frontier") {
    import spark.implicits._
    // 10k urls, one mega-host with ~30% of them
    val rows = (0 until 10000).map { i =>
      val host = if (i % 10 < 3) "mega.example" else s"h${i % 97}.example"
      (s"https://$host/p$i", host, (graft.core.Rng.u01(1L, i, 0, 0) * 100).toInt.toDouble)
    }
    val df = rows.toDF("url", "host", "rank")
    val k = 7

    val naive = df
      .withColumn("hrn", row_number().over(Window.partitionBy($"host").orderBy($"rank".desc, $"url".asc)))
      .filter($"hrn" <= k)
      .drop("hrn")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet

    val salted = Politeness
      .hostCappedTopK(df, $"host", Seq($"rank".desc, $"url".asc), $"url", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet

    assert(salted === naive)
    assert(salted.groupBy(_._2).values.forall(_.size <= k))
  }

  test("robots path derivation: non-http schemes and scheme-less urls (ADVICE r2)") {
    import spark.implicits._
    val cases = Seq(
      "https://h.example/a/b" -> "/a/b",
      "http://h.example/" -> "/",
      "ftp://h.example/secret/x" -> "/secret/x",
      "wss://relay.example/sub/1" -> "/sub/1",
      "h.example/bare/path" -> "/bare/path",
      "h.example" -> "",
      "weird+x.1://h/z" -> "/z",
      "/rooted/path" -> "/rooted/path"
    )
    // engine column form
    val got = cases
      .map(_._1)
      .toDF("url")
      .select($"url", Politeness.pathOf($"url").as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    // spec scalar form (same regex by construction — pin both anyway)
    def specPath(u: String): String = {
      val m = Politeness.PathPrefixRegex.r.findFirstIn(u).getOrElse("")
      u.substring(m.length)
    }
    cases.foreach { case (u, want) =>
      assert(got(u) === want, s"engine path of $u")
      assert(specPath(u) === want, s"spec path of $u")
    }
  }

  test("robots gate blocks disallowed prefixes on non-http schemes too") {
    import spark.implicits._
    val nodes = Seq(
      ("ftp://h9.example/secret/x", 1L, "h9.example", "inactive"),
      ("ftp://h9.example/open/y", 2L, "h9.example", "inactive"),
      ("https://h9.example/secret/z", 3L, "h9.example", "inactive")
    ).toDF("url", "id", "host", "status")
    val enqueued = nodes.select($"url")
    val fetched = Seq.empty[String].toDF("url")
    val visits = Seq.empty[(Long, Long)].toDF("node", "count")
    val rules = Seq(("h9.example", "/secret")).toDF("host", "prefix")
    val out = Politeness
      .schedule(nodes, visits, 0L, enqueued, fetched, batch = 10, hostBudget = 10, robots = Some(rules))
      .collect()
      .map(_.getString(0))
      .toSet
    assert(out === Set("ftp://h9.example/open/y"))
  }
}
