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
}
