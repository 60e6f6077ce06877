package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusPipeline

/** Pins the end-to-end curation pipeline on a planted corpus: every stage
  * removes exactly the doc it was planted to remove, the manifest accounts
  * for every input row, carried columns survive, and the whole run is
  * deterministic.
  */
class CorpusPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "corpus-pipeline-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** A quality-passing doc: "the " + 39 distinct prefixed words (~190
    * chars, diversity 1, no repetition, English marker).
    */
  private def good(prefix: String): String =
    "the " + (0 until 39).map(j => s"${prefix}word$j").mkString(" ")

  private def fixture: DataFrame = {
    val sp = spark; import sp.implicits._
    val nearBase = good("near")
    val nearVariant = nearBase.split(" ").dropRight(1).mkString(" ") + " zzz" // ~0.85 Jaccard to base
    val exactText = good("exact")
    val rows =
      Seq(
        (10L, nearBase, "s0"),
        (11L, nearVariant, "s0"), // dropped: near-dup of 10
        (20L, exactText, "s1"),
        (21L, exactText, "s1"), // dropped: exact dup of 20
        (30L, "x y z", "s2"), // dropped: too_short
        (31L, (0 until 39).map(j => s"zqword$j").mkString(" "), "s2") // dropped: non_english
      ) ++ (40L until 50L).map(i => (i, good(s"doc$i"), "s3"))
    rows.toDF("doc_id", "text", "source")
  }

  test("every stage drops its planted doc and the manifest sums to the input") {
    val (curated, m, release) = CorpusPipeline.curate(spark, fixture)
    val rows = curated.collect()
    release()

    assert(m.input == 16L)
    assert(m.exactDupsRemoved == 1L, s"manifest = ${m.json}")
    assert(m.nearDupsRemoved == 1L, s"manifest = ${m.json}")
    assert(m.droppedByReason == Map("too_short" -> 1L, "non_english" -> 1L), s"manifest = ${m.json}")
    assert(m.kept == 12L)
    assert(m.input == m.exactDupsRemoved + m.nearDupsRemoved + m.droppedByReason.values.sum + m.kept)
    assert(m.splits.values.sum == m.kept)

    val ids = rows.map(_.getLong(0)).toSet
    assert(ids == Set(10L, 20L) ++ (40L until 50L), s"survivors = $ids")
    // carried columns survive, split is stamped and valid
    assert(rows.forall(r => Set("train", "val", "test").contains(r.getAs[String]("split"))))
    assert(rows.filter(_.getLong(0) == 20L).head.getAs[String]("source") == "s1")
  }

  test("curation is deterministic, including under input reordering") {
    import org.apache.spark.sql.functions.rand
    val (c1, m1, r1) = CorpusPipeline.curate(spark, fixture)
    val set1 = c1.collect().toSet
    r1()
    val (c2, m2, r2) = CorpusPipeline.curate(spark, fixture.orderBy(rand(11)).repartition(7))
    val set2 = c2.collect().toSet
    r2()
    assert(m1 == m2)
    assert(set1 == set2)
  }

  test("no live caches survive a pipeline run after release") {
    val (curated, _, release) = CorpusPipeline.curate(spark, fixture)
    curated.count()
    release()
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.isEmpty, s"leaked caches: ${live.keys.mkString(",")}")
  }
}
