package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CrawlParams, Rng}
import graft.walks.{IterativeWalker, WalkAlgebra}

/** The join-based scale-path walker must produce EXACTLY the same walks as
  * the broadcast/pure generator — same counter-based draws, different
  * physical plan (one shuffle join per hop instead of a broadcast map).
  */
class IterativeWalkerSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, appName = "iterative-walker-spec")

  test("iterative generation == pure generation, walk by walk") {
    import spark.implicits._
    val p = CrawlParams(alpha = 0.85, walksPerNode = 50)
    // deterministic random-ish graph: 40 nodes, out-degree 0..4
    val n = 40L
    val edges = (0L until n).flatMap { src =>
      val d = Rng.uniformIndex(7L, src, 0, 0, 5)
      (0 until d).map(j => (src, Math.floorMod(Rng.hash(7L, src, 1, j), n))).filter(e => e._2 != e._1)
    }.distinct
    val adjMap = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toArray.sorted }
    val adjF: WalkAlgebra.Adjacency = v => adjMap.getOrElse(v, Array.empty)

    val expected = (0L until n).flatMap { node =>
      (0 until p.walksPerNode).map { i =>
        val wid = node * p.walksPerNode + i
        wid -> WalkAlgebra.generateWalk(adjF, node, wid, 3L, 15, p).toSeq
      }
    }.toMap

    val adjDS = IterativeWalker.adjacencyTable(spark, spark.createDataset(edges))
    val starts = spark.createDataset((0L until n).toSeq)
    val got = IterativeWalker
      .generate(spark, starts, adjDS, 3L, 15, p)
      .collect()
      .map(w => w.walkId -> w.path.toSeq)
      .toMap

    assert(got.size === expected.size)
    assert(got === expected)

    // the exploded-edge walker (composite (cur, nextIdx) hop key — the
    // mega-hub path q43 rides) must be byte-identical too
    val gotExploded = IterativeWalker
      .generateExploded(spark, starts, adjDS, 3L, 15, p)
      .collect()
      .map(w => w.walkId -> w.path.toSeq)
      .toMap
    assert(gotExploded === expected)
  }

  test("exploded walker on a mega-hub source: identical walks, hop-1 keys spread over the hub's degree") {
    import spark.implicits._
    val p = CrawlParams(alpha = 0.85, walksPerNode = 2000)
    // one hub (node 0) pointing at 64 spokes, each spoke pointing back at
    // the next spoke — the single-source personalized-rank shape
    val edges: Seq[(Long, Long)] =
      (1L to 64L).map(d => (0L, d)) ++ (1L until 64L).map(i => (i, i + 1))
    val adjMap = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toArray.sorted }
    val adjF: WalkAlgebra.Adjacency = v => adjMap.getOrElse(v, Array.empty)
    val expected = (0 until p.walksPerNode).map { i =>
      i.toLong -> WalkAlgebra.generateWalk(adjF, 0L, i.toLong, 0L, 7, p).toSeq
    }.toMap

    val adjDS = IterativeWalker.adjacencyTable(spark, spark.createDataset(edges))
    val got = IterativeWalker
      .generateExploded(spark, spark.createDataset(Seq(0L)), adjDS, 0L, 7, p)
      .collect()
      .map(w => w.walkId -> w.path.toSeq)
      .toMap
    assert(got === expected)

    // the walks' first hops must genuinely use many distinct (hub, idx)
    // join keys — the skew-spread claim, checked on the data itself
    val firstHopIdx = expected.values.filter(_.length > 1).map(_.apply(1)).toSet
    assert(firstHopIdx.size > 16, s"2000 draws over 64 spokes must hit many spokes: ${firstHopIdx.size}")
  }
}
