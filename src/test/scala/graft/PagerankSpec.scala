package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CrawlParams, DeltaRow}
import graft.walks.WalkAlgebra

/** Statistical rank tests against closed-form ground truth — ports the
  * reference's canonical graphs and exact vectors
  * (/root/reference/tests/random/utils.go:168-457, FIXTURES.md §3).
  * Tolerance: L1 ≤ 0.01 at 5000 walks/node, α=0.85, as in
  * tests/random/pagerank_test.go:14-16.
  */
class PagerankSpec extends AnyFunSuite {

  val N = 5000
  val p: CrawlParams = CrawlParams(alpha = 0.85, walksPerNode = N)

  def adjOf(n: Int, edges: Map[Long, Seq[Long]]): WalkAlgebra.Adjacency =
    v => edges.getOrElse(v, Seq.empty).toArray.sorted

  /** Generate N walks per node and return the visit-frequency estimator
    * (reference pagerank.Global = visits/totalVisits,
    * /root/reference/pkg/pagerank/pagerank.go:30-56).
    */
  def globalRank(n: Int, adj: WalkAlgebra.Adjacency, round: Long = 0L): Array[Double] = {
    val visits = new Array[Long](n)
    var total = 0L
    var node = 0L
    while (node < n) {
      var i = 0
      while (i < N) {
        val wid = node * N + i
        val w = WalkAlgebra.generateWalk(adj, node, wid, round, 15, p)
        total += w.length
        w.foreach(v => visits(v.toInt) += 1)
        i += 1
      }
      node += 1
    }
    visits.map(_.toDouble / total)
  }

  def l1(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.sum

  def check(name: String, n: Int, edges: Map[Long, Seq[Long]], expected: Array[Double]): Unit = {
    val got = globalRank(n, adjOf(n, edges))
    val d = l1(got, expected)
    assert(d <= 0.01, s"$name: L1=$d got=${got.mkString(",")}")
  }

  test("Dandlings(5): uniform 1/n") {
    check("dandlings", 5, Map.empty, Array.fill(5)(0.2))
  }

  test("Cyclic(5): uniform 1/n") {
    val edges = (0L until 5L).map(i => i -> Seq((i + 1) % 5)).toMap
    check("cyclic5", 5, edges, Array.fill(5)(0.2))
  }

  test("Acyclic1") {
    check(
      "acyclic1",
      5,
      Map(0L -> Seq(1L, 2L), 2L -> Seq(3L), 3L -> Seq(1L)),
      Array(0.11185, 0.36950, 0.15943, 0.24736, 0.11185)
    )
  }

  test("Acyclic2") {
    check(
      "acyclic2",
      6,
      Map(0L -> Seq(1L, 2L), 4L -> Seq(3L, 5L)),
      Array(0.12987, 0.18506, 0.18506, 0.18506, 0.12987, 0.18506)
    )
  }

  test("Acyclic3") {
    check(
      "acyclic3",
      4,
      Map(0L -> Seq(1L, 2L), 3L -> Seq(1L, 2L)),
      Array(0.17544, 0.32456, 0.32456, 0.17544)
    )
  }

  test("Acyclic4") {
    check(
      "acyclic4",
      4,
      Map(0L -> Seq(1L, 2L), 3L -> Seq(1L)),
      Array(0.17544, 0.39912, 0.25, 0.17544)
    )
  }

  test("Acyclic5") {
    check(
      "acyclic5",
      4,
      Map(0L -> Seq(3L), 1L -> Seq(0L), 3L -> Seq(2L)),
      Array(0.21489, 0.11616, 0.37015, 0.29881)
    )
  }

  test("Acyclic6") {
    check(
      "acyclic6",
      5,
      Map(0L -> Seq(4L), 1L -> Seq(0L), 3L -> Seq(1L, 4L), 4L -> Seq(2L)),
      Array(0.18820, 0.12128, 0.32417, 0.08511, 0.28125)
    )
  }

  test("Acyclic7") {
    check(
      "acyclic7",
      5,
      Map(0L -> Seq(1L, 2L, 3L), 4L -> Seq(0L, 1L, 2L, 3L)),
      Array(0.17622, 0.22615, 0.22615, 0.22615, 0.14534)
    )
  }

  test("dynamic involution: delta + inverse repair returns to ground truth (acyclic)") {
    // TestPagerankDynamic (tests/random/pagerank_test.go:66-125): modify the
    // graph, generate walks on the modified graph, then apply the INVERSE
    // delta through walk repair — the distribution must return to the
    // original graph's ground truth. Known caveat: holds for acyclic graphs
    // (pagerank_test.go:59-65).
    val original = Map(0L -> Seq(1L, 2L), 3L -> Seq(1L, 2L)) // Acyclic3
    val expected = Array(0.17544, 0.32456, 0.32456, 0.17544)
    // delta on node 0: remove 2, keep 1 → modified graph 0→{1}, 3→{1,2}
    val delta = DeltaRow(0L, remove = Array(2L), keep = Array(1L), add = Array.empty)
    val modified = Map(0L -> Seq(1L), 3L -> Seq(1L, 2L))
    val inv = delta.inverse // remove ∅... add back 2

    // generate all walks on the modified graph
    val adjMod = adjOf(4, modified)
    val adjOrig = adjOf(4, original)
    val walks = scala.collection.mutable.Map.empty[Long, Array[Long]]
    (0L until 4L).foreach { node =>
      (0 until N).foreach { i =>
        val wid = node * N + i
        walks(wid) = WalkAlgebra.generateWalk(adjMod, node, wid, 0L, 15, p)
      }
    }
    // apply inverse delta via repair (graph restored to original first,
    // as the reference updates the graph before the walks)
    val dmap = Map(inv.node -> inv)
    walks.keys.toArray.foreach { wid =>
      WalkAlgebra.repairWalk(adjOrig, dmap, wid, walks(wid), 1L, 0, p).foreach(np => walks(wid) = np)
    }
    val visits = new Array[Long](4)
    var total = 0L
    walks.values.foreach { w => total += w.length; w.foreach(v => visits(v.toInt) += 1) }
    val got = visits.map(_.toDouble / total)
    val d = l1(got, expected)
    assert(d <= 0.02, s"involution L1=$d got=${got.mkString(",")}")
  }
}
