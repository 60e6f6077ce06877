package graft.spec

import scala.collection.mutable

import graft.core.{CrawlParams, DeltaRow, LeakStatus, NodeStatus}
import graft.extract.Extract
import graft.walks.WalkAlgebra

/** Single-threaded executable specification of the crawl-and-rank loop.
  *
  * The reference's crawl order is an emergent property of goroutine
  * scheduling and an unseeded RNG — irreproducible even by itself
  * (SURVEY.md §7.4). This spec replaces it with a fully deterministic
  * definition of the same semantics (per-event deltas, incremental walk
  * repair, arbiter promote/demote, politeness-capped priority scheduling),
  * and the distributed Spark engine is required to match it BYTE-FOR-BYTE
  * on (a) per-round fetch order and (b) the final URL-seen set, and exactly
  * on node statuses and walk state.
  *
  * Round semantics (the contract; RoundDriver mirrors it 1:1):
  *   1. pending = enqueued \ fetched. Empty ⇒ crawl complete.
  *   2. Priority cut: order pending by (rank desc, url asc); within each
  *      host keep the top `hostBudget`; take the global top `batch`.
  *      (Reference W3 politeness window, SURVEY.md §2.5.)
  *   3. Fetch: all versions of each batch URL from the pages table, in
  *      warc_ts order. Version w of every node forms "wave" w.
  *   4. Per wave: extract outlinks (oversize-gated), assign ids to unknown
  *      URLs (sorted-url order, prevMax+1.. — deterministic, SURVEY.md §1.3)
  *      only for active authors, compute per-node deltas, apply edges, then
  *      repair every walk against the wave's delta map
  *      (WalkAlgebra.repairWalk).
  *   5. Leak scan: batch pages whose text contains a validated secret mark
  *      their node leaked and drop walks starting there (reference setLeak,
  *      /root/reference/pkg/pipe/arbiter/arbiter.go:137-174).
  *   6. Arbiter: if walksChanged/totalWalks ≥ activation, snapshot ranks
  *      once and promote/demote (reference scan, arbiter.go:177-260).
  *      Promoted nodes get walks (round r, reserved wave 15) and are
  *      enqueued.
  */
object SequentialSpec {

  /** One immutable page version visible to the spec. */
  case class PageV(url: String, tsSec: Long, html: Array[Byte], text: String)

  case class NodeState(
      id: Long,
      url: String,
      host: String,
      var status: String,
      addedRound: Long,
      var promotedRound: Long = -1L,
      var demotedRound: Long = -1L
  )

  /** Per-round trace artifacts compared against the Spark engine. */
  case class RoundTrace(
      round: Long,
      fetchOrder: Vector[String], // ordered batch — byte-compared
      walksChanged: Long,
      promoted: Vector[Long],
      demoted: Vector[Long],
      scanRan: Boolean
  )

  case class Result(
      traces: Vector[RoundTrace],
      seen: Vector[String], // sorted URL-seen set — byte-compared
      nodes: Map[Long, NodeState],
      adjacency: Map[Long, Array[Long]],
      walks: Map[Long, Array[Long]],
      urlToId: Map[String, Long],
      // id → (detectedRound, status, sorted md5 proofs) — the leak-records
      // table (reference leaks.Record, /root/reference/pkg/leaks/leaks.go:146-151)
      leakRecords: Map[Long, (Long, String, Vector[String])]
  )

  val GenWave = 15 // reserved RNG wave for walk generation (repair uses version waves 0..13)

  def run(
      pages: Seq[PageV],
      seeds: Seq[String],
      params: CrawlParams,
      maxRounds: Int,
      robots: Seq[(String, String)] = Nil // (host, disallowed path prefix)
  ): Result = {
    // pages indexed by canonical url, versions in (ts, md5) order — the md5
    // tiebreaker mirrors the engine's deterministic version numbering
    val byUrl: Map[String, Vector[PageV]] =
      pages.groupBy(_.url).view.mapValues(_.sortBy(p => (p.tsSec, Extract.md5Hex(p.html))).toVector).toMap
    byUrl.values.foreach { vs =>
      require(vs.length <= 14, s"${vs.length} versions for one url exceed the 14-wave RNG key budget")
    }

    // path derivation shares the engine's regex verbatim (Politeness.
    // PathPrefixRegex) so spec and engine cannot diverge on non-http(s) or
    // scheme-less urls (ADVICE r2); both run java.util.regex semantics
    def pathOf(u: String): String = {
      val m = graft.frontier.Politeness.PathPrefixRegex.r.findFirstIn(u).getOrElse("")
      u.substring(m.length)
    }
    def robotsDisallowed(u: String): Boolean = {
      val h = Extract.hostOf(u)
      val p = pathOf(u)
      robots.exists { case (rh, rp) => rh == h && p.startsWith(rp) }
    }

    val nodes = mutable.LinkedHashMap.empty[Long, NodeState]
    val urlToId = mutable.HashMap.empty[String, Long]
    val adjacency = mutable.HashMap.empty[Long, Array[Long]]
    val walks = mutable.HashMap.empty[Long, Array[Long]] // walkId → path
    val enqueued = mutable.LinkedHashSet.empty[String]
    val fetched = mutable.HashSet.empty[String]
    val leakRecords = mutable.LinkedHashMap.empty[Long, (Long, String, Vector[String])]
    var nextId = 0L

    val adj: WalkAlgebra.Adjacency = n => adjacency.getOrElse(n, Array.empty)

    def addNode(url: String, round: Long): NodeState = {
      val st = NodeState(nextId, url, Extract.hostOf(url), NodeStatus.Inactive, round)
      nodes(nextId) = st
      urlToId(url) = nextId
      nextId += 1
      st
    }

    def generateWalksFor(nodeId: Long, round: Long): Unit = {
      var i = 0
      while (i < params.walksPerNode) {
        val wid = nodeId * params.walksPerNode + i
        walks(wid) = WalkAlgebra.generateWalk(adj, nodeId, wid, round, GenWave, params)
        i += 1
      }
    }

    def removeWalksStartingAt(nodeId: Long): Unit = {
      var i = 0
      while (i < params.walksPerNode) { walks.remove(nodeId * params.walksPerNode + i); i += 1 }
    }

    // ---- init (round 0): seeds added + promoted + enqueued, like
    // pipe.InitGraph (/root/reference/pkg/pipe/pipe.go:50-71).
    seeds.foreach { u =>
      val st = addNode(u, 0L)
      st.status = NodeStatus.Active
      st.promotedRound = 0L
      generateWalksFor(st.id, 0L)
      enqueued += u
    }

    val traces = Vector.newBuilder[RoundTrace]
    var round = 1L
    var done = false

    while (!done && round <= maxRounds) {
      val pending = enqueued.toVector.filterNot(fetched).filterNot(robotsDisallowed)
      if (pending.isEmpty) done = true
      else {
        // ---- 2. priority cut
        val visitCounts = mutable.HashMap.empty[Long, Long]
        var totalVisits = 0L
        walks.valuesIterator.foreach { p =>
          totalVisits += p.length
          p.foreach(n => visitCounts.update(n, visitCounts.getOrElse(n, 0L) + 1))
        }
        def rank(u: String): Double = {
          val id = urlToId(u)
          if (totalVisits == 0) 0.0 else visitCounts.getOrElse(id, 0L).toDouble / totalVisits
        }
        val ordered = pending.sortBy(u => (-rank(u), u))
        val hostTaken = mutable.HashMap.empty[String, Int]
        val batch = Vector.newBuilder[String]
        var taken = 0
        var i = 0
        while (taken < params.batch && i < ordered.length) {
          val u = ordered(i)
          val h = Extract.hostOf(u)
          if (hostTaken.getOrElse(h, 0) < params.hostBudget) {
            hostTaken(h) = hostTaken.getOrElse(h, 0) + 1
            batch += u
            taken += 1
          }
          i += 1
        }
        val batchList = batch.result()
        batchList.foreach(fetched += _)

        // ---- 3./4. waves of versions
        var walksChanged = 0L
        val maxWaves = batchList.map(u => byUrl.get(u).map(_.length).getOrElse(0)).foldLeft(0)(math.max)
        var wave = 0
        while (wave < maxWaves) {
          // collect (author, outlinks) for nodes having a wave-th version
          val waveItems: Vector[(NodeState, Array[String])] = batchList.flatMap { u =>
            byUrl.get(u).flatMap(_.lift(wave)).flatMap { v =>
              val links = Extract.extractOutlinks(v.html, u)
              if (Extract.tooBig(v.html, links.length)) None
              else Some((nodes(urlToId(u)), links))
            }
          }
          // deterministic id assignment: all unknown urls referenced by
          // ACTIVE authors this wave, sorted ascending
          val unknown = waveItems
            .filter(_._1.status == NodeStatus.Active)
            .flatMap(_._2)
            .distinct
            .filterNot(urlToId.contains)
            .sorted
          unknown.foreach(u => addNode(u, round))

          // deltas + edge application
          val deltas = mutable.HashMap.empty[Long, DeltaRow]
          waveItems.foreach { case (author, links) =>
            val newFollows: Array[Long] =
              links.flatMap(urlToId.get).filterNot(_ == author.id).distinct.sorted
            val old = adjacency.getOrElse(author.id, Array.empty)
            val d = WalkAlgebra.newDelta(author.id, old, newFollows)
            if (d.remove.nonEmpty || d.add.nonEmpty) {
              adjacency(author.id) = newFollows
              deltas(author.id) = d
            }
          }

          // walk repair against the wave's deltas
          if (deltas.nonEmpty) {
            val ids = walks.keysIterator.toArray // snapshot — repairs mutate values only
            ids.foreach { wid =>
              WalkAlgebra.repairWalk(adj, deltas, wid, walks(wid), round, wave, params).foreach { np =>
                walks(wid) = np
                walksChanged += 1
              }
            }
          }
          wave += 1
        }

        // ---- 5. leak scan over the batch's page texts: confirmed = valid
        // secret (node leaked, walks dropped), suspected = pattern match
        // failing the checksum (record only; reference leaks.Record tiers)
        batchList.foreach { u =>
          val versions = byUrl.getOrElse(u, Vector.empty)
          val valid = versions.flatMap(v => Extract.findSecrets(v.text))
          val suspect = versions.flatMap(v => Extract.findSuspects(v.text))
          if (valid.nonEmpty || suspect.nonEmpty) {
            val id = urlToId(u)
            val status = if (valid.nonEmpty) LeakStatus.Confirmed else LeakStatus.Suspected
            if (!leakRecords.contains(id)) {
              val proofs = (valid ++ suspect)
                .map(s => Extract.md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
                .distinct
                .sorted
              leakRecords(id) = (round, status, proofs)
            }
          }
          if (valid.nonEmpty) {
            val st = nodes(urlToId(u))
            if (st.status != NodeStatus.Leaked) {
              if (st.status == NodeStatus.Active) removeWalksStartingAt(st.id)
              st.status = NodeStatus.Leaked
            }
          }
        }

        // ---- 6. arbiter scan
        val totalWalks = walks.size.toLong
        val ratio = if (totalWalks == 0) 0.0 else walksChanged.toDouble / totalWalks
        val promoted = Vector.newBuilder[Long]
        val demoted = Vector.newBuilder[Long]
        val scanRan = ratio >= params.activation && totalWalks > 0
        if (scanRan) {
          // snapshot ranks once (reference computes baseRank at scan start)
          val vc = mutable.HashMap.empty[Long, Long]
          var tv = 0L
          walks.valuesIterator.foreach { p => tv += p.length; p.foreach(n => vc.update(n, vc.getOrElse(n, 0L) + 1)) }
          if (tv > 0) {
            val baseRank = params.walksPerNode.toDouble / tv
            val promotionT = baseRank * params.promotion
            val demotionT = baseRank * params.demotion
            val ids = nodes.keysIterator.toVector.sorted
            ids.foreach { id =>
              val st = nodes(id)
              val r = vc.getOrElse(id, 0L).toDouble / tv
              st.status match {
                case NodeStatus.Leaked => ()
                case NodeStatus.Active =>
                  if (r < demotionT) {
                    removeWalksStartingAt(id)
                    st.status = NodeStatus.Inactive
                    st.demotedRound = round
                    demoted += id
                  }
                case NodeStatus.Inactive =>
                  if (r >= promotionT && round - st.addedRound >= params.promotionWait) {
                    st.status = NodeStatus.Active
                    st.promotedRound = round
                    generateWalksFor(id, round)
                    enqueued += st.url
                    promoted += id
                  }
                case _ => ()
              }
            }
          }
        }

        traces += RoundTrace(round, batchList, walksChanged, promoted.result(), demoted.result(), scanRan)
        round += 1
      }
    }

    Result(
      traces = traces.result(),
      seen = fetched.toVector.sorted,
      nodes = nodes.toMap,
      adjacency = adjacency.toMap,
      walks = walks.toMap,
      urlToId = urlToId.toMap,
      leakRecords = leakRecords.toMap
    )
  }
}
