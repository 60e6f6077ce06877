package graft.round

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.extract.Extract
import graft.walks.WalkAlgebra

/** The distributed crawl-and-rank engine: a deterministic round loop over
  * columnar state tables, mirroring graft.spec.SequentialSpec 1:1 (that
  * file documents the round contract; equivalence is asserted byte-for-byte
  * by CrawlEquivalenceSpec).
  *
  * Scale design:
  *
  *  - State lives IN MEMORY across rounds (persisted / locally-checkpointed
  *    Datasets); disk sees per-round DELTA logs (changed+added+removed
  *    walks, edge replacements, node additions/updates, fetched/enqueued
  *    appends) plus a full compaction every `compactEvery` rounds and at
  *    run exit — the incremental-snapshot pattern an Iceberg MERGE commit
  *    gives. Every committed round is resumable: loadState() replays the
  *    delta logs on top of the latest compaction (crash path covered by
  *    test via compactOnExit=false).
  *  - Visit counts (the rank numerator) are maintained INCREMENTALLY and
  *    exactly from the walk deltas — the reference keeps totalVisits and a
  *    visit index incrementally for the same reason
  *    (/root/reference/pkg/regraph/walks.go:236,263,306-317; optimization
  *    O2 in SURVEY.md §4). No per-round explode of the full walk store.
  *  - totalWalks is pure arithmetic: every active node owns exactly
  *    walksPerNode walks, so repairs don't change the count and
  *    promote/demote/leak shift it by ±walksPerNode each.
  *  - Walk repair emits ONLY changed walks (flatMap over the cached store),
  *    merged back with a broadcast anti-join + union; the store is
  *    re-materialized once per round via an eager localCheckpoint — no
  *    per-round parquet rewrite of the full store.
  *  - Per-round driver-side data is O(batch) (like the reference's fetch
  *    batch, /root/reference/pkg/pipe/fetcher/fetcher.go:74-107) plus the
  *    crawled-subgraph adjacency (grows with crawl progress, not corpus
  *    size; broadcast while small, IterativeWalker beyond
  *    broadcastMaxEdges).
  */
object CrawlEngine {

  /** One-time heavy scan of the pages table: html → outlinks + leak flag,
    * versions numbered per url in warc_ts order. At 100 TB this is the only
    * pass that touches the `html` binary column (column pruning keeps every
    * later round on the light columns), so it runs ONCE up front and lands
    * columnar.
    */
  def extractPages(spark: SparkSession, pages: DataFrame): DataFrame = {
    Extract.register(spark)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("url").orderBy("warc_ts")
    pages
      .withColumn("outlinks", expr("extract_outlinks(html, url)"))
      .withColumn("rejected", expr(s"size(outlinks) > ${Extract.MaxOutlinks} OR length(html) > ${Extract.MaxContentBytes}"))
      .withColumn("has_secret", expr("size(find_secrets(text)) > 0"))
      .withColumn("ver", row_number().over(w))
      .select("url", "ver", "outlinks", "rejected", "has_secret")
  }

  case class Trace(
      round: Long,
      fetchOrder: Vector[String],
      walksChanged: Long,
      promoted: Long,
      demoted: Long,
      scanRan: Boolean,
      metrics: RoundMetrics
  )

  case class Result(traces: Vector[Trace], finalRound: Long)
}

class RoundDriver(
    spark: SparkSession,
    io: TableIO,
    params: CrawlParams,
    /** Above this many edges the promoted-node walk generation switches
      * from broadcast adjacency to the join-based IterativeWalker (the
      * 10^10-frontier path); results are identical either way.
      */
    broadcastMaxEdges: Long = 10000000L,
    /** Full-snapshot cadence; rounds in between write delta logs only. */
    compactEvery: Int = 8,
    /** Write a full snapshot when run() exits (downstream readers expect
      * full tables at the last round; disable to exercise the crash-resume
      * replay path).
      */
    compactOnExit: Boolean = true
) {
  import spark.implicits._
  import CrawlEngine._

  private val GenWave = graft.spec.SequentialSpec.GenWave

  private val phaseTiming = sys.env.get("GRAFT_PHASE_TIMING").contains("1")
  private def phase[T](round: Long, name: String)(body: => T): T = {
    if (!phaseTiming) body
    else {
      val t = System.nanoTime()
      val r = body
      System.err.println(s"[phase r=$round] $name ${(System.nanoTime() - t) / 1000000} ms")
      r
    }
  }

  /** Mutable in-memory engine state (Datasets persisted across rounds). */
  private case class State(
      var nodes: DataFrame,
      var edges: DataFrame, // (src, dst)
      var walks: Dataset[WalkRow],
      var fetched: DataFrame, // (url)
      var enqueued: DataFrame, // (url)
      var visits: DataFrame, // (node, count) — exact incremental
      var nextId: Long,
      var totalWalks: Long,
      var fetchedCount: Long,
      val adjacency: mutable.Map[Long, Array[Long]]
  )

  /** Initialize round-0 state from the seed list (reference InitGraph,
    * /root/reference/pkg/pipe/pipe.go:50-71: add + promote + enqueue).
    */
  def init(seeds: Seq[String]): Unit = {
    val nodes = seeds.zipWithIndex.map { case (u, i) =>
      NodeRow(i.toLong, u, Extract.hostOf(u), NodeStatus.Active, 0L, 0L, -1L)
    }
    val emptyAdj: WalkAlgebra.Adjacency = _ => Array.empty
    val p = params
    val walks = nodes.flatMap { n =>
      (0 until p.walksPerNode).map { i =>
        val wid = n.id * p.walksPerNode + i
        WalkRow(wid, n.id, WalkAlgebra.generateWalk(emptyAdj, n.id, wid, 0L, GenWave, p))
      }
    }
    val walksDF = spark.createDataset(walks).toDF
    io.write(0L, "nodes", spark.createDataset(nodes).toDF)
    io.write(0L, "edges", spark.emptyDataset[EdgeRow].toDF)
    io.write(0L, "walks", walksDF)
    io.write(0L, "fetched", Seq.empty[String].toDF("url"))
    io.write(0L, "enqueued", seeds.toDF("url"))
    io.write(0L, "visits", walksDF.select(explode($"path").as("node")).groupBy("node").count())
    io.commitRound(0L)
  }

  /** Load state at `target`: latest full snapshot ≤ target + delta replay
    * (the crash-resume path; a run that exited cleanly compacted at target,
    * so replay is a no-op there).
    */
  private def loadState(target: Long): State = {
    val base = (target to 0L by -1L).find(r => io.exists(r, "walks")).getOrElse(0L)
    var nodes = io.read(base, "nodes")
    var edges = io.read(base, "edges")
    var walks = io.read(base, "walks")
    var fetched = io.read(base, "fetched")
    var enqueued = io.read(base, "enqueued")
    ((base + 1) to target).foreach { r =>
      if (io.exists(r, "nodes_added")) nodes = nodes.union(io.read(r, "nodes_added"))
      if (io.exists(r, "nodes_updates")) {
        val u = io
          .read(r, "nodes_updates")
          .select($"id".as("uid"), $"status".as("ustatus"), $"promotedRound".as("upr"), $"demotedRound".as("udr"))
        nodes = nodes
          .join(u, nodes("id") === $"uid", "left")
          .select(
            $"id",
            $"url",
            $"host",
            coalesce($"ustatus", $"status").as("status"),
            $"addedRound",
            coalesce($"upr", $"promotedRound").as("promotedRound"),
            coalesce($"udr", $"demotedRound").as("demotedRound")
          )
      }
      if (io.exists(r, "edges_removed_src")) {
        val rem = io.read(r, "edges_removed_src").select($"src".as("rsrc"))
        edges = edges.join(rem, edges("src") === $"rsrc", "left_anti")
      }
      if (io.exists(r, "edges_added")) edges = edges.union(io.read(r, "edges_added"))
      if (io.exists(r, "walks_removed")) {
        val rem = io.read(r, "walks_removed").select($"walkId".as("rwid"))
        walks = walks.join(rem, walks("walkId") === $"rwid", "left_anti")
      }
      if (io.exists(r, "walks_added")) walks = walks.union(io.read(r, "walks_added"))
      if (io.exists(r, "fetched_add")) fetched = fetched.union(io.read(r, "fetched_add"))
      if (io.exists(r, "enqueued_add")) enqueued = enqueued.union(io.read(r, "enqueued_add")).dropDuplicates("url")
    }
    val nodesC = nodes.localCheckpoint(true)
    val edgesC = edges.localCheckpoint(true)
    val walksC = walks.as[WalkRow].localCheckpoint(true)
    val fetchedC = fetched.localCheckpoint(true)
    val enqueuedC = enqueued.localCheckpoint(true)
    val visits = io.read(target, "visits").localCheckpoint(true)
    val nextId = nodesC.agg(max($"id")).as[Option[Long]].first().getOrElse(-1L) + 1
    val totalWalks = walksC.count()
    val fetchedCount = fetchedC.count()
    val adjacency = mutable.Map.empty[Long, Array[Long]]
    edgesC
      .as[EdgeRow]
      .groupByKey(_.src)
      .mapGroups((src, it) => (src, it.map(_.dst).toArray.sorted))
      .collect()
      .foreach { case (s, a) => adjacency(s) = a }
    State(nodesC, edgesC, walksC, fetchedC, enqueuedC, visits, nextId, totalWalks, fetchedCount, adjacency)
  }

  /** Run rounds [lastComplete+1 .. maxRounds]. */
  def run(extracted: DataFrame, maxRounds: Int): Result = {
    val traces = Vector.newBuilder[Trace]
    var round = io.lastCompleteRound() + 1
    require(round >= 1, "call init() first")
    if (round > maxRounds) return Result(Vector.empty, round - 1)
    val st = loadState(round - 1)
    var done = false

    while (!done && round <= maxRounds) {
      runRound(st, round, extracted) match {
        case Some(t) =>
          traces += t
          if (round % compactEvery == 0) compact(st, round)
          round += 1
        case None => done = true
      }
    }
    val lastDone = round - 1
    if (compactOnExit && lastDone >= 1 && !io.exists(lastDone, "walks")) compact(st, lastDone)
    Result(traces.result(), lastDone)
  }

  /** Full snapshot of the in-memory state at `round` (the Iceberg
    * rewrite-compaction analog).
    */
  private def compact(st: State, round: Long): Unit = phase(round, "compact") {
    io.write(round, "nodes", st.nodes.select("id", "url", "host", "status", "addedRound", "promotedRound", "demotedRound"))
    io.write(round, "edges", st.edges)
    io.write(round, "walks", st.walks.toDF)
    io.write(round, "fetched", st.fetched)
    io.write(round, "enqueued", st.enqueued)
    io.commitRound(round) // idempotent
  }

  /** Apply a (node, d) delta table to the exact visit counts. */
  private def applyVisitDeltas(visits: DataFrame, deltas: DataFrame): DataFrame = {
    val d = deltas.groupBy("node").agg(sum($"d").as("dsum"))
    visits
      .join(d, Seq("node"), "full_outer")
      .select($"node", (coalesce($"count", lit(0L)) + coalesce($"dsum", lit(0L))).as("count"))
      .filter($"count" > 0)
  }

  /** One crawl round over in-memory state. None ⇒ frontier exhausted. */
  private def runRound(st: State, round: Long, extracted: DataFrame): Option[Trace] = {
    val t0 = System.currentTimeMillis()

    // ---- 1./2. pending + politeness-capped priority cut (J9 anti-join +
    // W3 window). Rank = exact incremental visits / totalVisits.
    val totalVisits0 = st.visits.agg(sum($"count")).as[Option[Long]].first().getOrElse(0L)
    val batchRows = phase(round, "schedule") {
      graft.frontier.Politeness
        .schedule(st.nodes, st.visits, totalVisits0, st.enqueued, st.fetched, params.batch, params.hostBudget)
        .collect()
    }
    if (batchRows.isEmpty) return None

    val batchUrls: Vector[String] = batchRows.map(_.getString(0)).toVector
    val batchIds: Map[String, Long] = batchRows.map(r => r.getString(0) -> r.getLong(1)).toMap

    // ---- 3. fetch versions of the batch (broadcast join, never a giant IN
    // list — those cost seconds of serial driver analysis per round)
    val batchDF = broadcast(spark.createDataset(batchUrls).toDF("url"))
    val verRows = phase(round, "fetch") {
      extracted
        .join(batchDF, Seq("url"))
        .select($"url", $"ver", $"outlinks", $"rejected", $"has_secret")
        .collect()
    }
    val versionsByUrl: Map[String, Vector[(Array[String], Boolean, Boolean)]] =
      verRows
        .groupBy(_.getString(0))
        .view
        .mapValues(
          _.sortBy(_.getInt(1))
            .map(r => (r.getSeq[String](2).toArray, r.getBoolean(3), r.getBoolean(4)))
            .toVector
        )
        .toMap

    val statusById: mutable.Map[Long, String] =
      mutable.Map(batchRows.map(r => r.getLong(1) -> r.getString(2)): _*)
    val urlIdCache = mutable.Map.empty[String, Long] ++ batchIds

    // per-round delta logs (all O(changes))
    val nodesAdded = mutable.ArrayBuffer.empty[NodeRow]
    val nodeUpdateParts = mutable.ArrayBuffer.empty[DataFrame] // (id, status, promotedRound?, demotedRound?)
    val touchedAuthors = mutable.LinkedHashSet.empty[Long] // authors whose adjacency changed
    val visitDeltaParts = mutable.ArrayBuffer.empty[DataFrame] // (node, d)
    // replay logs are NET-of-round: ids touched (replaced/removed/created)
    // plus the FINAL version of each touched id — a walk repaired twice in
    // one round, or repaired then demoted, must not resurrect stale rows.
    // Net is computed over an event log of the (small) changed sets, never
    // a pass over the full store: (seq, isAdd, walk).
    var walkEventSeq = 0
    val walkEventParts = mutable.ArrayBuffer.empty[DataFrame] // (seq, isAdd, walkId, start, path)
    var enqueuedAdd: Option[DataFrame] = None
    val tmpCaches = mutable.ArrayBuffer.empty[Dataset[_]]

    // ---- 4. waves of page versions
    var walksChanged = 0L
    var newEdgesCount = 0L
    var removedEdgesCount = 0L
    val maxWaves = versionsByUrl.values.map(_.length).foldLeft(0)(math.max)
    var wave = 0
    while (wave < maxWaves) {
      val waveItems: Vector[(Long, Array[String])] = batchUrls.flatMap { u =>
        versionsByUrl.get(u).flatMap(_.lift(wave)).flatMap { case (links, rejected, _) =>
          if (rejected) None else Some((batchIds(u), links))
        }
      }
      // resolve link urls → ids against the distributed nodes table
      val allLinks = waveItems.flatMap(_._2).distinct.filterNot(urlIdCache.contains)
      if (allLinks.nonEmpty) {
        spark
          .createDataset(allLinks)
          .toDF("url")
          .join(st.nodes, Seq("url"))
          .select($"url", $"id")
          .collect()
          .foreach(r => urlIdCache(r.getString(0)) = r.getLong(1))
      }
      // deterministic id assignment for unknown urls of ACTIVE authors
      // (sorted-url order, prevMax+1.. — SURVEY.md §1.3; unknowns of
      // inactive authors are dropped, engine.go:399-414)
      val unknown = waveItems
        .filter { case (id, _) => statusById.getOrElse(id, NodeStatus.Inactive) == NodeStatus.Active }
        .flatMap(_._2)
        .distinct
        .filterNot(urlIdCache.contains)
        .sorted
      val newNodeRows = unknown.map { u =>
        val id = st.nextId; st.nextId += 1
        urlIdCache(u) = id
        NodeRow(id, u, Extract.hostOf(u), NodeStatus.Inactive, round, -1L, -1L)
      }
      nodesAdded ++= newNodeRows
      if (newNodeRows.nonEmpty) st.nodes = st.nodes.union(spark.createDataset(newNodeRows).toDF)

      // per-author deltas (reference computeDelta, engine.go:372-425)
      val deltas = mutable.Map.empty[Long, DeltaRow]
      waveItems.foreach { case (author, links) =>
        val newFollows = links
          .flatMap(u => urlIdCache.get(u))
          .filterNot(_ == author)
          .distinct
          .sorted
        val old = st.adjacency.getOrElse(author, Array.empty[Long])
        val d = WalkAlgebra.newDelta(author, old, newFollows)
        if (d.remove.nonEmpty || d.add.nonEmpty) {
          st.adjacency(author) = newFollows
          deltas(author) = d
          removedEdgesCount += d.remove.length
          newEdgesCount += d.add.length
          touchedAuthors += author
        }
      }

      if (deltas.nonEmpty) {
        val authorsDF = broadcast(spark.createDataset(deltas.keySet.toSeq).toDF("aid"))
        val newEdgeRows = deltas.keysIterator.flatMap(a => st.adjacency(a).map(dst => EdgeRow(a, dst))).toSeq
        st.edges = st.edges
          .join(authorsDF, st.edges("src") === col("aid"), "left_anti")
          .union(spark.createDataset(newEdgeRows).toDF)

        // distributed walk repair: one narrow scan of the cached store,
        // emitting ONLY changed walks (plus old paths for visit deltas)
        val bDeltas: Broadcast[Map[Long, DeltaRow]] = spark.sparkContext.broadcast(deltas.toMap)
        val bAdj: Broadcast[Map[Long, Array[Long]]] = spark.sparkContext.broadcast(st.adjacency.toMap)
        val p = params
        val r = round
        val wv = wave
        val changed: Dataset[(WalkRow, Array[Long])] = st.walks
          .mapPartitions { it =>
            val adjF: WalkAlgebra.Adjacency = n => bAdj.value.getOrElse(n, Array.empty)
            it.flatMap { w =>
              WalkAlgebra
                .repairWalk(adjF, bDeltas.value, w.walkId, w.path, r, wv, p)
                .map(np => (WalkRow(w.walkId, w.start, np), w.path))
            }
          }
          .persist()
        tmpCaches += changed
        val nChanged = phase(round, s"repair-w$wave") { changed.count() }
        walksChanged += nChanged
        if (nChanged > 0) {
          val changedIds = changed.map(_._1.walkId).toDF("rwid").persist()
          tmpCaches += changedIds
          st.walks = st.walks
            .join(broadcast(changedIds), st.walks("walkId") === $"rwid", "left_anti")
            .as[WalkRow]
            .union(changed.map(_._1))
          walkEventSeq += 1
          walkEventParts += changed
            .map(_._1)
            .toDF
            .select(lit(walkEventSeq).as("seq"), lit(true).as("isAdd"), $"walkId", $"start", $"path")
          visitDeltaParts += changed
            .flatMap { case (nw, old) => old.map(n => (n, -1L)) ++ nw.path.map(n => (n, 1L)) }
            .toDF("node", "d")
        }
      }
      wave += 1
    }

    // ---- 5. leak scan over the batch (reference setLeak, arbiter.go:137-174)
    val leakedIds: Seq[Long] = batchUrls.flatMap { u =>
      if (versionsByUrl.getOrElse(u, Vector.empty).exists(_._3)) Some(batchIds(u)) else None
    }
    val leakedActive = leakedIds.filter(id => statusById.getOrElse(id, "") == NodeStatus.Active)
    if (leakedIds.nonEmpty) {
      leakedIds.foreach(id => statusById(id) = NodeStatus.Leaked)
      nodeUpdateParts += spark
        .createDataset(leakedIds)
        .toDF("id")
        .withColumn("status", lit(NodeStatus.Leaked))
        .withColumn("promotedRound", lit(null).cast("long"))
        .withColumn("demotedRound", lit(null).cast("long"))
      val leakedDF = broadcast(spark.createDataset(leakedIds).toDF("lid"))
      st.nodes = st.nodes
        .join(leakedDF, st.nodes("id") === col("lid"), "left")
        .withColumn("status", when(col("lid").isNotNull, NodeStatus.Leaked).otherwise($"status"))
        .drop("lid")
      if (leakedActive.nonEmpty) {
        val laDF = broadcast(spark.createDataset(leakedActive).toDF("lid"))
        val removed = st.walks.join(laDF, st.walks("start") === col("lid"), "left_semi").as[WalkRow].persist()
        tmpCaches += removed
        visitDeltaParts += removed.flatMap(w => w.path.map(n => (n, -1L))).toDF("node", "d")
        walkEventSeq += 1
        walkEventParts += removed.toDF
          .select(lit(walkEventSeq).as("seq"), lit(false).as("isAdd"), $"walkId", $"start", $"path")
        st.walks = st.walks.join(laDF, st.walks("start") === col("lid"), "left_anti").as[WalkRow]
        st.totalWalks -= params.walksPerNode.toLong * leakedActive.size
      }
    }

    // ---- 6. arbiter scan (reference arbiter.scan, arbiter.go:177-260).
    val totalWalks = st.totalWalks // exact arithmetic, post-leak
    val ratio = if (totalWalks == 0) 0.0 else walksChanged.toDouble / totalWalks
    var promotedCount = 0L
    var demotedCount = 0L
    val scanRan = ratio >= params.activation && totalWalks > 0

    // the scan needs post-repair ranks → apply wave+leak visit deltas now
    if (visitDeltaParts.nonEmpty) {
      val v = applyVisitDeltas(st.visits, visitDeltaParts.reduce(_ union _)).persist()
      tmpCaches += v
      st.visits = v
      visitDeltaParts.clear()
    }

    if (scanRan) {
      val tv = st.visits.agg(sum($"count")).as[Option[Long]].first().getOrElse(0L)
      if (tv > 0) {
        val baseRank = params.walksPerNode.toDouble / tv
        val promotionT = baseRank * params.promotion
        val demotionT = baseRank * params.demotion
        // one pass classifies every node (one job, not three)
        val rankedNodes = st.nodes
          .join(st.visits, $"id" === $"node", "left")
          .withColumn("nrank", coalesce($"count", lit(0L)).cast("double") / lit(tv.toDouble))
          .withColumn(
            "transition",
            when($"status" === NodeStatus.Active && $"nrank" < demotionT, "demote")
              .when(
                $"status" === NodeStatus.Inactive && $"nrank" >= promotionT &&
                  lit(round) - $"addedRound" >= params.promotionWait,
                "promote"
              )
              .otherwise("keep")
          )
          .persist()
        tmpCaches += rankedNodes
        val transitions = phase(round, "arbiter-classify") {
          rankedNodes.groupBy("transition").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        demotedCount = transitions.getOrElse("demote", 0L)
        promotedCount = transitions.getOrElse("promote", 0L)
        val demotedDF = rankedNodes.filter($"transition" === "demote").select($"id")
        val promotedDF = rankedNodes.filter($"transition" === "promote").select($"id", $"url")

        if (demotedCount > 0) {
          val removed = st.walks.join(demotedDF, st.walks("start") === demotedDF("id"), "left_semi").as[WalkRow].persist()
          tmpCaches += removed
          visitDeltaParts += removed.flatMap(w => w.path.map(n => (n, -1L))).toDF("node", "d")
          walkEventSeq += 1
          walkEventParts += removed.toDF
            .select(lit(walkEventSeq).as("seq"), lit(false).as("isAdd"), $"walkId", $"start", $"path")
          st.walks = st.walks.join(demotedDF, st.walks("start") === demotedDF("id"), "left_anti").as[WalkRow]
          st.totalWalks -= params.walksPerNode.toLong * demotedCount
          nodeUpdateParts += demotedDF
            .withColumn("status", lit(NodeStatus.Inactive))
            .withColumn("promotedRound", lit(null).cast("long"))
            .withColumn("demotedRound", lit(round))
        }
        if (promotedCount > 0) {
          val p = params
          val r = round
          val gw = GenWave
          val totalEdges = st.adjacency.valuesIterator.map(_.length.toLong).sum
          val newWalks =
            if (totalEdges > broadcastMaxEdges) {
              // scale path: one shuffle join per hop, no adjacency broadcast
              val adjDS = graft.walks.IterativeWalker.adjacencyTable(
                spark,
                st.edges.as[EdgeRow].map(e => (e.src, e.dst))
              )
              graft.walks.IterativeWalker.generate(spark, promotedDF.select($"id").as[Long], adjDS, r, gw, p)
            } else {
              val bAdj = spark.sparkContext.broadcast(st.adjacency.toMap)
              promotedDF.select($"id").as[Long].flatMap { id =>
                val adjF: WalkAlgebra.Adjacency = n => bAdj.value.getOrElse(n, Array.empty)
                (0 until p.walksPerNode).map { i =>
                  val wid = id * p.walksPerNode + i
                  WalkRow(wid, id, WalkAlgebra.generateWalk(adjF, id, wid, r, gw, p))
                }
              }
            }
          val newWalksP = newWalks.persist()
          tmpCaches += newWalksP
          st.walks = st.walks.union(newWalksP)
          st.totalWalks += params.walksPerNode.toLong * promotedCount
          walkEventSeq += 1
          walkEventParts += newWalksP.toDF
            .select(lit(walkEventSeq).as("seq"), lit(true).as("isAdd"), $"walkId", $"start", $"path")
          visitDeltaParts += newWalksP.flatMap(w => w.path.map(n => (n, 1L))).toDF("node", "d")
          st.enqueued = st.enqueued.union(promotedDF.select($"url")).dropDuplicates("url")
          enqueuedAdd = Some(promotedDF.select($"url"))
          nodeUpdateParts += promotedDF
            .select($"id")
            .withColumn("status", lit(NodeStatus.Active))
            .withColumn("promotedRound", lit(round))
            .withColumn("demotedRound", lit(null).cast("long"))
        }

        // status transitions on the nodes table
        st.nodes = st.nodes
          .join(demotedDF.withColumnRenamed("id", "did"), $"id" === $"did", "left")
          .join(promotedDF.select($"id".as("pid")), $"id" === $"pid", "left")
          .withColumn(
            "status",
            when($"did".isNotNull, NodeStatus.Inactive)
              .when($"pid".isNotNull, NodeStatus.Active)
              .otherwise($"status")
          )
          .withColumn("demotedRound", when($"did".isNotNull, lit(round)).otherwise($"demotedRound"))
          .withColumn("promotedRound", when($"pid".isNotNull, lit(round)).otherwise($"promotedRound"))
          .drop("did", "pid")
      }
    }

    // promote/demote visit deltas
    if (visitDeltaParts.nonEmpty) {
      st.visits = applyVisitDeltas(st.visits, visitDeltaParts.reduce(_ union _))
      visitDeltaParts.clear()
    }

    // ---- re-materialize in-memory state (one pass; no parquet rewrite of
    // the full store) and cut lineage. Partition-count creep from repeated
    // unions is coalesced back to the session default.
    val targetParts = spark.sparkContext.defaultParallelism * 2
    val oldWalks = st.walks
    st.walks = phase(round, "rematerialize") {
      val w = if (st.walks.rdd.getNumPartitions > 3 * targetParts) st.walks.coalesce(targetParts) else st.walks
      w.localCheckpoint(true)
    }
    oldWalks.unpersist()
    st.visits = st.visits.localCheckpoint(true)
    st.fetchedCount += batchUrls.size
    // small tables: per-round localCheckpoint keeps their plans shallow
    // (status updates add two joins per round — Catalyst replanning of deep
    // chains costs more than materializing these small tables)
    st.nodes = st.nodes.localCheckpoint(true)
    st.edges = st.edges.localCheckpoint(true)
    st.fetched = st.fetched.union(batchUrls.toDF("url")).localCheckpoint(true)
    st.enqueued = st.enqueued.localCheckpoint(true)

    // ---- per-round delta checkpoint (O(changes), not O(state))
    phase(round, "delta-write") {
      if (nodesAdded.nonEmpty) io.write(round, "nodes_added", spark.createDataset(nodesAdded.toSeq).toDF)
      if (nodeUpdateParts.nonEmpty) io.write(round, "nodes_updates", nodeUpdateParts.reduce(_ union _))
      if (touchedAuthors.nonEmpty) {
        io.write(round, "edges_removed_src", spark.createDataset(touchedAuthors.toSeq).toDF("src"))
        // FINAL adjacency of touched authors (net of all waves this round)
        val finalEdges = touchedAuthors.toSeq.flatMap(a => st.adjacency.getOrElse(a, Array.empty[Long]).map(dst => EdgeRow(a, dst)))
        if (finalEdges.nonEmpty) io.write(round, "edges_added", spark.createDataset(finalEdges).toDF)
      }
      if (walkEventParts.nonEmpty) {
        val events = walkEventParts.reduce(_ union _)
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"walkId").orderBy($"seq".desc)
        val last = events.withColumn("rn", row_number().over(w)).filter($"rn" === 1).persist()
        tmpCaches += last
        io.write(round, "walks_removed", last.select($"walkId"))
        io.write(round, "walks_added", last.filter($"isAdd").select($"walkId", $"start", $"path"))
      }
      io.write(round, "fetched_add", batchUrls.toDF("url"))
      enqueuedAdd.foreach(df => io.write(round, "enqueued_add", df))
      io.write(round, "visits", st.visits)
    }

    val wallMillis = System.currentTimeMillis() - t0
    val m = RoundMetrics(
      round = round,
      scheduled = batchUrls.size.toLong,
      fetched = versionsByUrl.size.toLong,
      newNodes = nodesAdded.size.toLong,
      newEdges = newEdgesCount,
      removedEdges = removedEdgesCount,
      walksChanged = walksChanged,
      totalWalks = totalWalks,
      promoted = promotedCount,
      demoted = demotedCount,
      seenSize = st.fetchedCount,
      pendingSize = st.enqueued.join(st.fetched, Seq("url"), "left_anti").count(),
      scanRan = scanRan,
      wallMillis = wallMillis
    )
    io.write(round, "metrics", spark.createDataset(Seq(m)).toDF)
    // per-partition lineage of the walk state (north_rule observability)
    io.write(
      round,
      "lineage",
      st.walks.groupBy(spark_partition_id().as("partition")).count().withColumn("round", lit(round))
    )
    io.commitRound(round)

    tmpCaches.foreach(_.unpersist())
    Some(Trace(round, batchUrls, walksChanged, promotedCount, demotedCount, scanRan, m))
  }
}
