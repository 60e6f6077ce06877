package graft.round

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.extract.Extract
import graft.walks.WalkAlgebra

/** The distributed crawl-and-rank engine: a deterministic round loop over
  * columnar state tables, mirroring graft.spec.SequentialSpec 1:1 (that
  * file documents the round contract; equivalence is asserted byte-for-byte
  * by CrawlEquivalenceSpec).
  *
  * Scale posture (SURVEY.md §7.4 item 6): per-round driver-side data is
  * O(batch) — the fetch batch (≤ params.batch rows, like the reference's
  * fetcher batch of 100, /root/reference/pkg/pipe/fetcher/fetcher.go:74-107)
  * and its outlink lists. Everything frontier-sized (nodes, edges, walks,
  * seen set, pending queue) stays distributed. The link-graph adjacency used
  * for walk generation/repair covers only *fetched* nodes, so it grows with
  * crawl progress, not corpus size; it is broadcast while small and the
  * iterative join-based walker (graft.walks.IterativeWalker) is the path
  * beyond broadcast scale.
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
    val w = Window.partitionBy("url").orderBy("warc_ts")
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
      * 10^10-frontier path); results are identical either way
      * (IterativeWalkerSpec + the forced-iterative equivalence test).
      */
    broadcastMaxEdges: Long = 10000000L
) {
  import spark.implicits._
  import CrawlEngine._

  private val GenWave = graft.spec.SequentialSpec.GenWave

  private def emptyNodes: Dataset[NodeRow] = spark.emptyDataset[NodeRow]

  /** Initialize round-0 state from the seed list (reference InitGraph,
    * /root/reference/pkg/pipe/pipe.go:50-71: add + promote + enqueue).
    */
  def init(seeds: Seq[String]): Unit = {
    val nodes = seeds.zipWithIndex.map { case (u, i) =>
      NodeRow(i.toLong, u, Extract.hostOf(u), NodeStatus.Active, 0L, 0L, -1L)
    }
    val nodesDS = spark.createDataset(nodes)
    val emptyAdj: WalkAlgebra.Adjacency = _ => Array.empty
    val p = params
    val walks = nodes.flatMap { n =>
      (0 until p.walksPerNode).map { i =>
        val wid = n.id * p.walksPerNode + i
        WalkRow(wid, n.id, WalkAlgebra.generateWalk(emptyAdj, n.id, wid, 0L, GenWave, p))
      }
    }
    io.write(0L, "nodes", nodesDS.toDF)
    io.write(0L, "edges", spark.emptyDataset[EdgeRow].toDF)
    io.write(0L, "walks", spark.createDataset(walks).toDF)
    io.write(0L, "fetched", Seq.empty[String].toDF("url"))
    io.write(0L, "enqueued", seeds.toDF("url"))
    io.commitRound(0L)
  }

  /** Run rounds [lastComplete+1 .. maxRounds] (resumable: picks up from the
    * last committed snapshot). Returns per-round traces.
    */
  def run(extracted: DataFrame, maxRounds: Int): Result = {
    val traces = Vector.newBuilder[Trace]
    var round = io.lastCompleteRound() + 1
    require(round >= 1, "call init() first")
    var done = false

    while (!done && round <= maxRounds) {
      runRound(round, extracted) match {
        case Some(t) => traces += t; round += 1
        case None => done = true
      }
    }
    Result(traces.result(), round - 1)
  }

  /** One crawl round. None ⇒ frontier exhausted (crawl complete). */
  private def runRound(round: Long, extracted: DataFrame): Option[Trace] = {
    val t0 = System.currentTimeMillis()
    val prev = round - 1
    val nodes0 = io.read(prev, "nodes").as[NodeRow].persist()
    val edges0 = io.read(prev, "edges").as[EdgeRow]
    val walks0 = io.read(prev, "walks").as[WalkRow].persist()
    val fetched0 = io.read(prev, "fetched").persist()
    val enqueued0 = io.read(prev, "enqueued")

    // ---- 1./2. pending + politeness-capped priority cut (J9 anti-join +
    // W3 window; both shuffle on url/host — bucketable by host-hash at scale).
    val pending = enqueued0.join(fetched0, Seq("url"), "left_anti")
    val totalVisits0 =
      walks0.agg(sum(size($"path"))).as[Option[Long]].first().getOrElse(0L)
    val visits0 = walks0.select(explode($"path").as("node")).groupBy("node").count()
    val ranked = pending
      .join(nodes0.toDF, Seq("url"))
      .join(visits0, $"id" === $"node", "left")
      .withColumn(
        "rank",
        if (totalVisits0 == 0L) lit(0.0) else coalesce($"count", lit(0L)).cast("double") / lit(totalVisits0.toDouble)
      )
      .select($"url", $"id", $"host", $"rank")
    val hw = Window.partitionBy($"host").orderBy($"rank".desc, $"url".asc)
    val batchRows = ranked
      .withColumn("hrn", row_number().over(hw))
      .filter($"hrn" <= params.hostBudget)
      .orderBy($"rank".desc, $"url".asc)
      .limit(params.batch)
      .select($"url", $"id")
      .collect()

    if (batchRows.isEmpty) {
      nodes0.unpersist(); walks0.unpersist(); fetched0.unpersist()
      return None
    }
    val batchUrls: Vector[String] = batchRows.map(_.getString(0)).toVector
    val batchIds: Map[String, Long] = batchRows.map(r => r.getString(0) -> r.getLong(1)).toMap

    // ---- 3. fetch: versions of the batch urls (pushdown filter on url).
    val verRows = extracted
      .filter($"url".isin(batchUrls: _*))
      .select($"url", $"ver", $"outlinks", $"rejected", $"has_secret")
      .collect()
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

    // driver-side small state for the waves
    var nextId = nodes0.agg(max($"id")).as[Option[Long]].first().getOrElse(-1L) + 1
    val statusById: mutable.Map[Long, String] =
      mutable.Map(nodes0.filter($"id".isin(batchIds.values.toSeq: _*)).collect().map(n => n.id -> n.status): _*)
    // adjacency of crawled-so-far graph (bounded by fetched nodes × outdeg)
    val adjacency: mutable.Map[Long, Array[Long]] = {
      val m = mutable.Map.empty[Long, Array[Long]]
      edges0
        .groupByKey(_.src)
        .mapGroups((src, it) => (src, it.map(_.dst).toArray.sorted))
        .collect()
        .foreach { case (s, a) => m(s) = a }
      m
    }
    val urlIdCache = mutable.Map.empty[String, Long] ++ batchIds

    var nodesDF = nodes0.toDF
    var edgesDF = edges0.toDF
    var walksDS = walks0
    val persisted = mutable.ArrayBuffer.empty[Dataset[_]]

    // ---- 4. waves
    var walksChanged = 0L
    var newNodesCount = 0L
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

      // resolve link urls → ids (join against the distributed nodes table)
      val allLinks = waveItems.flatMap(_._2).distinct.filterNot(urlIdCache.contains)
      if (allLinks.nonEmpty) {
        spark
          .createDataset(allLinks)
          .toDF("url")
          .join(nodesDF, Seq("url"))
          .select($"url", $"id")
          .collect()
          .foreach(r => urlIdCache(r.getString(0)) = r.getLong(1))
      }
      // deterministic id assignment for unknown urls of ACTIVE authors
      val unknown = waveItems
        .filter { case (id, _) => statusById.getOrElse(id, NodeStatus.Inactive) == NodeStatus.Active }
        .flatMap(_._2)
        .distinct
        .filterNot(urlIdCache.contains)
        .sorted
      val newNodeRows = unknown.map { u =>
        val id = nextId; nextId += 1
        urlIdCache(u) = id
        NodeRow(id, u, Extract.hostOf(u), NodeStatus.Inactive, round, -1L, -1L)
      }
      newNodesCount += newNodeRows.size
      if (newNodeRows.nonEmpty) nodesDF = nodesDF.union(spark.createDataset(newNodeRows).toDF)

      // deltas + edge merge
      val deltas = mutable.Map.empty[Long, DeltaRow]
      waveItems.foreach { case (author, links) =>
        val active = statusById.getOrElse(author, NodeStatus.Inactive) == NodeStatus.Active
        val newFollows = links
          .flatMap(u => urlIdCache.get(u)) // unknown urls of inactive authors drop out
          .filterNot(_ == author)
          .distinct
          .sorted
        val _ = active // unknowns already gated above; known links apply regardless
        val old = adjacency.getOrElse(author, Array.empty[Long])
        val d = WalkAlgebra.newDelta(author, old, newFollows)
        if (d.remove.nonEmpty || d.add.nonEmpty) {
          adjacency(author) = newFollows
          deltas(author) = d
          removedEdgesCount += d.remove.length
          newEdgesCount += d.add.length
        }
      }

      if (deltas.nonEmpty) {
        val authorIds = deltas.keySet.toSeq
        val newEdgeRows = deltas.keysIterator.flatMap(a => adjacency(a).map(dst => EdgeRow(a, dst))).toSeq
        edgesDF = edgesDF
          .filter(!$"src".isin(authorIds: _*))
          .union(spark.createDataset(newEdgeRows).toDF)

        // distributed walk repair against this wave's delta map
        val bDeltas: Broadcast[Map[Long, DeltaRow]] = spark.sparkContext.broadcast(deltas.toMap)
        val bAdj: Broadcast[Map[Long, Array[Long]]] = spark.sparkContext.broadcast(adjacency.toMap)
        val p = params
        val r = round
        val wv = wave
        val repaired = walksDS
          .map { w =>
            val adjF: WalkAlgebra.Adjacency = n => bAdj.value.getOrElse(n, Array.empty)
            WalkAlgebra.repairWalk(adjF, bDeltas.value, w.walkId, w.path, r, wv, p) match {
              case Some(np) => (WalkRow(w.walkId, w.start, np), true)
              case None => (w, false)
            }
          }
          .persist()
        persisted += repaired
        walksChanged += repaired.filter(_._2).count()
        walksDS = repaired.map(_._1)
      }
      wave += 1
    }

    // ---- 5. leak scan over the batch
    val leakedIds: Seq[Long] = batchUrls.flatMap { u =>
      if (versionsByUrl.getOrElse(u, Vector.empty).exists(_._3)) Some(batchIds(u)) else None
    }
    val leakedActive = leakedIds.filter(id => statusById.getOrElse(id, "") == NodeStatus.Active)
    if (leakedIds.nonEmpty) {
      nodesDF = nodesDF.withColumn(
        "status",
        when($"id".isin(leakedIds: _*) && $"status" =!= NodeStatus.Leaked, NodeStatus.Leaked)
          .otherwise($"status")
      )
      if (leakedActive.nonEmpty) walksDS = walksDS.filter(!$"start".isin(leakedActive: _*)).as[WalkRow]
      leakedIds.foreach(id => statusById(id) = NodeStatus.Leaked)
    }

    // ---- 6. arbiter scan (reference arbiter.scan, arbiter.go:177-260)
    val totalWalks = walksDS.count()
    val ratio = if (totalWalks == 0) 0.0 else walksChanged.toDouble / totalWalks
    var promotedCount = 0L
    var demotedCount = 0L
    val scanRan = ratio >= params.activation && totalWalks > 0
    var enqueuedDF = io.read(prev, "enqueued")

    if (scanRan) {
      val wPersist = walksDS.persist()
      persisted += wPersist
      walksDS = wPersist
      val tv = walksDS.agg(sum(size($"path"))).as[Option[Long]].first().getOrElse(0L)
      if (tv > 0) {
        val baseRank = params.walksPerNode.toDouble / tv
        val promotionT = baseRank * params.promotion
        val demotionT = baseRank * params.demotion
        val visits = walksDS.select(explode($"path").as("node")).groupBy("node").count()
        val rankedNodes = nodesDF
          .join(visits, $"id" === $"node", "left")
          .withColumn("nrank", coalesce($"count", lit(0L)).cast("double") / lit(tv.toDouble))
        val demotedDF = rankedNodes
          .filter($"status" === NodeStatus.Active && $"nrank" < demotionT)
          .select($"id")
          .persist()
        val promotedDF = rankedNodes
          .filter(
            $"status" === NodeStatus.Inactive && $"nrank" >= promotionT &&
              lit(round) - $"addedRound" >= params.promotionWait
          )
          .select($"id", $"url")
          .persist()
        persisted += demotedDF
        persisted += promotedDF
        demotedCount = demotedDF.count()
        promotedCount = promotedDF.count()

        if (demotedCount > 0) {
          walksDS = walksDS.join(demotedDF, walksDS("start") === demotedDF("id"), "left_anti").as[WalkRow]
        }
        if (promotedCount > 0) {
          val p = params
          val r = round
          val gw = GenWave
          val totalEdges = adjacency.valuesIterator.map(_.length.toLong).sum
          val newWalks =
            if (totalEdges > broadcastMaxEdges) {
              // scale path: one shuffle join per hop, no full-adjacency broadcast
              val adjDS = graft.walks.IterativeWalker.adjacencyTable(
                spark,
                edgesDF.as[EdgeRow].map(e => (e.src, e.dst))
              )
              graft.walks.IterativeWalker.generate(spark, promotedDF.select($"id").as[Long], adjDS, r, gw, p)
            } else {
              val bAdj = spark.sparkContext.broadcast(adjacency.toMap)
              promotedDF
                .select($"id")
                .as[Long]
                .flatMap { id =>
                  val adjF: WalkAlgebra.Adjacency = n => bAdj.value.getOrElse(n, Array.empty)
                  (0 until p.walksPerNode).map { i =>
                    val wid = id * p.walksPerNode + i
                    WalkRow(wid, id, WalkAlgebra.generateWalk(adjF, id, wid, r, gw, p))
                  }
                }
            }
          walksDS = walksDS.union(newWalks)
          enqueuedDF = enqueuedDF.union(promotedDF.select($"url")).dropDuplicates("url")
        }

        // status transitions
        nodesDF = nodesDF
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
          .drop("did", "pid", "node", "count", "nrank")
      }
    }

    // ---- persist the round snapshot (checkpoint = resumability + lineage cut)
    val fetchedNew = fetched0.union(batchUrls.toDF("url"))
    io.write(round, "nodes", nodesDF.select("id", "url", "host", "status", "addedRound", "promotedRound", "demotedRound"))
    io.write(round, "edges", edgesDF)
    io.write(round, "walks", walksDS.toDF)
    io.write(round, "fetched", fetchedNew)
    io.write(round, "enqueued", enqueuedDF)

    val wallMillis = System.currentTimeMillis() - t0
    val m = RoundMetrics(
      round = round,
      scheduled = batchUrls.size.toLong,
      fetched = versionsByUrl.size.toLong,
      newNodes = newNodesCount,
      newEdges = newEdgesCount,
      removedEdges = removedEdgesCount,
      walksChanged = walksChanged,
      totalWalks = totalWalks,
      promoted = promotedCount,
      demoted = demotedCount,
      seenSize = io.read(round, "fetched").count(),
      pendingSize = io.read(round, "enqueued").join(io.read(round, "fetched"), Seq("url"), "left_anti").count(),
      scanRan = scanRan,
      wallMillis = wallMillis
    )
    io.write(round, "metrics", spark.createDataset(Seq(m)).toDF)
    // per-partition lineage of the walk state (north_rule observability)
    io.write(
      round,
      "lineage",
      io.read(round, "walks").groupBy(spark_partition_id().as("partition")).count().withColumn("round", lit(round))
    )
    io.commitRound(round)

    persisted.foreach(_.unpersist())
    nodes0.unpersist(); walks0.unpersist(); fetched0.unpersist()

    Some(
      Trace(round, batchUrls, walksChanged, promotedCount, demotedCount, scanRan, m)
    )
  }
}
