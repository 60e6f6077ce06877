package graft.walks

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CrawlParams, WalkRow}

/** Join-based distributed walk generation — the scale path beyond broadcast
  * adjacency (SURVEY.md §7.4 item 3).
  *
  * The broadcast generator collects the crawled-subgraph adjacency to every
  * executor — fine while the fetched graph fits in memory, impossible at
  * 10^10-frontier scale. This walker instead keeps adjacency as a
  * distributed table and advances ALL in-flight walks one hop per
  * iteration with a single equi-join (walk.cur == adj.src), shuffling only
  * live walks. Expected iterations ≈ geometric tail of α (≈ 7 live hops on
  * average, tail drains by ~α^k); lineage is cut with localCheckpoint every
  * few steps.
  *
  * Because every draw is counter-based (WalkAlgebra.genContinues /
  * genNextIndex keyed by walkId/round/wave/step), this produces EXACTLY the
  * same walks as WalkAlgebra.generateWalk — asserted by IterativeWalkerSpec.
  */
object IterativeWalker {

  /** Adjacency/exploded-edge row count below which the hop join broadcasts
    * the graph side (guide §3.1) — fixture graphs and small crawl rounds
    * qualify; a production-scale graph never does.
    */
  private[graft] val BroadcastAdjMaxRows = 65536L

  case class St(
      walkId: Long,
      start: Long,
      path: Array[Long],
      cur: Long,
      step: Long,
      alive: Boolean
  )

  /** Adjacency table from an edges Dataset: (src, follows sorted asc) —
    * sorted order is part of the walk spec.
    */
  def adjacencyTable(spark: SparkSession, edges: Dataset[(Long, Long)]): Dataset[(Long, Array[Long])] = {
    import spark.implicits._
    edges.groupByKey(_._1).mapGroups((src, it) => (src, it.map(_._2).toArray.sorted))
  }

  /** Initial in-flight segments: `walksPerNode` per start node, walkIds
    * nodeId*walksPerNode+i as everywhere else. The flatMap multiplies each
    * input row by walksPerNode IN PLACE — a single-source call (the
    * distributed personalized rank's shape) would otherwise emit ALL
    * numWalks segments from one input row into ONE partition and push the
    * whole hop-1 map through one task, so the fan-out is immediately
    * repartitioned by walkId (tiny length-1 rows; one cheap exchange).
    * Residual hop-1 JOIN-key skew (every segment carries cur = source) is
    * AQE's skew-split domain; the partition spread here is pinned by
    * PersonalizedSpec's task-level assertion.
    */
  private[graft] def initialSegments(
      spark: SparkSession,
      starts: Dataset[Long],
      params: CrawlParams
  ): Dataset[St] = {
    import spark.implicits._
    val p = params
    starts
      .flatMap { node =>
        (0 until p.walksPerNode).iterator.map { i =>
          St(node * p.walksPerNode + i, node, Array(node), node, 0L, alive = true)
        }
      }
      .repartition(spark.sparkContext.defaultParallelism, col("walkId"))
  }

  /** Generate `walksPerNode` walks per start node. `starts` carries
    * (nodeId); walkIds are nodeId*walksPerNode+i as everywhere else.
    * Convenience form of [[generateReleasable]] that keeps the output cache
    * alive for the caller (ContextCleaner reclaims it when unreachable).
    */
  def generate(
      spark: SparkSession,
      starts: Dataset[Long],
      adjacency: Dataset[(Long, Array[Long])],
      round: Long,
      wave: Int,
      params: CrawlParams,
      checkpointEvery: Int = 8
  ): Dataset[WalkRow] =
    generateReleasable(spark, starts, adjacency, round, wave, params, checkpointEvery)._1

  /** [[generate]], returning the materialized walks PLUS the release handle
    * of their (single) cache — every intermediate drain cache was already
    * released inside. Long-lived callers (the round loop) release the
    * output deterministically once it is folded into their own state.
    */
  def generateReleasable(
      spark: SparkSession,
      starts: Dataset[Long],
      adjacency: Dataset[(Long, Array[Long])],
      round: Long,
      wave: Int,
      params: CrawlParams,
      checkpointEvery: Int = 8
  ): (Dataset[WalkRow], () => Unit) = {
    import spark.implicits._
    val p = params
    var state: Dataset[St] = initialSegments(spark, starts, p).persist()
    var stateRelease: () => Unit = { val s = state; () => { s.unpersist(); () } }

    var live = state.filter(_.alive).count()
    var iter = 0
    val liveCheckEvery = 4
    val doneParts = scala.collection.mutable.ArrayBuffer.empty[Dataset[St]]
    // release handles for every cache the drain takes — all deferred to the
    // final union (Dataset.unpersist cannot release local checkpoints,
    // CacheOps scaladoc), then released deterministically before returning
    val releases = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

    // the adjacency aggregation (edges → groupByKey → sort) is hop-invariant:
    // materialize it ONCE for the whole drain instead of re-running the
    // full-graph shuffle on every hop (IterativeRepair does the same). The
    // explicit repartition by the join key makes the CACHED partitioning
    // hash(src), which every per-hop equi-join reuses — without it each hop
    // re-exchanges the full adjacency (cached rows, but a full shuffle per
    // hop: the dominant per-hop cost at 10^10 edges)
    val adjDF = adjacency.toDF("src", "follows").repartition(col("src")).persist()
    // size-aware join strategy (guide §3.1: broadcast the side that fits):
    // when the crawled adjacency is small, broadcast it into every hop's
    // lookup join — the walk side then flows with NO exchange at all and
    // the broadcast build is shared across the hops of one probe action
    // (exchange reuse). Above the gate the hash-partitioned cache path is
    // unchanged — the 10^10-edge regime. Walks are identical either way
    // (join strategy, not join semantics).
    val adjRows = adjDF.count()
    val adjSide = if (adjRows <= BroadcastAdjMaxRows) broadcast(adjDF) else adjDF

    while (live > 0 && iter < params.maxWalkSteps) {
      val liveDS = state.filter(_.alive)
      // settled walks accumulate as LAZY filters over each hop's persisted
      // state — zero extra jobs per hop (the r5 shape eagerly checkpointed
      // each slice: one full job dispatch per hop just to copy settled rows
      // out; at fixture scale job latency dominated the drain). The cost is
      // that superseded state caches stay alive until the final union
      // materializes — bounded by Σ|state_k| ≈ total visits, the same order
      // as the drain's output, and MEMORY_AND_DISK spills past that.
      doneParts += state.filter(!_.alive)
      releases += stateRelease
      val stepped = liveDS
        .joinWith(adjSide, liveDS("cur") === adjSide("src"), "left_outer")
        .map { case (s, adjRow) =>
          // replicate WalkAlgebra.generateWalk's per-iteration decision tree
          if (!WalkAlgebra.genContinues(p, s.walkId, round, wave, s.step)) {
            s.copy(step = s.step + 1, alive = false)
          } else {
            val follows: Array[Long] =
              if (adjRow == null) Array.empty
              else adjRow.getAs[scala.collection.Seq[Long]]("follows").toArray
            if (follows.isEmpty) s.copy(step = s.step + 1, alive = false)
            else {
              val next = follows(WalkAlgebra.genNextIndex(p, s.walkId, round, wave, s.step, follows.length))
              if (s.path.contains(next)) s.copy(step = s.step + 1, alive = false)
              else St(s.walkId, s.start, s.path :+ next, next, s.step + 1, alive = true)
            }
          }
        }
      // lineage cut every checkpointEvery hops (plan depth stays bounded);
      // plain persist otherwise
      val (next, nextRelease) =
        if (iter % checkpointEvery == checkpointEvery - 1) graft.core.CacheOps.checkpointReleasable(stepped)
        else { val n = stepped.persist(); (n, () => { n.unpersist(); () }) }
      state = next
      stateRelease = nextRelease
      iter += 1
      // the live count is only the early-exit probe — every probe is a full
      // job dispatch, so probing every hop made the drain's cost the JOB
      // COUNT at fixture scale (r6 profiling: 73 sub-0.25 s jobs on the
      // 12-hop single-source rank). Probe every liveCheckEvery hops instead:
      // un-probed hops chain lazily and the next probe materializes them in
      // one submission. Walks are identical either way (counter-based draws;
      // extra hops past global death are empty-join no-ops).
      if (iter % liveCheckEvery == 0 || iter >= params.maxWalkSteps)
        live = next.filter(_.alive).count()
    }
    // every surviving slice is checkpointed or cache-materialized by the
    // per-iteration count, so the adjacency cache can be released here
    adjDF.unpersist()
    doneParts += state
    val (out, outRelease) = graft.core.CacheOps.checkpointReleasable(
      doneParts
        .reduce(_ union _)
        // the union carries one slice per drain iteration (tens of slices ×
        // shuffle partitions each) — coalesce so every downstream job over
        // the generated walks schedules O(cores) tasks, not O(hops × cores)
        .coalesce(spark.sparkContext.defaultParallelism)
        .map(s => WalkRow(s.walkId, s.start, s.path))
    )
    // the finished walks are materialized in ONE cache (the caller's,
    // released via the returned handle); every per-hop slice and superseded
    // state cache is released NOW, not at JVM GC's leisure
    releases.foreach(_())
    stateRelease()
    (out, outRelease)
  }

  /** Exploded-edge walk state: carries the CURRENT node's out-degree (so a
    * hop needs no degree lookup) and the RNG-drawn next-edge index the hop's
    * single join resolves. `nextIdx = -1` marks rows with no pending lookup.
    */
  case class StE(
      walkId: Long,
      start: Long,
      path: Array[Long],
      cur: Long,
      curDeg: Int,
      step: Long,
      alive: Boolean,
      nextIdx: Int
  )

  /** Mega-hub-safe walk generation over EXPLODED edges — byte-identical
    * output to [[generate]] (IterativeWalkerSpec asserts it), different join
    * shape for a different scale regime.
    *
    * [[generate]] joins each live walk against a (src, follows ARRAY) row:
    * the right shape when degrees are modest, but at a 10^8-degree mega-hub
    * every walk standing on the hub receives a COPY of the hub's whole
    * follow array through one shuffle key — O(walks_on_hub × degree)
    * replicated bytes on one reducer, the exact q43 single-source scenario.
    *
    * Here adjacency is (src, idx, dst, dstDeg) — one row per edge, idx =
    * dst's rank in src's sorted follow list — and the walk state carries
    * curDeg, so each hop is:
    *
    *   1. map: draw continue/stop and nextIdx = genNextIndex(curDeg)
    *      locally (no lookup — curDeg rode in on the previous hop);
    *   2. ONE inner-ish equi-join on the COMPOSITE key (cur, nextIdx):
    *      every live walk matches exactly one edge row, which also carries
    *      the destination's degree for the next hop.
    *
    * A mega-hub's walks therefore spread over min(walks, degree) distinct
    * (hub, idx) shuffle keys instead of one, and no follow array is ever
    * materialized or replicated. The cost is the exploded table (|E| skinny
    * rows — bucketable/cacheable hash(src, idx), reused every hop) and the
    * one-time dstDeg self-join at build. The crawl engine keeps the array
    * walker (avg web degree ~50 makes arrays cheaper); the distributed
    * personalized rank uses THIS path, where the source is a hub by
    * definition.
    */
  def generateExploded(
      spark: SparkSession,
      starts: Dataset[Long],
      adjacency: Dataset[(Long, Array[Long])],
      round: Long,
      wave: Int,
      params: CrawlParams,
      checkpointEvery: Int = 8
  ): Dataset[WalkRow] =
    generateExplodedReleasable(spark, starts, adjacency, round, wave, params, checkpointEvery)._1

  /** [[generateExploded]] with the output cache's release handle (see
    * [[generateReleasable]]).
    */
  def generateExplodedReleasable(
      spark: SparkSession,
      starts: Dataset[Long],
      adjacency: Dataset[(Long, Array[Long])],
      round: Long,
      wave: Int,
      params: CrawlParams,
      checkpointEvery: Int = 8
  ): (Dataset[WalkRow], () => Unit) = {
    import spark.implicits._
    val p = params
    // the adjacency aggregation feeds THREE build-time derivations (the
    // posexplode side, the dstDeg side of the edgesIdx join, startDegs) —
    // cache it for the build so the full-graph groupByKey runs once, and
    // release it before the drain (edgesIdx is the only table the hops use)
    val adjDF = adjacency.toDF("src", "follows").persist()
    val degrees = adjDF.select(col("src"), size(col("follows")).cast("int").as("deg"))
    // (src, idx, dst, dstDeg): posexplode of the SAME sorted array generate
    // walks over, so idx ranks agree even with duplicate edges; dstDeg is
    // resolved once at build (left_outer: a sink node has no degrees row)
    val edgesIdx = adjDF
      .select(col("src"), posexplode(col("follows")).as(Seq("idx", "dst")))
      .join(degrees.select(col("src").as("dst"), col("deg").as("dstDeg")), Seq("dst"), "left_outer")
      .select(
        col("src"),
        col("idx").cast("int").as("idx"),
        col("dst"),
        coalesce(col("dstDeg"), lit(0)).as("dstDeg")
      )
      // hash(src, idx) IS the per-hop join key: the cached partitioning is
      // reused by every hop's equi-join (same discipline as generate's
      // hash(src) adjacency cache)
      .repartition(col("src"), col("idx"))
      .persist()

    val startDegs = starts
      .toDF("node")
      .join(degrees.select(col("src").as("node"), col("deg")), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("deg"), lit(0)).as("deg"))
      .as[(Long, Int)]
    var state: Dataset[StE] = startDegs
      .flatMap { case (node, deg) =>
        (0 until p.walksPerNode).iterator.map { i =>
          StE(node * p.walksPerNode + i, node, Array(node), node, deg, 0L, alive = true, nextIdx = -1)
        }
      }
      // same single-source fan-out spread as initialSegments
      .repartition(spark.sparkContext.defaultParallelism, col("walkId"))
      .persist()

    var stateRelease: () => Unit = { val s = state; () => { s.unpersist(); () } }
    var live = state.filter(_.alive).count() // materializes state (and adjDF)
    val edgeRows = edgesIdx.count() // materialize from the adjDF cache before dropping it
    adjDF.unpersist()
    // size-aware hop-join strategy — see generateReleasable; the exploded
    // table is one skinny row per edge, so the gate is the same row bound
    val edgeSide = if (edgeRows <= BroadcastAdjMaxRows) broadcast(edgesIdx) else edgesIdx
    var iter = 0
    val liveCheckEvery = 4
    val doneParts = scala.collection.mutable.ArrayBuffer.empty[Dataset[StE]]
    val releases = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

    while (live > 0 && iter < params.maxWalkSteps) {
      // lazy settled slice over the persisted state — zero extra jobs per
      // hop; release deferred to the final union (see generateReleasable)
      doneParts += state.filter(!_.alive)
      releases += stateRelease
      // decide locally: stop draw and next-edge index need only curDeg
      val decided = state.filter(_.alive).map { s =>
        if (!WalkAlgebra.genContinues(p, s.walkId, round, wave, s.step)) {
          s.copy(step = s.step + 1, alive = false, nextIdx = -1)
        } else if (s.curDeg == 0) {
          s.copy(step = s.step + 1, alive = false, nextIdx = -1)
        } else {
          s.copy(nextIdx = WalkAlgebra.genNextIndex(p, s.walkId, round, wave, s.step, s.curDeg))
        }
      }
      // rows settled by the decide map carry nextIdx = -1 and match nothing
      // (idx >= 0), passing through the left join untouched; every live row
      // matches EXACTLY ONE edge (nextIdx < curDeg by construction)
      val stepped = decided
        .joinWith(
          edgeSide,
          decided("cur") === edgeSide("src") && decided("nextIdx") === edgeSide("idx"),
          "left_outer"
        )
        .map { case (s, e) =>
          if (!s.alive) s
          else {
            val dst = e.getAs[Long]("dst")
            if (s.path.contains(dst)) s.copy(step = s.step + 1, alive = false, nextIdx = -1)
            else StE(s.walkId, s.start, s.path :+ dst, dst, e.getAs[Int]("dstDeg"), s.step + 1, alive = true, nextIdx = -1)
          }
        }
      val (next, nextRelease) =
        if (iter % checkpointEvery == checkpointEvery - 1) graft.core.CacheOps.checkpointReleasable(stepped)
        else { val n = stepped.persist(); (n, () => { n.unpersist(); () }) }
      state = next
      stateRelease = nextRelease
      iter += 1
      // batched early-exit probe — see generateReleasable
      if (iter % liveCheckEvery == 0 || iter >= params.maxWalkSteps)
        live = next.filter(_.alive).count()
    }
    edgesIdx.unpersist()
    doneParts += state
    val (out, outRelease) = graft.core.CacheOps.checkpointReleasable(
      doneParts
        .reduce(_ union _)
        .coalesce(spark.sparkContext.defaultParallelism)
        .map(s => WalkRow(s.walkId, s.start, s.path))
    )
    releases.foreach(_())
    stateRelease()
    (out, outRelease)
  }
}
