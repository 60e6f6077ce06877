package graft.round

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.extract.Extract
import graft.walks.{SubgraphWalks, WalkAlgebra}

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
  *  - NO driver-held graph. The edges table is the only adjacency truth;
  *    per-wave deltas are computed with distributed joins, and walk
  *    repair/generation resolve the (tiny) sub-adjacency they actually
  *    visit on demand from the edges table (graft.walks.SubgraphWalks).
  *    Per-round driver-side data is O(batch + changes) — the fetch batch
  *    (like the reference's, /root/reference/pkg/pipe/fetcher/fetcher.go:
  *    74-107), the per-wave delta map, and the visited sub-adjacency —
  *    never O(crawled graph).
  *  - Visit counts (the rank numerator) are maintained INCREMENTALLY and
  *    exactly from the walk deltas — the reference keeps totalVisits and a
  *    visit index incrementally for the same reason
  *    (/root/reference/pkg/regraph/walks.go:236,263,306-317; optimization
  *    O2 in SURVEY.md §4). No per-round explode of the full walk store.
  *  - totalWalks is pure arithmetic: every active node owns exactly
  *    walksPerNode walks, so repairs don't change the count and
  *    promote/demote/leak shift it by ±walksPerNode each.
  *  - Walk repair emits ONLY changed walks (a narrow arrays_overlap scan of
  *    the cached store), merged back with a broadcast anti-join + union;
  *    the store is re-materialized once per round via an eager
  *    localCheckpoint — no per-round parquet rewrite of the full store.
  *  - A driver-side bloom filter over the seen set pre-filters the
  *    scheduling anti-join (exact fallback on positives — results are
  *    identical); it is maintained incrementally from each round's batch
  *    and rebuilt from the fetched table on resume.
  */
object CrawlEngine {

  /** One-time heavy scan of the pages table: html → outlinks + leak flags,
    * versions numbered per url in (warc_ts, md5(html)) order — the md5
    * tiebreaker keeps version numbering deterministic even if two versions
    * of a url share a timestamp. At 100 TB this is the only pass that
    * touches the `html` binary column (column pruning keeps every later
    * round on the light columns), so it runs ONCE up front and lands
    * columnar.
    */
  def extractPages(spark: SparkSession, pages: DataFrame): DataFrame = {
    Extract.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url")
      .orderBy(col("warc_ts"), md5(col("html")))
    pages
      .withColumn("outlinks", expr("extract_outlinks(html, url)"))
      .withColumn("rejected", expr(s"size(outlinks) > ${Extract.MaxOutlinks} OR length(html) > ${Extract.MaxContentBytes}"))
      .withColumn("secret_proofs", expr("transform(find_secrets(text), s -> md5(cast(s as binary)))"))
      .withColumn("suspect_proofs", expr("transform(find_suspects(text), s -> md5(cast(s as binary)))"))
      .withColumn("has_secret", size(col("secret_proofs")) > 0)
      .withColumn("ver", row_number().over(w))
      // vkey = the version-ordering key as one lexicographically sortable
      // string (zero-padded epoch micros + md5 tiebreaker). Streaming
      // incremental extraction persists the per-url max so out-of-order
      // arrivals are DETECTED instead of silently corrupting the
      // deterministic version numbering (ADVICE r2).
      .withColumn(
        "vkey",
        concat(lpad(unix_micros(col("warc_ts")).cast("string"), 20, "0"), lit(":"), md5(col("html")))
      )
      .select("url", "ver", "outlinks", "rejected", "has_secret", "secret_proofs", "suspect_proofs", "vkey")
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

object RoundDriver {

  /** Batches above this size skip the fetch InSet prefilter — a
    * multi-hundred-thousand-literal predicate costs more in planning than
    * the scan pruning saves (the broadcast join alone stays correct).
    * Production batches (the reference fetches 100-1000 urls per interval)
    * sit far below this.
    */
  val MaxFetchPrefilterUrls = 100000

  /** GRAFT_FETCH_PREFILTER=0 disables the fetch InSet prefilter (results
    * identical — the broadcast join alone restricts to the batch; the
    * prefilter only exists so the scan can prune).
    */
  def fetchPrefilterEnabled: Boolean = !sys.env.get("GRAFT_FETCH_PREFILTER").contains("0")
}

class RoundDriver(
    spark: SparkSession,
    io: TableIO,
    params: CrawlParams,
    /** Above this many total edges the promoted-node walk generation
      * switches from the resolver-broadcast path to the join-based
      * IterativeWalker (the 10^10-frontier path); results are identical
      * either way.
      */
    broadcastMaxEdges: Long = 10000000L,
    /** Full-snapshot cadence; rounds in between write delta logs only. */
    compactEvery: Int = 8,
    /** Write a full snapshot when run() exits (downstream readers expect
      * full tables at the last round; disable to exercise the crash-resume
      * replay path).
      */
    compactOnExit: Boolean = true,
    /** Above this many delta-list entries in one wave, walk repair switches
      * from the driver-resolver path (SubgraphWalks — cheapest for small
      * incremental waves) to the fully distributed join-per-hop
      * IterativeRepair (mandatory for mass-refresh waves, whose graft
      * neighborhoods would otherwise drag much of the graph through the
      * driver); results are identical either way.
      */
    iterativeRepairMinEntries: Long = 20000L,
    /** robots.txt disallow rules (host, path-prefix); urls matching a rule
      * for their host are never scheduled (north_rule robots gate).
      */
    robots: Option[DataFrame] = None,
    /** Above this many seen urls the driver-resident bloom (fast broadcast
      * probe, ~1.2 MB per 10^6 urls at fpp 0.01) is replaced by the
      * DISTRIBUTED sharded bloom table (graft.frontier.BloomShards) — zero
      * driver bloom bytes, probe via co-partitioned zip. The default gate
      * caps driver bloom memory at ~60 MB (5×10^7 urls) — bounded like the
      * reference's LRU seen cache; at a 10^10-url crawl the sharded table
      * carries the ~12 GB of bits on the executors. 0 forces the sharded
      * path from round 1 (the equivalence test uses this). Results are
      * identical on both paths.
      */
    maxDriverBloomUrls: Long = 50000000L,
    bloomNumShards: Int = graft.frontier.BloomShards.DefaultShards
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

  /** Mutable in-memory engine state (Datasets persisted across rounds).
    * Driver-side scalars only — no graph-sized driver structures.
    */
  private case class State(
      var nodes: DataFrame,
      var edges: DataFrame, // (src, dst) — the only adjacency truth
      var walks: Dataset[WalkRow],
      var fetched: DataFrame, // (url)
      var enqueued: DataFrame, // (url)
      var visits: DataFrame, // (node, count) — exact incremental
      var leaks: DataFrame, // (id, url, detectedRound, status, proofs)
      var nextId: Long,
      var totalWalks: Long,
      var totalEdges: Long,
      var fetchedCount: Long,
      var enqueuedCount: Long,
      /** driver-resident bloom (below the maxDriverBloomUrls gate) … */
      var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter],
      /** capacity the driver bloom was built for; it is rebuilt (doubled)
        * from `fetched` when the seen set outgrows it — otherwise a long
        * fresh crawl would drive fpp toward 1 and silently turn the
        * prefilter into a no-op (correctness holds via the exact anti-join,
        * the optimization would just vanish).
        */
      var bloomBuildCapacity: Long,
      /** … or the distributed sharded bloom table (above it). */
      var seenShards: Option[Dataset[graft.frontier.BloomShard]],
      /** per-shard capacity the current shards were built with; the table
        * is rebuilt (doubled) from `fetched` when the seen set outgrows it.
        */
      var bloomShardCapacity: Long
  ) {

    /** Release handle of each table's CURRENT local checkpoint, by key —
      * Dataset.unpersist cannot release local checkpoints (CacheOps
      * scaladoc); without these the superseded per-round checkpoints of
      * every state table linger until the JVM's ContextCleaner notices,
      * growing storage pressure linearly in rounds run.
      */
    val cpRelease: mutable.Map[String, () => Unit] = mutable.Map.empty
  }

  /** Eagerly re-checkpoint a state table and release the PREVIOUS round's
    * checkpoint under the same key (strictly after the new one is
    * materialized — the new value is computed from the old).
    */
  private def recp[T](st: State, key: String, ds: Dataset[T]): Dataset[T] = {
    val (cp, rel) = graft.core.CacheOps.checkpointReleasable(ds)
    st.cpRelease.get(key).foreach(_())
    st.cpRelease(key) = rel
    cp
  }

  private def paramsDF: DataFrame =
    Seq(
      (
        params.seed,
        params.alpha,
        params.walksPerNode,
        params.batch,
        params.hostBudget,
        params.promotion,
        params.demotion,
        params.activation,
        params.promotionWait,
        params.maxWalkSteps
      )
    ).toDF(
      "seed",
      "alpha",
      "walksPerNode",
      "batch",
      "hostBudget",
      "promotion",
      "demotion",
      "activation",
      "promotionWait",
      "maxWalkSteps"
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
    io.write(0L, "walk_params", paramsDF)
    io.write(0L, "nodes", spark.createDataset(nodes).toDF)
    io.write(0L, "edges", spark.emptyDataset[EdgeRow].toDF)
    io.write(0L, "walks", walksDF)
    io.write(0L, "fetched", Seq.empty[String].toDF("url"))
    io.write(0L, "enqueued", seeds.toDF("url"))
    io.write(0L, "visits", walksDF.select(explode($"path").as("node")).groupBy("node").count())
    io.write(0L, "leaks", spark.emptyDataset[LeakRecord].toDF)
    io.commitRound(0L)
  }

  /** Fail resume when the checkpoint was written with different walk
    * parameters — a silent mismatch would corrupt determinism (reference
    * analog: walks store header check,
    * /root/reference/pkg/regraph/walks.go:36-81).
    */
  private def checkWalkParams(): Unit = {
    if (!io.exists(0L, "walk_params")) return
    val stored = io.read(0L, "walk_params").collect().head
    val cur = paramsDF.collect().head
    require(
      stored == cur,
      s"walk_params mismatch: checkpoint was written with $stored, resume requested with $cur"
    )
  }

  /** Load state at `target`: latest full snapshot ≤ target + delta replay
    * (the crash-resume path; a run that exited cleanly compacted at target,
    * so replay is a no-op there).
    */
  private def loadState(target: Long): State = {
    checkWalkParams()
    val base = (target to 0L by -1L).find(r => io.exists(r, "walks")).getOrElse(0L)
    var nodes = io.read(base, "nodes")
    var edges = io.read(base, "edges")
    var walks = io.read(base, "walks")
    var fetched = io.read(base, "fetched")
    var enqueued = io.read(base, "enqueued")
    var leaks = if (io.exists(base, "leaks")) io.read(base, "leaks") else spark.emptyDataset[LeakRecord].toDF
    var visits = io.read(base, "visits")
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
      if (io.exists(r, "leaks_add")) leaks = leaks.union(io.read(r, "leaks_add"))
      if (io.exists(r, "visits_delta")) visits = applyVisitDeltas(visits, io.read(r, "visits_delta"))
      // legacy pre-delta-log dirs wrote the FULL visits table every round
      // (no visits_delta): adopt it verbatim — skipping it would silently
      // resume with visit counts stale back to the last compaction
      else if (io.exists(r, "visits")) visits = io.read(r, "visits")
    }
    val (nodesC, nodesR) = graft.core.CacheOps.checkpointReleasable(nodes)
    val (edgesC, edgesR) = graft.core.CacheOps.checkpointReleasable(edges)
    val (walksC, walksR) = graft.core.CacheOps.checkpointReleasable(walks.as[WalkRow])
    val (fetchedC, fetchedR) = graft.core.CacheOps.checkpointReleasable(fetched)
    val (enqueuedC, enqueuedR) = graft.core.CacheOps.checkpointReleasable(enqueued)
    val (leaksC, leaksR) = graft.core.CacheOps.checkpointReleasable(leaks)
    val (visitsC, visitsR) = graft.core.CacheOps.checkpointReleasable(visits)
    val nextId = nodesC.agg(max($"id")).as[Option[Long]].first().getOrElse(-1L) + 1
    val totalWalks = walksC.count()
    val totalEdges = edgesC.count()
    val fetchedCount = fetchedC.count()
    val enqueuedCount = enqueuedC.count()
    // distributed one-pass bloom rebuild over the seen set (resume only;
    // rounds maintain it incrementally from the batch). Below the gate: a
    // driver-resident filter of xxhash64(url) longs (broadcast probe).
    // Above it: the sharded bloom table — bits stay on the executors.
    var shardsR: Option[() => Unit] = None
    val (bloom, bloomCap, shards, shardCap) =
      if (maxDriverBloomUrls == 0 || fetchedCount * 2 > maxDriverBloomUrls) {
        val cap = math.max(fetchedCount * 2 / bloomNumShards, 100000L)
        val (sh, shR) = graft.core.CacheOps.checkpointReleasable(
          graft.frontier.BloomShards.build(spark, fetchedC, bloomNumShards, cap)
        )
        shardsR = Some(shR)
        (None, 0L, Some(sh), cap)
      } else if (fetchedCount == 0)
        (Some(org.apache.spark.util.sketch.BloomFilter.create(100000L, 0.01)), 100000L, None, 0L)
      else {
        val cap = math.max(fetchedCount * 2, 100000L)
        (
          Some(
            fetchedC
              .select(xxhash64($"url").as("h"))
              .stat
              .bloomFilter("h", cap, 0.01)
          ),
          cap,
          None,
          0L
        )
      }
    val st = State(
      nodesC,
      edgesC,
      walksC,
      fetchedC,
      enqueuedC,
      visitsC,
      leaksC,
      nextId,
      totalWalks,
      totalEdges,
      fetchedCount,
      enqueuedCount,
      bloom,
      bloomCap,
      shards,
      shardCap
    )
    st.cpRelease ++= Seq(
      "nodes" -> nodesR,
      "edges" -> edgesR,
      "walks" -> walksR,
      "fetched" -> fetchedR,
      "enqueued" -> enqueuedR,
      "leaks" -> leaksR,
      "visits" -> visitsR
    )
    shardsR.foreach(r => st.cpRelease("seenShards") = r)
    st
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
    io.write(round, "leaks", st.leaks)
    io.write(round, "visits", st.visits)
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

    // ---- 1./2. pending + politeness-capped priority cut (J9 anti-join,
    // bloom-prefiltered, robots-gated, W3 salted window). Rank = exact
    // incremental visits / totalVisits.
    val totalVisits0 = st.visits.agg(sum($"count")).as[Option[Long]].first().getOrElse(0L)
    val batchRows = phase(round, "schedule") {
      graft.frontier.Politeness
        .schedule(
          st.nodes,
          st.visits,
          totalVisits0,
          st.enqueued,
          st.fetched,
          params.batch,
          params.hostBudget,
          seenBloom = st.seenBloom,
          robots = robots,
          seenShards = st.seenShards.map(sh => (sh, bloomNumShards))
        )
        .collect()
    }
    if (batchRows.isEmpty) return None

    val batchUrls: Vector[String] = batchRows.map(_.getString(0)).toVector
    val batchIds: Map[String, Long] = batchRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val statusById: mutable.Map[Long, String] =
      mutable.Map(batchRows.map(r => r.getLong(1) -> r.getString(2)): _*)

    // ---- 3. fetch versions of the batch (broadcast join + an InSet
    // prefilter on url that is semantically a no-op — the join restricts to
    // the same set — but REACHES THE SCAN: against the bucketed extracted
    // store (url-bucketed, url-sorted) Spark prunes to the buckets holding
    // batch urls and parquet skips row groups outside their url ranges, so
    // per-round fetch IO is O(batch), not O(corpus) — the columnar analog
    // of the reference's point-lookup fetcher
    // (/root/reference/pkg/pipe/fetcher/fetcher.go:70-143). Outlinks STAY
    // DISTRIBUTED — only per-url version/leak summary rows (O(batch)) reach
    // the driver, like the reference's fetch batch.
    val batchDF = broadcast(
      spark.createDataset(batchRows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getString(2)))).toDF("url", "id", "status")
    )
    val prefiltered =
      if (RoundDriver.fetchPrefilterEnabled && batchUrls.size <= RoundDriver.MaxFetchPrefilterUrls)
        extracted.filter($"url".isInCollection(batchUrls))
      else extracted
    val batchExtracted = prefiltered
      .join(batchDF, Seq("url"))
      .select($"url", $"id", $"status", $"ver", $"outlinks", $"rejected", $"has_secret", $"secret_proofs", $"suspect_proofs")
      .persist()
    val verInfo = phase(round, "fetch") {
      batchExtracted
        .select($"url", $"id", $"ver", $"rejected", $"has_secret", size($"suspect_proofs") > 0)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    }

    // per-round delta logs (all O(changes))
    val nodesAddedParts = mutable.ArrayBuffer.empty[DataFrame]
    var newNodesCount = 0L
    val nodeUpdateParts = mutable.ArrayBuffer.empty[DataFrame] // (id, status, promotedRound?, demotedRound?)
    val touchedAuthors = mutable.LinkedHashSet.empty[Long] // authors whose adjacency changed
    val roundAdj = mutable.Map.empty[Long, Array[Long]] // FINAL adjacency of touched authors (O(changes))
    val visitDeltaParts = mutable.ArrayBuffer.empty[DataFrame] // (node, d)
    // every visit delta applied this round, kept for the O(changes) delta
    // log (the visits table itself is only written at compactions — a full
    // per-round rewrite would be O(crawled graph) IO, the same scale bug
    // as the round-3 fetch scan)
    val roundVisitDeltas = mutable.ArrayBuffer.empty[DataFrame]
    // replay logs are NET-of-round: ids touched (replaced/removed/created)
    // plus the FINAL version of each touched id — a walk repaired twice in
    // one round, or repaired then demoted, must not resurrect stale rows.
    // Net is computed over an event log of the (small) changed sets, never
    // a pass over the full store: (seq, isAdd, walk).
    var walkEventSeq = 0
    val walkEventParts = mutable.ArrayBuffer.empty[DataFrame] // (seq, isAdd, walkId, start, path)
    var enqueuedAdd: Option[DataFrame] = None
    val tmpCaches = mutable.ArrayBuffer.empty[Dataset[_]]
    // release handles for checkpoint-backed round-temporaries (walker
    // outputs) — unpersist can't release those, see core.CacheOps
    val tmpReleases = mutable.ArrayBuffer.empty[() => Unit]
    tmpCaches += batchExtracted

    // per-round on-demand adjacency cache over the distributed edges table
    // (reused across waves; delta authors are overwritten in place) —
    // driver memory O(nodes touched this round)
    val resolver = new SubgraphWalks.Resolver(spark, () => st.edges)

    // ---- 4. waves of page versions (wave w = (w+1)-th version per url)
    var walksChanged = 0L
    var newEdgesCount = 0L
    var removedEdgesCount = 0L
    var deltaEntries = 0L
    val maxWaves = verInfo.map(_._3).foldLeft(0)(math.max)
    require(
      maxWaves <= 14,
      s"$maxWaves page versions for one url exceed the 14-wave RNG key budget (wave 15 is reserved for generation)"
    )
    var wave = 0
    while (wave < maxWaves) {
      // authors owning a wave-th version, oversize-gated (O(batch), driver)
      val waveAuthors: Seq[Long] =
        verInfo.collect { case (_, id, v, rejected, _, _) if v == wave + 1 && !rejected => id }
      if (waveAuthors.nonEmpty) {
        // distributed link resolution: explode the wave's outlinks, resolve
        // url→id against the distributed nodes table
        val waveLinks = batchExtracted
          .filter($"ver" === wave + 1 && !$"rejected")
          .select($"id".as("author"), $"status", explode_outer($"outlinks").as("link"))
          .persist()
        tmpCaches += waveLinks

        // deterministic id assignment for unknown urls of ACTIVE authors
        // (sorted-url order, prevMax+1.. — SURVEY.md §1.3; unknowns of
        // inactive authors are dropped, engine.go:399-414). Sort +
        // zipWithIndex is fully distributed; the sorted rank is invariant
        // to partitioning.
        val known0 = st.nodes.select($"url".as("link"), $"id".as("lid"))
        val unknown = waveLinks
          .join(known0, Seq("link"), "left")
          .filter($"status" === NodeStatus.Active && $"lid".isNull && $"link".isNotNull)
          .select($"link")
          .distinct()
          .as[String]
        val base = st.nextId
        val rnd = round
        // unknown urls are bounded by the wave's links (O(batch × degree));
        // when they fit the driver (always, unless batches are huge) a
        // single limit-probed collect + driver sort assigns ids in one job;
        // the fully distributed sort+zipWithIndex is the fallback — both
        // produce the identical sorted-rank assignment.
        val maxDriverUnknown = 2000000
        val probe = phase(round, s"ids-w$wave") { unknown.limit(maxDriverUnknown + 1).collect() }
        val newNodesDF = (if (probe.length <= maxDriverUnknown) {
                            spark.createDataset(
                              probe.sorted.zipWithIndex.toSeq.map { case (u, i) =>
                                NodeRow(base + i, u, Extract.hostOf(u), NodeStatus.Inactive, rnd, -1L, -1L)
                              }
                            )
                          } else {
                            spark.createDataset(
                              unknown.rdd
                                .sortBy(identity)
                                .zipWithIndex()
                                .map { case (u, i) =>
                                  NodeRow(base + i, u, Extract.hostOf(u), NodeStatus.Inactive, rnd, -1L, -1L)
                                }
                            )
                          }).toDF.persist()
        tmpCaches += newNodesDF
        val nNew = if (probe.length <= maxDriverUnknown) probe.length.toLong else newNodesDF.count()
        if (nNew > 0) {
          st.nextId += nNew
          newNodesCount += nNew
          nodesAddedParts += newNodesDF
          st.nodes = st.nodes.union(newNodesDF)
        }

        // per-author deltas (reference computeDelta, engine.go:372-425):
        // old follows via the resolver (one broadcast semi-join against the
        // distributed edges table, cached across waves), new follows from
        // the distributed link resolution; only the O(batch × degree) delta
        // rows are collected (they are broadcast to walk repair anyway).
        val newAdjRows = phase(round, s"delta-w$wave") {
          waveLinks
            .join(st.nodes.select($"url".as("link"), $"id".as("lid")), Seq("link"), "left")
            .filter($"lid".isNotNull && $"lid" =!= $"author")
            .groupBy($"author")
            .agg(sort_array(collect_set($"lid")).as("newList"))
            .collect()
        }
        val newAdjMap: Map[Long, Array[Long]] =
          newAdjRows.map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
        val oldLists = resolver.lists(waveAuthors)
        val deltas: Map[Long, DeltaRow] = waveAuthors.iterator.flatMap { author =>
          val d = WalkAlgebra.newDelta(
            author,
            oldLists(author),
            newAdjMap.getOrElse(author, Array.empty[Long])
          )
          if (d.remove.nonEmpty || d.add.nonEmpty) Some(author -> d) else None
        }.toMap

        if (deltas.nonEmpty) {
          deltas.foreach { case (a, d) =>
            val newSorted = (d.keep ++ d.add).sorted
            roundAdj(a) = newSorted
            resolver.update(a, newSorted) // cache stays exact post-update
            touchedAuthors += a
            removedEdgesCount += d.remove.length
            newEdgesCount += d.add.length
            deltaEntries += d.remove.length + d.keep.length + d.add.length
            st.totalEdges += d.add.length - d.remove.length
          }
          val touchedDF = broadcast(spark.createDataset(deltas.keySet.toSeq).toDF("aid"))
          val newEdgeRows = deltas.valuesIterator.flatMap(d => d.newList.map(dst => EdgeRow(d.node, dst))).toSeq
          st.edges = st.edges
            .join(touchedDF, st.edges("src") === col("aid"), "left_anti")
            .union(spark.createDataset(newEdgeRows).toDF)

          // distributed walk repair against the wave's deltas (the reference
          // updates the graph before repairing, engine.go:346-369): small
          // waves resolve adjacency on demand from the updated edges table;
          // big waves run the fully distributed join-per-hop repair
          val waveEntries = deltas.valuesIterator.map(d => (d.remove.length + d.keep.length + d.add.length).toLong).sum
          val (changed, nChanged) = phase(round, s"repair-w$wave") {
            if (waveEntries > iterativeRepairMinEntries) {
              val adjDS = graft.walks.IterativeWalker.adjacencyTable(
                spark,
                st.edges.as[EdgeRow].map(e => (e.src, e.dst))
              )
              graft.walks.IterativeRepair.repairAll(spark, st.walks, adjDS, resolver, deltas, round, wave, params)
            } else SubgraphWalks.repairAll(spark, st.walks, resolver, deltas, round, wave, params)
          }
          tmpCaches += changed
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
      }
      wave += 1
    }

    // ---- 5. leak scan over the batch (reference setLeak, arbiter.go:137-174
    // + leak records, /root/reference/pkg/leaks/leaks.go:146-151: confirmed
    // = validated secret, suspected = pattern match failing the checksum)
    // one pass; LinkedHashSet keeps first-seen order (== the old
    // distinct-preserving order) with O(1) membership
    val leakedSet = mutable.LinkedHashSet.empty[Long]
    val suspectedSet = mutable.LinkedHashSet.empty[Long]
    verInfo.foreach { v =>
      if (v._5) leakedSet += v._2
      else if (v._6) suspectedSet += v._2
    }
    val leakedIds: Seq[Long] = leakedSet.toSeq
    val suspectedIds: Seq[Long] = suspectedSet.filterNot(leakedSet.contains).toSeq
    val leakedActive = leakedIds.filter(id => statusById.getOrElse(id, "") == NodeStatus.Active)
    val leakRecordParts = mutable.ArrayBuffer.empty[DataFrame]
    if (leakedIds.nonEmpty || suspectedIds.nonEmpty) {
      val recIds = leakedIds.map((_, LeakStatus.Confirmed)) ++ suspectedIds.map((_, LeakStatus.Suspected))
      val recDF = spark.createDataset(recIds).toDF("rid", "rstatus")
      val proofs = batchExtracted
        .select(
          $"id".as("rid"),
          explode(concat($"secret_proofs", $"suspect_proofs")).as("proof")
        )
        .groupBy($"rid")
        .agg(sort_array(collect_set($"proof")).as("proofs"))
      val newRecs = recDF
        .join(st.leaks.select($"id".as("rid"), lit(1).as("already")), Seq("rid"), "left")
        .filter($"already".isNull || $"rstatus" === LeakStatus.Confirmed)
        .join(st.leaks.filter($"status" === LeakStatus.Confirmed).select($"id".as("rid"), lit(1).as("conf")), Seq("rid"), "left")
        .filter($"conf".isNull)
        .join(st.nodes.select($"id".as("rid"), $"url"), Seq("rid"))
        .join(proofs, Seq("rid"), "left")
        .select(
          $"rid".as("id"),
          $"url",
          lit(round).as("detectedRound"),
          $"rstatus".as("status"),
          coalesce($"proofs", typedLit(Array.empty[String])).as("proofs")
        )
        .persist()
      tmpCaches += newRecs
      if (newRecs.count() > 0) {
        leakRecordParts += newRecs
        st.leaks = st.leaks.union(newRecs)
      }
    }
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
        // EAGER checkpoint, not a lazy persist: `removed` is consumed (visit
        // deltas, walk-event log) only after the rematerialize step below
        // releases the walks checkpoint it reads from — a lazy cache would
        // recompute from a released local checkpoint (no lineage) and crash
        val (removed, relRemoved) = graft.core.CacheOps.checkpointReleasable(
          st.walks.join(laDF, st.walks("start") === col("lid"), "left_semi").as[WalkRow]
        )
        tmpReleases += relRemoved
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
      roundVisitDeltas ++= visitDeltaParts
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
          // eager checkpoint for the same reason as the leak path above
          val (removed, relRemoved) = graft.core.CacheOps.checkpointReleasable(
            st.walks.join(demotedDF, st.walks("start") === demotedDF("id"), "left_semi").as[WalkRow]
          )
          tmpReleases += relRemoved
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
          val (newWalks, newWalksRelease) =
            if (st.totalEdges > broadcastMaxEdges) {
              // scale path: one shuffle join per hop, no driver sub-adjacency.
              // The walker returns its output already materialized in one
              // cache with a release handle — re-persisting it here would
              // just double the copy
              val adjDS = graft.walks.IterativeWalker.adjacencyTable(
                spark,
                st.edges.as[EdgeRow].map(e => (e.src, e.dst))
              )
              graft.walks.IterativeWalker
                .generateReleasable(spark, promotedDF.select($"id").as[Long], adjDS, r, gw, p)
            } else {
              // bounded path: resolve only the neighborhood the walks visit
              val promotedIds = promotedDF.select($"id").as[Long].collect().sorted.toSeq
              val g = SubgraphWalks.generateAll(spark, promotedIds, resolver, r, gw, p)
              (g, () => { g.unpersist(); () })
            }
          tmpReleases += newWalksRelease
          st.walks = st.walks.union(newWalks)
          st.totalWalks += params.walksPerNode.toLong * promotedCount
          walkEventSeq += 1
          walkEventParts += newWalks.toDF
            .select(lit(walkEventSeq).as("seq"), lit(true).as("isAdd"), $"walkId", $"start", $"path")
          visitDeltaParts += newWalks.flatMap(w => w.path.map(n => (n, 1L))).toDF("node", "d")
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
      roundVisitDeltas ++= visitDeltaParts
      visitDeltaParts.clear()
    }

    // ---- re-materialize in-memory state (one pass; no parquet rewrite of
    // the full store) and cut lineage. Partition-count creep from repeated
    // unions is coalesced back to the session default.
    val targetParts = spark.sparkContext.defaultParallelism * 2
    val oldWalks = st.walks
    st.walks = phase(round, "rematerialize") {
      val w = if (st.walks.rdd.getNumPartitions > 3 * targetParts) st.walks.coalesce(targetParts) else st.walks
      recp(st, "walks", w)
    }
    oldWalks.unpersist()
    st.visits = recp(st, "visits", st.visits)
    st.fetchedCount += batchUrls.size
    // small tables: per-round localCheckpoint keeps their plans shallow
    // (status updates add two joins per round — Catalyst replanning of deep
    // chains costs more than materializing these small tables)
    st.nodes = recp(st, "nodes", st.nodes)
    st.edges = recp(st, "edges", st.edges)
    st.fetched = recp(st, "fetched", st.fetched.union(batchUrls.toDF("url")))
    // incremental seen-bloom upkeep, size-gated: driver filter while small,
    // the distributed sharded table beyond maxDriverBloomUrls (rebuilt
    // doubled from the fetched table when the seen set outgrows it)
    st.seenBloom match {
      case Some(bf) if st.fetchedCount * 2 <= maxDriverBloomUrls =>
        if (st.fetchedCount > st.bloomBuildCapacity) {
          // the seen set outgrew the filter's build capacity (fpp would
          // drift toward 1, degrading the prefilter to a no-op): rebuild
          // doubled from the fetched table, mirroring the sharded path's
          // overflow rebuild
          val cap = math.max(st.fetchedCount * 2, 100000L)
          st.seenBloom = Some(
            st.fetched.select(xxhash64($"url").as("h")).stat.bloomFilter("h", cap, 0.01)
          )
          st.bloomBuildCapacity = cap
        } else batchUrls.foreach(u => bf.putLong(Rng.sparkXxhash64String(u)))
      case Some(_) => // seen set crossed the gate: move the bits off the driver
        val cap = math.max(st.fetchedCount * 2 / bloomNumShards, 100000L)
        st.seenShards = Some(
          recp(st, "seenShards", graft.frontier.BloomShards.build(spark, st.fetched, bloomNumShards, cap))
        )
        st.bloomShardCapacity = cap
        st.seenBloom = None
      case None =>
        val overflow = st.fetchedCount > st.bloomShardCapacity * bloomNumShards
        if (overflow) {
          val cap = math.max(st.fetchedCount * 2 / bloomNumShards, 100000L)
          st.seenShards = Some(
            recp(st, "seenShards", graft.frontier.BloomShards.build(spark, st.fetched, bloomNumShards, cap))
          )
          st.bloomShardCapacity = cap
        } else {
          st.seenShards = Some(
            recp(
              st,
              "seenShards",
              graft.frontier.BloomShards
                .merge(spark, st.seenShards.get, batchUrls.toDF("url"), bloomNumShards, st.bloomShardCapacity)
            )
          )
        }
    }
    st.enqueued = recp(st, "enqueued", st.enqueued)
    st.leaks = recp(st, "leaks", st.leaks)
    if (promotedCount > 0) st.enqueuedCount = st.enqueued.count()

    // ---- per-round delta checkpoint (O(changes), not O(state))
    phase(round, "delta-write") {
      if (nodesAddedParts.nonEmpty) io.write(round, "nodes_added", nodesAddedParts.reduce(_ union _))
      if (nodeUpdateParts.nonEmpty) io.write(round, "nodes_updates", nodeUpdateParts.reduce(_ union _))
      if (touchedAuthors.nonEmpty) {
        io.write(round, "edges_removed_src", spark.createDataset(touchedAuthors.toSeq).toDF("src"))
        // FINAL adjacency of touched authors (net of all waves this round)
        val finalEdges = touchedAuthors.toSeq.flatMap(a => roundAdj.getOrElse(a, Array.empty[Long]).map(dst => EdgeRow(a, dst)))
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
      if (leakRecordParts.nonEmpty) io.write(round, "leaks_add", leakRecordParts.reduce(_ union _))
      io.write(round, "fetched_add", batchUrls.toDF("url"))
      enqueuedAdd.foreach(df => io.write(round, "enqueued_add", df))
      // visit-count DELTA log (net per node, zeros dropped) — O(changes);
      // the full visits table lands only at compactions, like every other
      // state table
      if (roundVisitDeltas.nonEmpty)
        io.write(
          round,
          "visits_delta",
          roundVisitDeltas.reduce(_ union _).groupBy("node").agg(sum($"d").as("d")).filter($"d" =!= 0)
        )
    }

    val wallMillis = System.currentTimeMillis() - t0
    val m = RoundMetrics(
      round = round,
      scheduled = batchUrls.size.toLong,
      fetched = verInfo.map(_._1).distinct.length.toLong,
      newNodes = newNodesCount,
      newEdges = newEdgesCount,
      removedEdges = removedEdgesCount,
      walksChanged = walksChanged,
      totalWalks = totalWalks,
      promoted = promotedCount,
      demoted = demotedCount,
      seenSize = st.fetchedCount,
      // pure arithmetic: fetched ⊆ enqueued (batches are cut from pending)
      pendingSize = st.enqueuedCount - st.fetchedCount,
      scanRan = scanRan,
      wallMillis = wallMillis,
      driverResolvedNodes = resolver.size.toLong,
      driverDeltaEntries = deltaEntries
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
    tmpReleases.foreach(_())
    Some(Trace(round, batchUrls, walksChanged, promotedCount, demotedCount, scanRan, m))
  }
}
