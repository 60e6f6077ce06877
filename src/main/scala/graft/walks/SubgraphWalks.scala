package graft.walks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CrawlParams, DeltaRow, WalkRow}

/** Walk repair / generation against a DISTRIBUTED adjacency (the edges
  * table), with on-demand sub-adjacency resolution.
  *
  * The round loop must never hold the crawled graph on the driver (at a
  * 10^10-URL frontier the crawled subgraph is billions of edges). But walk
  * repair (WalkAlgebra.repairWalk) and generation need random access to the
  * follow lists of whichever nodes a segment happens to visit — an
  * unpredictable, *tiny* subset: O(changed walks × segment length) per wave,
  * independent of graph size.
  *
  * So adjacency is resolved lazily: attempts run with a bounded broadcast
  * map of the follow lists resolved so far; a walk that reaches an
  * unresolved node aborts (recording the miss), the missed nodes' rows are
  * fetched from the distributed edges table with one broadcast semi-join
  * (plus one speculative hop of expansion), and ONLY the aborted walks
  * retry. Every RNG draw is counter-based (graft.core.Rng), so a retried
  * walk re-makes exactly the same draws — results are byte-identical to a
  * full-adjacency run, which CrawlEquivalenceSpec asserts against the
  * sequential spec.
  *
  * Driver memory is O(nodes actually visited this wave); per-attempt the
  * map is broadcast once. Beyond `RoundDriver.broadcastMaxEdges` the
  * promotion path switches to IterativeWalker (join-per-hop, no driver
  * map at all); repair pools stay bounded by the per-wave delta set.
  *
  * Reference semantics: the Go engine repairs walks one event at a time
  * against its in-memory graph (/root/reference/pkg/pipe/engine/engine.go:
  * 372-425); this module is its batch analog with the graph kept columnar.
  */
object SubgraphWalks {

  /** Control-flow signal: a walk reached a node whose follow list is not in
    * the broadcast map yet. Cheap (no stack trace).
    */
  final class Unresolved(val node: Long) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Driver-side cache of resolved follow lists, backed by the distributed
    * edges table (`edges` is a thunk so the cache survives in-round edge
    * replacements — entries for replaced authors are overwritten in place
    * via [[Resolver.update]], everything else stays valid because the round
    * loop only ever rewrites touched authors' lists). An explicit empty
    * array means "known dangling". Scope a Resolver to ONE round: its
    * memory is O(nodes touched that round), never O(crawled graph).
    */
  final class Resolver(spark: SparkSession, edges: () => DataFrame) {
    private val known = mutable.Map.empty[Long, Array[Long]]

    def snapshot: Map[Long, Array[Long]] = known.toMap
    def size: Int = known.size

    /** Overwrite a follow list whose new value is already known on the
      * driver (the wave's delta authors) — no refetch.
      */
    def update(node: Long, list: Array[Long]): Unit = known(node) = list

    /** Resolved lists for `ids`, fetching what is missing. */
    def lists(ids: Seq[Long]): Map[Long, Array[Long]] = {
      resolve(ids, expandHops = 0)
      ids.iterator.map(i => i -> known(i)).toMap
    }

    /** One follow list, fetched on demand (driver-side sequential use —
      * e.g. the personalized-rank splice loop).
      */
    def list(n: Long): Array[Long] = {
      if (!known.contains(n)) resolve(Seq(n), expandHops = 1)
      known(n)
    }

    /** Caps on speculative BFS expansion per resolve call — at web scale an
      * uncapped multi-hop expansion from a mega-hub would fetch the world.
      * `maxExpandFetch` bounds the id fan-out; `maxExpandRows` bounds the
      * (src, dst) rows actually collected in a speculative hop — one hop
      * over up to 10^6 high-degree hubs could otherwise still drag an
      * unbounded edge set to the driver. Hop 0 (the ids the caller's walks
      * genuinely reached) is mandatory and caller-bounded; only the
      * speculative hops are abandoned, and the miss-retry loop covers
      * whatever they would have prefetched.
      */
    val maxExpandFetch = 1000000
    val maxExpandRows = 5000000

    /** Fetch follow lists for `ids` (one broadcast semi-join against the
      * edges table per hop), expanding up to `expandHops` speculative hops
      * into their targets so short segments resolve in one attempt.
      */
    def resolve(ids: Iterable[Long], expandHops: Int = 1): Unit = {
      import spark.implicits._
      var need: Array[Long] = ids.toArray.distinct.filterNot(known.contains)
      var hop = 0
      var overBudget = false
      while (need.nonEmpty && hop <= expandHops && !overBudget && (hop == 0 || need.length <= maxExpandFetch)) {
        val idsDF = broadcast(spark.createDataset(need.toSeq).toDF("nid"))
        val joined = edges()
          .join(idsDF, col("src") === col("nid"))
          .select(col("src"), col("dst"))
          .as[(Long, Long)]
        // speculative hops probe with a row limit; over budget ⇒ store
        // NOTHING from this hop (a partial follow list would be wrong) and
        // stop expanding
        val rows: Array[(Long, Long)] =
          if (hop == 0) joined.collect()
          else {
            val limited = joined.limit(maxExpandRows + 1).collect()
            if (limited.length > maxExpandRows) { overBudget = true; Array.empty }
            else limited
          }
        if (!overBudget) {
          val bySrc = rows.groupBy(_._1)
          val next = mutable.ArrayBuffer.empty[Long]
          need.foreach { id =>
            val fl = bySrc.get(id).map(_.map(_._2).sorted).getOrElse(Array.empty[Long])
            known(id) = fl
            next ++= fl
          }
          need = next.distinct.filterNot(known.contains).toArray
        }
        hop += 1
      }
    }
  }

  case class RepairOut(walkId: Long, start: Long, oldPath: Array[Long], newPath: Array[Long], miss: Long)
  case class GenOut(walkId: Long, start: Long, path: Array[Long], miss: Long)

  /** Repair every walk that visits a delta node, against distributed
    * adjacency. Returns (changed walks with old paths, count), with the
    * result persisted and all intermediates released. Results are identical
    * to repairing with the full adjacency map.
    */
  def repairAll(
      spark: SparkSession,
      walks: Dataset[WalkRow],
      resolver: Resolver,
      deltas: Map[Long, DeltaRow],
      round: Long,
      wave: Int,
      params: CrawlParams
  ): (Dataset[(WalkRow, Array[Long])], Long) = {
    import spark.implicits._
    val bDeltas = spark.sparkContext.broadcast(deltas)
    // Seed with every delta's graft pools (Added ∪ Kept) + one hop: most
    // segments are short (expected length 1/(1-α)), so most walks repair
    // on the first attempt.
    resolver.resolve(deltas.valuesIterator.flatMap(d => d.add.iterator ++ d.keep.iterator).toSeq)

    // Only a walk visiting a delta node can change: repairWalk triggers at
    // delta positions only, and grafted tails are rescanned inside the same
    // call. Prefilter via the broadcast delta map — O(|path|) hash probes
    // per walk. (An arrays_overlap against a literal delta-node array
    // rebuilds its hash set PER ROW: O(|walks|·|deltas|), measured 50-130s
    // per wave at a 25k-author batch.)
    var todo: Dataset[WalkRow] =
      walks.filter(w => { val m = bDeltas.value; w.path.exists(m.contains) })
    val changedParts = mutable.ArrayBuffer.empty[Dataset[(WalkRow, Array[Long])]]
    val caches = mutable.ArrayBuffer.empty[Dataset[_]]
    var drained = false
    var attempt = 0
    while (!drained) {
      val bAdj = spark.sparkContext.broadcast(resolver.snapshot)
      val (p, r, wv) = (params, round, wave)
      val out: Dataset[RepairOut] = todo
        .mapPartitions { it =>
          val adjF: WalkAlgebra.Adjacency =
            n => bAdj.value.getOrElse(n, throw new Unresolved(n))
          it.map { w =>
            try {
              WalkAlgebra.repairWalk(adjF, bDeltas.value, w.walkId, w.path, r, wv, p) match {
                case Some(np) => RepairOut(w.walkId, w.start, w.path, np, -1L)
                case None => RepairOut(w.walkId, w.start, w.path, null, -1L)
              }
            } catch { case u: Unresolved => RepairOut(w.walkId, w.start, w.path, null, u.node) }
          }
        }
        .persist()
      caches += out
      val misses = out.filter(col("miss") >= 0L).select(col("miss")).distinct().as[Long].collect()
      changedParts += out
        .filter(col("miss") < 0L && col("newPath").isNotNull)
        .map(o => (WalkRow(o.walkId, o.start, o.newPath), o.oldPath))
      if (misses.isEmpty) drained = true
      else {
        // exponential hop expansion: a long segment resolves in O(log len)
        // retries instead of one per hop
        attempt += 1
        resolver.resolve(misses.toIndexedSeq, expandHops = math.min(1 << attempt, 16))
        todo = out.filter(col("miss") >= 0L).map(o => WalkRow(o.walkId, o.start, o.oldPath))
      }
    }
    val changed = changedParts.reduce(_ union _).persist()
    val n = changed.count()
    caches.foreach(_.unpersist())
    (changed, n)
  }

  /** Generate walksPerNode walks per start node against distributed
    * adjacency (same miss-retry scheme; walkIds = node*walksPerNode+i as
    * everywhere else). For promotion batches small enough that the touched
    * neighborhood fits a broadcast; IterativeWalker is the unbounded path.
    */
  def generateAll(
      spark: SparkSession,
      startIds: Seq[Long],
      resolver: Resolver,
      round: Long,
      wave: Int,
      params: CrawlParams
  ): Dataset[WalkRow] = {
    import spark.implicits._
    resolver.resolve(startIds)
    var todo: Dataset[Long] = spark.createDataset(startIds)
    val doneParts = mutable.ArrayBuffer.empty[Dataset[WalkRow]]
    val caches = mutable.ArrayBuffer.empty[Dataset[_]]
    var drained = false
    var attempt = 0
    while (!drained) {
      val bAdj = spark.sparkContext.broadcast(resolver.snapshot)
      val (p, r, wv) = (params, round, wave)
      val out: Dataset[GenOut] = todo
        .flatMap { node =>
          val adjF: WalkAlgebra.Adjacency =
            n => bAdj.value.getOrElse(n, throw new Unresolved(n))
          try {
            (0 until p.walksPerNode).iterator.map { i =>
              val wid = node * p.walksPerNode + i
              GenOut(wid, node, WalkAlgebra.generateWalk(adjF, node, wid, r, wv, p), -1L)
            }.toVector
          } catch { case u: Unresolved => Vector(GenOut(-1L, node, null, u.node)) }
        }
        .persist()
      caches += out
      val misses = out.filter(col("miss") >= 0L).select(col("miss")).distinct().as[Long].collect()
      doneParts += out.filter(col("miss") < 0L).map(o => WalkRow(o.walkId, o.start, o.path))
      if (misses.isEmpty) drained = true
      else {
        attempt += 1
        resolver.resolve(misses.toIndexedSeq, expandHops = math.min(1 << attempt, 16))
        todo = out.filter(col("miss") >= 0L).select(col("start")).as[Long]
      }
    }
    val res = doneParts.reduce(_ union _).persist()
    res.count()
    caches.foreach(_.unpersist())
    res
  }
}
