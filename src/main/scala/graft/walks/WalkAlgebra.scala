package graft.walks

import graft.core.{CrawlParams, DeltaRow, Rng}

/** Pure, order-independent walk algorithms — the single implementation used
  * by BOTH the sequential executable spec and the distributed Spark engine.
  * Byte-equivalence between the two (the north-rule's crawl-order +
  * seen-set criterion, SURVEY.md §7.4) reduces to: same inputs + same pure
  * functions ⇒ same outputs, regardless of partitioning.
  *
  * Reference semantics reproduced exactly (see file:line cites):
  *  - walk generation: /root/reference/pkg/walks/walks.go:136-174
  *    (start node always included; continue w.p. α; uniform next hop among
  *    follows; stop on dangling node; stop on cycle WITHOUT appending).
  *  - walk repair: /root/reference/pkg/walks/walks.go:191-259
  *    (resample w.p. a/(a+k) → prune at the delta node, α-gated graft of a
  *    segment started from a random Added node; else if the next step is a
  *    Removed node → prune and graft a segment from the Kept nodes,
  *    ungated; graft trims at the first global repetition, walks.go:84-92).
  *
  * The reference's unseeded global RNG is replaced by counter-based draws
  * (see [[graft.core.Rng]]); each draw is keyed by
  * (walkId, round | wave | step, purpose), so no draw depends on evaluation
  * order. Walk-visit positions and in-round waves keep repair draws unique.
  */
object WalkAlgebra extends Serializable {

  // Purpose codes for RNG draws (never reuse across contexts).
  private val GenContinue = 1L
  private val GenNext = 2L
  private val RepResample = 3L
  private val RepAlpha = 4L
  private val SegStart = 5L
  private val SegContinue = 6L
  private val SegNext = 7L

  /** Packs (round, wave, step) into one RNG key field.
    * step < 2^20 (maxWalkSteps ≤ ~1M), wave < 16.
    */
  @inline private def stepKey(round: Long, wave: Int, step: Long): Long =
    (round << 24) | (wave.toLong << 20) | step

  /** Public step draws — the iterative (join-based) walker must make the
    * exact same draws as [[generateWalk]].
    */
  @inline def genContinues(params: CrawlParams, walkId: Long, round: Long, wave: Int, step: Long): Boolean =
    Rng.u01(params.seed, walkId, stepKey(round, wave, step), GenContinue) <= params.alpha

  @inline def genNextIndex(params: CrawlParams, walkId: Long, round: Long, wave: Int, step: Long, n: Int): Int =
    Rng.uniformIndex(params.seed, walkId, stepKey(round, wave, step), GenNext, n)

  /** Public repair-decision draws (reference ToUpdate, walks.go:199-244).
    * Counter-based draws are pure functions of their keys, so exposing them
    * changes nothing about the draw sequence — the distributed repair makes
    * the exact same decisions as [[repairWalk]].
    */
  @inline def repResamples(params: CrawlParams, walkId: Long, round: Long, wave: Int, pos: Long, d: DeltaRow): Boolean = {
    val a = d.add.length.toDouble
    val kc = d.keep.length.toDouble
    val resampleP = if (d.add.isEmpty) 0.0 else a / (a + kc)
    Rng.u01(params.seed, walkId, stepKey(round, wave, pos), RepResample) < resampleP
  }

  @inline def repAlphaPasses(params: CrawlParams, walkId: Long, round: Long, wave: Int, pos: Long): Boolean =
    Rng.u01(params.seed, walkId, stepKey(round, wave, pos), RepAlpha) < params.alpha

  /** Public segment draws — the distributed join-per-hop repair
    * (IterativeRepair) must make the exact same draws as
    * [[generateSegment]]. `posKey` namespaces a segment within
    * (walk, round, wave); the start draw uses slot 0 of the segment's
    * key block, step draws use slots step+1.
    */
  @inline def segMaxSteps(params: CrawlParams): Long = math.min(params.maxWalkSteps.toLong, 1023L)

  @inline def segStartIndex(params: CrawlParams, walkId: Long, round: Long, wave: Int, posKey: Long, n: Int): Int =
    Rng.uniformIndex(params.seed, walkId, stepKey(round, wave, posKey << 10), SegStart, n)

  @inline def segContinues(params: CrawlParams, walkId: Long, round: Long, wave: Int, posKey: Long, step: Long): Boolean =
    Rng.u01(params.seed, walkId, stepKey(round, wave, (posKey << 10) | (step + 1)), SegContinue) <= params.alpha

  @inline def segNextIndex(
      params: CrawlParams,
      walkId: Long,
      round: Long,
      wave: Int,
      posKey: Long,
      step: Long,
      n: Int
  ): Int =
    Rng.uniformIndex(params.seed, walkId, stepKey(round, wave, (posKey << 10) | (step + 1)), SegNext, n)

  /** Adjacency access. Follow lists MUST be sorted ascending by node id —
    * next-hop selection picks by index, so ordering is part of the spec.
    */
  type Adjacency = Long => Array[Long]

  /** Generate one walk from `start` (always included). Reference:
    * walks.go:140-174 with per-step seeded draws instead of a global RNG.
    */
  def generateWalk(
      adj: Adjacency,
      start: Long,
      walkId: Long,
      round: Long,
      wave: Int,
      params: CrawlParams
  ): Array[Long] = {
    val path = scala.collection.mutable.ArrayBuffer[Long](start)
    var node = start
    var step = 0L
    var done = false
    while (!done && step < params.maxWalkSteps) {
      if (!genContinues(params, walkId, round, wave, step)) {
        done = true
      } else {
        val follows = adj(node)
        if (follows.isEmpty) done = true // dangling
        else {
          val next = follows(genNextIndex(params, walkId, round, wave, step, follows.length))
          if (path.contains(next)) done = true // cycle: stop, do not append
          else { path += next; node = next }
        }
      }
      step += 1
    }
    path.toArray
  }

  /** Generate a segment starting from a uniformly drawn element of `pool`
    * (reference generate(start...) with a start set, walks.go:140-174).
    * Returns empty for an empty pool. Cycle check is against the segment
    * only; global cycle-trimming happens in [[graft]].
    * `posKey` namespaces the draws of this segment within (walk, round, wave).
    */
  def generateSegment(
      adj: Adjacency,
      pool: Array[Long],
      walkId: Long,
      round: Long,
      wave: Int,
      posKey: Long,
      params: CrawlParams
  ): Array[Long] = {
    if (pool.isEmpty) return Array.empty
    val start = pool(segStartIndex(params, walkId, round, wave, posKey, pool.length))
    val path = scala.collection.mutable.ArrayBuffer[Long](start)
    var node = start
    var step = 0L
    val maxSeg = segMaxSteps(params)
    var done = false
    while (!done && step < maxSeg) {
      if (!segContinues(params, walkId, round, wave, posKey, step)) done = true
      else {
        val follows = adj(node)
        if (follows.isEmpty) done = true
        else {
          val next = follows(segNextIndex(params, walkId, round, wave, posKey, step, follows.length))
          if (path.contains(next)) done = true
          else { path += next; node = next }
        }
      }
      step += 1
    }
    path.toArray
  }

  /** First index where two walks differ, -1 if equal. Reference Divergence
    * (walks.go:95-108) — used there to minimize store writes (O1); columnar
    * overwrite makes that unnecessary, kept as the test helper the reference
    * also uses.
    */
  def divergence(w1: Array[Long], w2: Array[Long]): Int = {
    val min = math.min(w1.length, w2.length)
    var i = 0
    while (i < min) {
      if (w1(i) != w2(i)) return i
      i += 1
    }
    if (w1.length == w2.length) -1 else min
  }

  /** First index holding a value already seen earlier, or -1.
    * Reference findCycle, walks.go:279-290.
    */
  def findCycle(path: Array[Long]): Int = {
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var i = 0
    while (i < path.length) {
      if (!seen.add(path(i))) return i
      i += 1
    }
    -1
  }

  /** Append `segment` to `prefix`, truncating at the first global
    * repetition. Reference Walk.Graft, walks.go:84-92.
    */
  def graft(prefix: Array[Long], segment: Array[Long]): Array[Long] = {
    val combined = prefix ++ segment
    val cut = findCycle(combined)
    if (cut == -1) combined else combined.take(cut)
  }

  /** Repair one walk against a wave of deltas (node → delta).
    *
    * Scans the path left-to-right; at each visited delta node, applies the
    * reference's ToUpdate step (walks.go:199-244). After a repair the scan
    * continues on the NEW path from the next position, so delta nodes that
    * appear in a grafted tail are also repaired — this is the deterministic
    * batch analog of the reference processing events one at a time (each
    * later event sees already-repaired walks). Returns Some(newPath) iff
    * the path changed.
    *
    * `adj` must be the adjacency AFTER this wave's deltas are applied
    * (the reference updates the graph before repairing walks,
    * /root/reference/pkg/pipe/engine/engine.go:346-369).
    */
  def repairWalk(
      adj: Adjacency,
      deltas: scala.collection.Map[Long, DeltaRow],
      walkId: Long,
      path0: Array[Long],
      round: Long,
      wave: Int,
      params: CrawlParams
  ): Option[Array[Long]] = {
    var path = path0
    var changed = false
    var pos = 0
    while (pos < path.length && pos < 1023) {
      deltas.get(path(pos)) match {
        case Some(d) =>
          val posL = pos.toLong
          val resample = repResamples(params, walkId, round, wave, posL, d)
          val invalid = pos + 1 < path.length && d.remove.contains(path(pos + 1))
          if (resample) {
            var np = path.take(pos + 1)
            if (repAlphaPasses(params, walkId, round, wave, posL)) {
              val seg = generateSegment(adj, d.add, walkId, round, wave, posL + 1, params)
              np = graft(np, seg)
            }
            if (!java.util.Arrays.equals(np, path)) { path = np; changed = true }
          } else if (invalid) {
            val seg = generateSegment(adj, d.keep, walkId, round, wave, posL + 1, params)
            val np = graft(path.take(pos + 1), seg)
            if (!java.util.Arrays.equals(np, path)) { path = np; changed = true }
          }
        case None => ()
      }
      pos += 1
    }
    if (changed) Some(path) else None
  }

  /** 3-way set partition old vs new → (remove, keep, add), each sorted
    * ascending. Reference NewDelta / slicex.Partition
    * (/root/reference/pkg/graph/graph.go:84-92).
    */
  def newDelta(node: Long, oldList: Array[Long], newList: Array[Long]): DeltaRow = {
    val oldSet = oldList.toSet
    val newSet = newList.toSet
    DeltaRow(
      node,
      remove = oldSet.diff(newSet).toArray.sorted,
      keep = oldSet.intersect(newSet).toArray.sorted,
      add = newSet.diff(oldSet).toArray.sorted
    )
  }
}
