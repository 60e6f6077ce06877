package graft.core

/** Core row types of the crawl-and-rank engine.
  *
  * These are the Spark-native re-expression of the reference's five core
  * abstractions (SURVEY.md §1.1): graph node, adjacency, delta, random walk,
  * and the page ("event") payload. All state lives in columnar tables, not
  * in per-process stores.
  */

/** A Common-Crawl-style web page (BASELINE.json input_hint).
  * Maps the reference's `nostr.Event` ingest payload.
  */
case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Node of the link graph. Mirrors `graph.Node{ID, Pubkey, Status, Records}`
  * (/root/reference/pkg/graph/graph.go:47-58): `url` plays the pubkey role,
  * status uses the same three values, and the Addition/Promotion/Demotion
  * record timestamps become round numbers (-1 = absent).
  */
case class NodeRow(
    id: Long,
    url: String,
    host: String,
    status: String, // "active" | "inactive" | "leaked"
    addedRound: Long,
    promotedRound: Long, // -1 if never
    demotedRound: Long // -1 if never
)

object NodeStatus {
  val Active = "active"
  val Inactive = "inactive"
  val Leaked = "leaked"
}

/** Directed edge src→dst of the link graph (reference's follows/followers
  * Redis SETs, /root/reference/pkg/regraph/graph.go:24-25). The edges table
  * is the source of truth; adjacency arrays are derived views.
  */
case class EdgeRow(src: Long, dst: Long)

/** A random walk (reference `walks.Walk`, /root/reference/pkg/walks/walks.go:28-31).
  * `walkId = startNode * walksPerNode + walkIdx` — deterministic, unique
  * (the reference's Redis counter allocation is replaced per SURVEY.md §1.3).
  * Paths never contain a repeated node (walk generation stops on cycles).
  */
case class WalkRow(walkId: Long, start: Long, path: Array[Long])

/** A 3-way adjacency delta for one node (reference `graph.Delta`,
  * /root/reference/pkg/graph/graph.go:75-92).
  */
case class DeltaRow(node: Long, remove: Array[Long], keep: Array[Long], add: Array[Long]) {
  def inverse: DeltaRow = DeltaRow(node, add, keep, remove)
  def oldList: Array[Long] = keep ++ remove
  def newList: Array[Long] = keep ++ add
}

/** A leak-detection record (reference `leaks.Record{Pubkey, DetectedAt,
  * Status, Proof}`, /root/reference/pkg/leaks/leaks.go:146-151): `confirmed`
  * = a checksum-valid secret was found in the page text, `suspected` = a
  * pattern match that failed validation. `proofs` are md5 digests of the
  * matched candidates (never the raw secrets).
  */
case class LeakRecord(id: Long, url: String, detectedRound: Long, status: String, proofs: Array[String])

object LeakStatus {
  val Confirmed = "confirmed"
  val Suspected = "suspected"
}

/** Crawl parameters — the analog of the reference's env config
  * (walks.Alpha/N at /root/reference/pkg/walks/walks.go:16-17, fetcher
  * batch at pkg/pipe/fetcher/config.go, arbiter thresholds at
  * pkg/pipe/arbiter/config.go). promotionWait is in rounds (reference test env
  * pins ARBITER_PROMOTION_WAIT=0s).
  */
case class CrawlParams(
    seed: Long = 42L,
    alpha: Double = 0.85,
    walksPerNode: Int = 100,
    batch: Int = 100,
    hostBudget: Int = 10, // max URLs per host per fetch batch (politeness)
    promotion: Double = 0.1, // promotionT = promotion * N / totalVisits
    demotion: Double = 0.05,
    activation: Double = 0.01, // walk-change ratio that triggers an arbiter scan
    promotionWait: Long = 0L, // rounds since addition before promotion-eligible
    maxWalkSteps: Int = 1000 // hard cap; reference stops on cycle/dangling
)

/** Per-round observability record (north_rule: per-partition lineage +
  * fetch/dedupe metrics).
  */
case class RoundMetrics(
    round: Long,
    scheduled: Long, // URLs in this round's fetch batch
    fetched: Long, // batch URLs that existed in the pages table
    newNodes: Long,
    newEdges: Long,
    removedEdges: Long,
    walksChanged: Long,
    totalWalks: Long,
    promoted: Long,
    demoted: Long,
    seenSize: Long,
    pendingSize: Long,
    scanRan: Boolean,
    wallMillis: Long,
    /** Nodes whose follow lists the driver resolved this round (the
      * SubgraphWalks cache) — the driver-side graph footprint, O(batch ×
      * degree + walk changes), asserted flat against crawl progress in
      * BASELINE.md §3.4.
      */
    driverResolvedNodes: Long = 0L,
    /** Total delta-list entries broadcast for walk repair this round. */
    driverDeltaEntries: Long = 0L
)
