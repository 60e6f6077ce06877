package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.CacheOps

/** End-to-end corpus curation: the composition a training-data user
  * actually runs over a crawled document table —
  *
  *   exact dedup → near-dup (LSH) removal → quality-filter cascade →
  *   content-hash split assignment
  *
  * — with a manifest accounting for every input row (the per-stage drop
  * counts sum exactly to the input count; CorpusPipelineSpec pins the
  * invariant). Each stage reuses the already-scale-guarded operator the
  * driver gate checks one-by-one (q18's hash groups, q33/q34's capped
  * banded LSH + pointer-jumping components, q52's cascade, q51's md5
  * split), so the composition inherits their guards: no uncapped
  * self-join, no driver-side corpus state, every projection codegen-fused.
  *
  * Stage boundaries materialize through [[CacheOps.checkpointReleasable]]
  * — each stage's survivor set is computed once, every intermediate is
  * freed deterministically, and the returned curated frame is a live
  * checkpoint the caller releases after writing.
  */
object CorpusPipeline {

  /** Per-stage accounting. `input = exactDupsRemoved + nearDupsRemoved +
    * Σ droppedByReason + kept`, and `kept = Σ splits`.
    */
  final case class Manifest(
      input: Long,
      exactDupsRemoved: Long,
      nearDupsRemoved: Long,
      droppedByReason: Map[String, Long],
      kept: Long,
      splits: Map[String, Long],
      skippedRules: Seq[String] = Nil
  ) {
    private def m(kv: Map[String, Long]): String =
      kv.toSeq.sorted.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    def json: String =
      s"""{"input":$input,"exact_dups_removed":$exactDupsRemoved,"near_dups_removed":$nearDupsRemoved,""" +
        s""""dropped_by_reason":${m(droppedByReason)},"kept":$kept,"splits":${m(splits)},""" +
        s""""skipped_rules":${skippedRules.sorted.map(r => s"\"$r\"").mkString("[", ",", "]")}}"""
  }

  /** Documents view of a crawl checkpoint: the newest version of every
    * FETCHED page as (doc_id, text, url, source, n_chars) — the bridge
    * from the crawl engine's output to [[curate]]. The extracted store
    * keeps only the light columns (the one html pass is column-pruned
    * away, CrawlEngine.extractPages), so text re-joins from the original
    * page store — at production scale the warc archive, here the
    * deterministic generator that plays its role. Newest-per-url uses the
    * engine's exact version order ((warc_ts, md5(html)), the S6/q01 rule);
    * doc_id = xxhash64(url). If the state dir carries an `extracted_cfg`
    * marker it must match `cfg` (same guard as CrawlMain resume).
    */
  def crawlDocuments(
      spark: SparkSession,
      io: graft.round.ParquetTableIO,
      cfg: graft.fixtures.PagesGen.Config
  ): DataFrame = {
    val last = io.lastCompleteRound()
    require(last >= 0L, "no complete round in the state dir")
    if (io.exists(0L, "extracted_cfg")) {
      val m = io.read(0L, "extracted_cfg").select("pages", "hosts").collect().head
      require(
        m.getInt(0) == cfg.pages && m.getInt(1) == cfg.hosts,
        s"state dir extracted_cfg (pages=${m.getInt(0)}, hosts=${m.getInt(1)}) does not match " +
          s"the requested corpus (pages=${cfg.pages}, hosts=${cfg.hosts})"
      )
    }
    val fetched = io.read(last, "fetched").select("url").distinct()
    val pages = graft.fixtures.PagesGen
      .generate(spark, cfg, partitions = math.max(spark.sparkContext.defaultParallelism * 2, 4))
      .toDF
      .join(fetched, Seq("url"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url")
      .orderBy(col("warc_ts").desc, md5(col("html")).desc)
    pages
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        xxhash64(col("url")).as("doc_id"),
        col("text"),
        col("url"),
        substring_index(substring_index(col("url"), "//", -1), "/", 1).as("source"),
        length(col("text")).cast("long").as("n_chars")
      )
  }

  /** Curate `documents` (requires doc_id + text; every other column is
    * carried through). Returns the curated frame — input columns plus
    * `split` — as a released-on-demand checkpoint, the manifest, and the
    * release handle for the curated checkpoint.
    */
  def curate(
      spark: SparkSession,
      documents: DataFrame,
      minJaccard: Double = 0.5,
      maxBucket: Int = TextQueries.LshMaxBucket,
      skipRules: Set[String] = Set.empty
  ): (DataFrame, Manifest, () => Unit) = {
    val input = documents.count()

    // 1: exact dedup — md5 hash groups, keeper = min doc_id (q18's rule)
    val keeperIds = documents
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val (exactCp, relExact) = CacheOps.checkpointReleasable(
      documents.join(keeperIds, Seq("doc_id"), "left_semi")
    )
    val nExact = exactCp.count()

    // 2: near-dup removal — capped banded LSH + Jaccard verify (q33) and
    // min-label components (q34): every non-minimal cluster member drops
    val (vp, relVp) = TextQueries.verifiedPairsReleasable(exactCp.select("doc_id", "text"), maxBucket)
    val dup = vp
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b")
    // the lazy edge plan materializes once, into CC's edgesLoop checkpoint;
    // the verify caches release after CC returns (the q34 discipline)
    val edgesBoth = dup
      .select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      .union(dup.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
    val (labels, _, relCC) = TextQueries.connectedComponents(spark, edgesBoth)
    relVp()
    val (dropsCp, relDrops) = CacheOps.checkpointReleasable(
      labels.filter(col("node") =!= col("label")).select(col("node").as("doc_id"))
    )
    val nNear = dropsCp.count()
    relCC()
    val (dedupedCp, relDeduped) = CacheOps.checkpointReleasable(
      exactCp.join(dropsCp, Seq("doc_id"), "left_anti")
    )
    dedupedCp.count()
    relExact()
    relDrops()

    // 3: quality cascade — verdict stamped as a pure projection (q52)
    val (judgedCp, relJudged) =
      CacheOps.checkpointReleasable(TextQueries.withVerdict(dedupedCp, skipRules))
    val reasonCounts = judgedCp
      .filter(col("verdict") =!= "kept")
      .groupBy("verdict")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    relDeduped()

    // 4: split assignment (q51) on the kept docs
    val (curatedCp, relCurated) = CacheOps.checkpointReleasable(
      judgedCp.filter(col("verdict") === "kept").drop("verdict").withColumn("split", TextQueries.splitCol)
    )
    val splitCounts = curatedCp
      .groupBy("split")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    relJudged()

    val manifest = Manifest(
      input = input,
      exactDupsRemoved = input - nExact,
      nearDupsRemoved = nNear,
      droppedByReason = reasonCounts,
      kept = splitCounts.values.sum,
      splits = splitCounts,
      skippedRules = skipRules.toSeq.sorted
    )
    (curatedCp, manifest, relCurated)
  }
}
