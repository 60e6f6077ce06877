package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, minhash-LSH, simhash, n-gram Jaccard),
  * similarity search (brute-force + bucketed ANN), and text analysis
  * (language-ID heuristic, quality score, token counts, fingerprints).
  *
  * Cross-engine parity trick: every hash-based op uses md5 (identical hex
  * string in Spark and DuckDB); numeric hashes derive from the first 8 hex
  * chars (conv(…,16,10) in Spark == CAST('0x'||… AS BIGINT) in DuckDB), so
  * even MinHash/SimHash get full value-level oracles instead of rows-only
  * checks.
  */
object TextQueries {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Bucket-size cap for banded self-joins (LSH bands, simhash byte bands).
    * A band bucket of n docs emits n(n−1)/2 candidate pairs ON ONE SHUFFLE
    * KEY — a boilerplate mega-bucket (template pages, a certainty in a web
    * corpus) would go quadratic with maximal skew. Buckets above the cap
    * are DROPPED before pairing (the standard production guard): a bucket
    * that large carries no near-dup signal anyway — its members are either
    * exact dups (caught upstream by q18's hash dedup) or template
    * boilerplate. Candidate-pair work is thereby bounded by
    * O(cap² · buckets). Mirrored verbatim in the DuckDB oracles
    * (HAVING count(*) BETWEEN 2 AND cap), so the capped queries stay
    * value-level checked; TextDedupSpec pins the mega-bucket behavior.
    * Declared FIRST in this object: the oracle SQL strings interpolate it
    * at initialization.
    */
  private[graft] val LshMaxBucket = 4096

  /** distinct tokens per doc (whitespace tokenizer; documents are
    * single-space word soup).
    */
  private def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** q18 — exact dedup (hash-groupBy): md5 fingerprint groups with keeper =
    * min doc_id (the reference's newest-per-key S6 Replace inverted to
    * first-wins for stable ids).
    */
  def q18DedupExact(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .groupBy("n_copies")
      .agg(count(lit(1)).as("n_groups"), min(col("keeper")).as("first_keeper"))
      .orderBy("n_copies")
  }
  val q18Sql: String =
    """SELECT n_copies, count(*) AS n_groups, min(keeper) AS first_keeper
      |FROM (SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
      |      FROM documents GROUP BY 1)
      |GROUP BY n_copies ORDER BY n_copies""".stripMargin

  /** q19 — token counting (whitespace tokenizer + distinct-token count). */
  def q19TokenCount(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
        length(col("text")).cast("long").as("n_chars_text")
      )
      .orderBy("doc_id")
  }
  val q19Sql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |       CAST(length(text) AS BIGINT) AS n_chars_text
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q20 — quality scoring (length/word-length/diversity ratios). The
    * tokenization is projected ONCE (`ws`) and every ratio derives from it —
    * one split per row instead of three.
    */
  def q20QualityScore(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"), split(col("text"), " ").as("ws"))
      .select(
        col("doc_id"),
        round(col("len").cast("double") / size(col("ws")).cast("double"), 4).as("avg_token_len"),
        round(size(array_distinct(col("ws"))).cast("double") / size(col("ws")).cast("double"), 4).as("diversity"),
        (col("len") >= 100 && col("len") <= 2000).as("length_ok")
      )
      .orderBy("doc_id")
  }
  val q20Sql: String =
    """SELECT doc_id,
      |       CAST(round(CAST(length(text) AS DOUBLE) / len(string_split(text,' ')), 4) AS DOUBLE) AS avg_token_len,
      |       CAST(round(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')), 4) AS DOUBLE) AS diversity,
      |       length(text) >= 100 AND length(text) <= 2000 AS length_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q21 — language-ID heuristic (stopword-marker n-gram check) compared
    * against the labeled `lang` column.
    */
  def q21LangId(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .withColumn(
        "pred_en",
        col("text").contains(" the ") || col("text").startsWith("the ") || col("text").contains(" a ")
      )
      .groupBy("lang", "pred_en")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_en")
  }
  val q21Sql: String =
    """SELECT lang, (text LIKE '% the %' OR text LIKE 'the %' OR text LIKE '% a %') AS pred_en, count(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY lang, pred_en""".stripMargin

  /** q22 — document fingerprinting: content hash + a positional rolling-ish
    * digest (md5 of length-prefixed text).
    */
  def q22Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    t(dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp"),
        md5(concat(col("n_chars").cast("string"), lit(":"), substring(col("text"), 1, 32)).cast("binary"))
          .as("prefix_fp")
      )
      .orderBy("doc_id")
  }
  val q22Sql: String =
    """SELECT doc_id, md5(text) AS fp,
      |       md5(CAST(n_chars AS VARCHAR) || ':' || substr(text, 1, 32)) AS prefix_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q23 — n-gram (unigram-set) Jaccard near-dup against a fixed query doc:
    * |A∩B| / |A∪B| over distinct token sets, top 20.
    */
  def q23Jaccard(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val toks = tokens(t(dir, "documents"))
    // the query doc's token set is O(one document) — collect it once instead
    // of persisting the full token table (a persist here outlived the query,
    // leaking cache across a long driver session)
    val qtoks = toks.filter(col("doc_id") === 0).select("tok").as[String].collect()
    val qsz = qtoks.length.toLong
    val qset = broadcast(spark.createDataset(qtoks.toSeq).toDF("qtok"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks
      .join(qset, col("tok") === col("qtok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("inter"))
    sizes
      .join(inter, Seq("doc_id"), "left")
      .withColumn("i", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard", round(col("i").cast("double") / (col("sz") + lit(qsz) - col("i")), 4))
      .filter(col("doc_id") =!= 0)
      .select("doc_id", "jaccard")
      .orderBy(col("jaccard").desc, col("doc_id").asc)
      .limit(20)
  }
  val q23Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
      |q AS (SELECT tok AS qtok FROM toks WHERE doc_id = 0),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |qsz AS (SELECT count(*) AS qn FROM q),
      |inter AS (SELECT doc_id, count(*) AS i FROM toks JOIN q ON tok = qtok GROUP BY doc_id)
      |SELECT s.doc_id,
      |       CAST(round(CAST(coalesce(i, 0) AS DOUBLE) / (sz + (SELECT qn FROM qsz) - coalesce(i, 0)), 4) AS DOUBLE) AS jaccard
      |FROM sizes s LEFT JOIN inter USING (doc_id)
      |WHERE s.doc_id <> 0 ORDER BY jaccard DESC, s.doc_id ASC LIMIT 20""".stripMargin

  /** q24 — MinHash + LSH banding (shingle→minhash→band→bucket histogram):
    * 4 md5-minhashes per doc, banded 2×2; emits bucket sizes + candidate
    * pair counts per band (the collision structure an LSH dedup join uses).
    */
  def q24MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    def h(k: Int): Column = min(md5(concat(lit(s"s$k:"), col("tok")).cast("binary"))).as(s"h$k")
    val sig = tokens(t(dir, "documents")).groupBy("doc_id").agg(h(1), h(2), h(3), h(4))
    val bands = sig
      .select(col("doc_id"), md5(concat(col("h1"), col("h2")).cast("binary")).as("b"), lit(1).as("band"))
      .union(sig.select(col("doc_id"), md5(concat(col("h3"), col("h4")).cast("binary")).as("b"), lit(2).as("band")))
    bands
      .groupBy("band", "b")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") >= 2)
      .withColumn("n_pairs", (col("n_docs") * (col("n_docs") - 1) / 2).cast("long"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n_pairs")).cast("long").as("candidate_pairs"),
        max(col("n_docs")).as("max_bucket"),
        min(col("min_doc")).as("first_doc")
      )
      .orderBy("band")
  }
  val q24Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
      |sig AS (SELECT doc_id, min(md5('s1:' || tok)) AS h1, min(md5('s2:' || tok)) AS h2,
      |               min(md5('s3:' || tok)) AS h3, min(md5('s4:' || tok)) AS h4
      |        FROM toks GROUP BY doc_id),
      |bands AS (SELECT doc_id, md5(h1 || h2) AS b, 1 AS band FROM sig
      |          UNION ALL SELECT doc_id, md5(h3 || h4) AS b, 2 AS band FROM sig),
      |buckets AS (SELECT band, b, count(*) AS n_docs, min(doc_id) AS min_doc,
      |                   CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
      |            FROM bands GROUP BY band, b HAVING count(*) >= 2)
      |SELECT band, count(*) AS n_buckets, CAST(sum(n_pairs) AS BIGINT) AS candidate_pairs,
      |       max(n_docs) AS max_bucket, min(min_doc) AS first_doc
      |FROM buckets GROUP BY band ORDER BY band""".stripMargin

  /** q25 — SimHash (32-bit, md5-derived per-token hashes): per-doc simhash
    * value. Cross-engine: conv(hex,16,10) == CAST('0x'||hex AS BIGINT).
    */
  def q25Simhash(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val toks = tokens(t(dir, "documents"))
      .withColumn("h", expr("cast(conv(substring(md5(cast(tok as binary)), 1, 8), 16, 10) as bigint)"))
    toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("sgn", when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1))
      .groupBy("doc_id", "bit")
      .agg(sum(col("sgn")).as("s"))
      .withColumn("contrib", when(col("s") > 0, expr("shiftleft(1L, cast(bit as int))")).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).cast("long").as("simhash"))
      .orderBy("doc_id")
  }
  val q25Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
      |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks),
      |bits AS (SELECT doc_id, h, bit FROM h, (SELECT unnest(range(0, 32)) AS bit)),
      |votes AS (SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |          FROM bits GROUP BY doc_id, bit)
      |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q26 — brute-force cosine top-k ANN baseline against query vector
    * vec_id=0 (double accumulation on both sides; ordered by rounded
    * similarity then id so float noise cannot reorder).
    */
  def q26AnnCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val emb = t(dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val dot = expr(
      "aggregate(zip_with(embedding, qe, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    val nx = expr("aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val ny = expr("aggregate(qe, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    emb
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos_sim", round(dot / (sqrt(nx) * sqrt(ny)), 4))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }
  val q26Sql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |pairs AS (SELECT e.vec_id, e.label,
      |                 CAST(unnest(e.embedding) AS DOUBLE) AS x, CAST(unnest(q.qe) AS DOUBLE) AS y
      |          FROM embeddings e, q WHERE e.vec_id <> 0),
      |sums AS (SELECT vec_id, label, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
      |         FROM pairs GROUP BY vec_id, label)
      |SELECT vec_id, label, CAST(round(dot / (sqrt(nx) * sqrt(ny)), 4) AS DOUBLE) AS cos_sim
      |FROM sums ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** q27 — IVF-style coarse quantization: sign-bucket of the first 8 dims →
    * bucket histogram (the partition structure a bucketed ANN join probes).
    */
  def q27IvfBuckets(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val bucket = (1 to 8)
      .map(i => when(expr(s"cast(element_at(embedding, $i) as double)") >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))
    t(dir, "embeddings")
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"), min(col("vec_id")).as("first_vec"))
      .orderBy("bucket")
  }
  val q27Sql: String = {
    val bucketExpr = (1 to 8)
      .map(i => s"(CASE WHEN CAST(embedding[$i] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""SELECT $bucketExpr AS bucket, count(*) AS n_vecs, count(DISTINCT label) AS n_labels, min(vec_id) AS first_vec
       |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** q28 — bucketed ANN (the LSH/IVF scale path): cosine top-5 restricted
    * to the query's sign-bucket — probes one partition instead of the full
    * table.
    */
  def q28AnnBucketed(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val bucket = (1 to 8)
      .map(i => when(expr(s"cast(element_at(embedding, $i) as double)") >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))
    val emb = t(dir, "embeddings").withColumn("bucket", bucket)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    val dot = expr(
      "aggregate(zip_with(embedding, qe, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    val nx = expr("aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val ny = expr("aggregate(qe, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    emb
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0 && col("bucket") === col("qbucket"))
      .withColumn("cos_sim", round(dot / (sqrt(nx) * sqrt(ny)), 4))
      .select("vec_id", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(5)
  }
  val q28Sql: String = {
    val b = (1 to 8)
      .map(i => s"(CASE WHEN CAST(embedding[$i] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH e AS (SELECT *, $b AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM e WHERE vec_id = 0),
       |pairs AS (SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS x, CAST(unnest(q.qe) AS DOUBLE) AS y
       |          FROM e, q WHERE e.vec_id <> 0 AND e.bucket = q.qbucket),
       |sums AS (SELECT vec_id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny FROM pairs GROUP BY vec_id)
       |SELECT vec_id, CAST(round(dot / (sqrt(nx) * sqrt(ny)), 4) AS DOUBLE) AS cos_sim
       |FROM sums ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin
  }

  /** q38 — MULTI-probe bucketed ANN (the recall knob q28 lacks): probe the
    * query's sign-bucket plus all 8 Hamming-distance-1 neighbor buckets —
    * 9 of 256 partitions scanned instead of 1, trading a bounded fan-out
    * for recall (the standard multi-probe LSH scheme).
    */
  def q38AnnMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val bucket = (1 to 8)
      .map(i => when(expr(s"cast(element_at(embedding, $i) as double)") >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))
    val emb = t(dir, "embeddings").withColumn("bucket", bucket)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    val flips: Seq[Column] = (1 to 8).map { i =>
      concat(
        expr(s"substring(qbucket, 1, ${i - 1})"),
        when(expr(s"substring(qbucket, $i, 1)") === "1", lit("0")).otherwise(lit("1")),
        expr(s"substring(qbucket, ${i + 1}, ${8 - i})")
      )
    }
    val probes = q.select(col("qe"), explode(array(col("qbucket") +: flips: _*)).as("bucket"))
    val dot = expr(
      "aggregate(zip_with(embedding, qe, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    val nx = expr("aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val ny = expr("aggregate(qe, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    emb
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos_sim", round(dot / (sqrt(nx) * sqrt(ny)), 4))
      .select("vec_id", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(5)
  }
  val q38Sql: String = {
    val b = (1 to 8)
      .map(i => s"(CASE WHEN CAST(embedding[$i] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    val flips = (1 to 8)
      .map(i =>
        s"substr(qbucket, 1, ${i - 1}) || (CASE WHEN substr(qbucket, $i, 1) = '1' THEN '0' ELSE '1' END) || substr(qbucket, ${i + 1}, ${8 - i})"
      )
      .mkString(", ")
    s"""WITH e AS (SELECT *, $b AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM e WHERE vec_id = 0),
       |probes AS (SELECT qe, unnest([qbucket, $flips]) AS bucket FROM q),
       |pairs AS (SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS x, CAST(unnest(p.qe) AS DOUBLE) AS y
       |          FROM e JOIN probes p ON e.bucket = p.bucket WHERE e.vec_id <> 0),
       |sums AS (SELECT vec_id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny FROM pairs GROUP BY vec_id)
       |SELECT vec_id, CAST(round(dot / (sqrt(nx) * sqrt(ny)), 4) AS DOUBLE) AS cos_sim
       |FROM sums ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin
  }

  /** `bits`-bit sign-code blocking column over `embedding` — the ONE
    * definition of the blocking scheme shared by q41/q46 and the candidate
    * helper; [[sqlSignBucket]] is its oracle twin. Change them together.
    */
  private def signBucket(bits: Int): Column =
    (1 to bits)
      .map(i => when(expr(s"cast(element_at(embedding, $i) as double)") >= 0, lit("1")).otherwise(lit("0")))
      .reduce((a, b) => concat(a, b))

  private def sqlSignBucket(bits: Int): String =
    (1 to bits).map(i => s"(CASE WHEN CAST(embedding[$i] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)").mkString(" || ")

  /** Embedding-cosine near-dup pairs, parameterized on the sign-code width:
    * blocking = `bits`-bit sign bucket (2^bits blocks); block count is the
    * parallelism/recall knob (4 bits suits the small fixture's weak
    * similarity structure, 8 bits = the 256-block structure of q27/q28 at
    * corpus scale). Every block is CAPPED at `maxBucket` members before
    * pairing — the same mega-bucket guard as q33/q42 (a dense sign bucket
    * is a certainty in a web corpus: near-zero embeddings all land in one
    * code) — so candidate work is O(cap² · blocks), never O(n²/blocks).
    * The count rides the same hash-partition-by-bucket the join needs
    * (window over the join key: no extra shuffle).
    */
  private[graft] def embeddingNearDup(
      spark: SparkSession,
      dir: String,
      bits: Int,
      maxBucket: Int = LshMaxBucket
  ): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy(col("bucket"))
    // the squared norm is computed ONCE PER VECTOR before the pair join —
    // folding it per pair tripled the per-candidate array work (r6
    // profiling: the single fused pair job carried 3 O(dim) folds per
    // candidate); the per-row fold is the identical expression, so the
    // doubles are bit-equal
    val nsq = expr("aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val e = t(dir, "embeddings")
      .select(col("vec_id"), col("embedding"), signBucket(bits).as("bucket"), nsq.as("nsq"))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n").between(2, maxBucket))
      .drop("__n")
    val dot = expr(
      "aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    e.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nsq").as("na"))
      .join(
        e.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nsq").as("nb")),
        Seq("bucket")
      )
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_r", round(dot / (sqrt(col("na")) * sqrt(col("nb"))), 4))
      .filter(col("cos_r") >= 0.35)
      .select("vec_a", "vec_b", "cos_r")
      .orderBy("vec_a", "vec_b")
  }

  /** Sign-blocked candidate pairs only (no verify) — lets TextDedupSpec pin
    * that the cap bounds candidate count on a mega-block fixture.
    */
  private[graft] def embeddingCandidatePairs(docs: DataFrame, bits: Int, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(col("bucket"))
    val e = docs
      .select(col("vec_id"), signBucket(bits).as("bucket"))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n").between(2, maxBucket))
      .drop("__n")
    e.select(col("bucket"), col("vec_id").as("vec_a"))
      .join(e.select(col("bucket"), col("vec_id").as("vec_b")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
  }

  /** Sign-blocked batch-ANN candidate pairs only (no scoring) — the q46
    * join shape with its candidate-side cap, exposed so TextDedupSpec can
    * pin that a dense mega-block yields at most `maxBucket` candidates PER
    * QUERY (not O(block)) while every query still gets candidates.
    */
  private[graft] def batchAnnCandidates(
      docs: DataFrame,
      bits: Int,
      maxBucket: Int,
      queryIds: Seq[Long]
  ): DataFrame = {
    // Dense-block guard — the CANDIDATE side of each bucket is capped at the
    // first `maxBucket` members by vec_id BEFORE the join. Unlike the dedup
    // caps (q33/q41/q42) the bucket cannot be DROPPED — an ANN query must
    // still get an answer — so the guard truncates the candidate list
    // instead: join output is O(queries-in-bucket × cap), never O(block²),
    // and a near-zero-embedding mega-block (a certainty in a web corpus)
    // costs each of its queries at most `cap` candidate rows on the shared
    // shuffle key. Recall inside an over-cap block is the documented trade
    // (deterministic by vec_id; mirrored in q46Sql's row_number, so the
    // values stay pinned); TextDedupSpec's mega-block fixture asserts the
    // bound with the genuine neighbor surviving. This is THE batch-ANN
    // candidate construction — q46 scores it; the spec pins it.
    val e = docs.select(col("vec_id"), col("embedding"), signBucket(bits).as("bucket"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("cand_id").asc)
    val cands = e
      .select(col("bucket"), col("vec_id").as("cand_id"), col("embedding").as("ce"))
      .withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
      .join(cands, Seq("bucket"))
      .filter(col("qid") =!= col("cand_id"))
      .select("qid", "cand_id", "qe", "ce")
  }

  /** q41 — embedding-cosine near-dup pairs (the ANN-dedup shape: blocked
    * candidate generation + exact verify, the vector analog of q33's LSH
    * text dedup). 4-bit sign blocking, block cap, exact double-accumulated
    * cosine, near-dup at ≥ 0.35. The oracle mirrors the SAME blocking AND
    * cap, so the values pin capped-blocked-dedup semantics (recall is the
    * blocking's documented trade — unblocked all-pairs is q26's
    * brute-force path).
    */
  def q41EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDup(spark, dir, bits = 4)
  val q41Sql: String = {
    val b = sqlSignBucket(4)
    s"""WITH e0 AS (SELECT vec_id, embedding, $b AS bucket FROM embeddings),
       |bok AS (SELECT bucket FROM e0 GROUP BY bucket HAVING count(*) BETWEEN 2 AND $LshMaxBucket),
       |e AS (SELECT e0.* FROM e0 JOIN bok USING (bucket)),
       |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.embedding AS ea, b.embedding AS eb
       |         FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pairs AS (SELECT vec_a, vec_b, CAST(unnest(ea) AS DOUBLE) AS x, CAST(unnest(eb) AS DOUBLE) AS y FROM cand),
       |sums AS (SELECT vec_a, vec_b, sum(x*y) AS dot, sum(x*x) AS na, sum(y*y) AS nb FROM pairs GROUP BY vec_a, vec_b)
       |SELECT vec_a, vec_b, CAST(round(dot / (sqrt(na) * sqrt(nb)), 4) AS DOUBLE) AS cos_r
       |FROM sums WHERE round(dot / (sqrt(na) * sqrt(nb)), 4) >= 0.35
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** q42 — SimHash near-dup join: band the 32-bit simhash into 4 bytes;
    * docs sharing ANY byte band are candidates (pigeonhole: Hamming ≤ 3
    * over 4 bands ⇒ at least one band equal, so the blocking is LOSSLESS
    * for the ≤3 threshold); verify with bit_count(xor) and report the
    * pair-count histogram per Hamming distance. Band buckets are capped
    * like q33's (the same mega-bucket guard, mirrored in the oracle).
    */
  def q42SimhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // both sides of the banded self-join share the identical simhash
    // subtree — Spark's exchange reuse evaluates it once (measured r6: an
    // explicit checkpoint here only added its materialization barrier,
    // 1.7 s → 4.3 s, and was reverted)
    val sh = q25Simhash(spark, dir) // (doc_id, simhash)
    val bands = sh.select(
      col("doc_id"),
      col("simhash"),
      explode(expr("transform(sequence(0, 3), k -> named_struct('k', k, 'bv', shiftright(simhash, 8 * k) & 255))")).as("band")
    )
    val w = Window.partitionBy(col("band.k"), col("band.bv"))
    val ok = bands.withColumn("__n", count(lit(1)).over(w)).filter(col("__n").between(2, LshMaxBucket)).drop("__n")
    val cand = ok
      .select(col("band"), col("doc_id").as("doc_a"), col("simhash").as("sa"))
      .join(ok.select(col("band"), col("doc_id").as("doc_b"), col("simhash").as("sb")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sa", "sb")
      .distinct()
    cand
      .withColumn("hd", expr("cast(bit_count(sa ^ sb) as int)"))
      .filter(col("hd") <= 3)
      .groupBy("hd")
      .agg(count(lit(1)).as("n_pairs"), min(col("doc_a")).as("first_a"))
      .orderBy("hd")
  }
  val q42Sql: String =
    s"""WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
      |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks),
      |bits AS (SELECT doc_id, h, bit FROM h, (SELECT unnest(range(0, 32)) AS bit)),
      |votes AS (SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |          FROM bits GROUP BY doc_id, bit),
      |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
      |       FROM votes GROUP BY doc_id),
      |bands AS (SELECT doc_id, simhash, k, (simhash >> (8*k)) & 255 AS bv FROM sh, (SELECT unnest(range(0, 4)) AS k)),
      |bok AS (SELECT k, bv FROM bands GROUP BY k, bv HAVING count(*) BETWEEN 2 AND $LshMaxBucket),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, b.simhash AS sb
      |         FROM bands a JOIN bok o ON a.k = o.k AND a.bv = o.bv
      |         JOIN bands b ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |ham AS (SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hd FROM cand)
      |SELECT hd, count(*) AS n_pairs, min(doc_a) AS first_a
      |FROM ham WHERE hd <= 3 GROUP BY hd ORDER BY hd""".stripMargin

  // ---------- end-to-end LSH near-dup dedup (q33/q34) ----------
  // Pipeline: 3-gram shingles → 8 md5-minhashes → 2 bands of 4 → bucket
  // self-join (shuffle by band key, never all-pairs) → candidate pairs →
  // exact Jaccard verification → min-id connected components → keeper per
  // cluster. The full production shape of an LSH dedup at 100 TB: every
  // stage is a shuffle-by-key or a bounded iterative join.

  /** Distinct 3-gram shingles per doc (word trigrams joined by '_'). */
  private[graft] def shingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .select(
        col("doc_id"),
        explode(
          array_distinct(
            expr("transform(sequence(0, size(ws) - 3), i -> concat(ws[i], '_', ws[i+1], '_', ws[i+2]))")
          )
        ).as("tok")
      )

  /** (doc_id, h1..h8): the 8-minhash signature table — O(docs) skinny rows,
    * the ONE LSH intermediate worth materializing at any scale (the shingle
    * explode it aggregates is corpus-sized: recompute, never cache).
    */
  private def signatures(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    def h(k: Int): Column = min(md5(concat(lit(s"s$k:"), col("tok")).cast("binary"))).as(s"h$k")
    sh.groupBy("doc_id").agg(h(1), h(2), h(3), h(4), h(5), h(6), h(7), h(8))
  }

  /** Band-bucket keys from a signature table (2 bands of 4 minhashes). */
  private def bandsFromSig(sig: DataFrame): DataFrame =
    sig
      .select(col("doc_id"), md5(concat(col("h1"), col("h2"), col("h3"), col("h4")).cast("binary")).as("b"), lit(1).as("band"))
      .union(
        sig.select(col("doc_id"), md5(concat(col("h5"), col("h6"), col("h7"), col("h8")).cast("binary")).as("b"), lit(2).as("band"))
      )

  /** (doc_id, band, b): each doc's LSH band-bucket keys (2 bands of 4
    * minhashes over 3-gram shingles).
    */
  private[graft] def bandBuckets(docs: DataFrame): DataFrame = bandsFromSig(signatures(docs))

  /** Band buckets above the cap (band, b, n_docs) — the buckets the
    * candidate join drops. Exposed for logging/monitoring and pinned by
    * TextDedupSpec's mega-bucket fixture.
    */
  private[graft] def oversizeBandBuckets(docs: DataFrame, maxBucket: Int = LshMaxBucket): DataFrame =
    bandBuckets(docs)
      .groupBy("band", "b")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** LSH candidate pairs, bucket-capped: only buckets with 2..maxBucket
    * members self-join (count via a window over the same (band, b) shuffle
    * the join needs — no extra job).
    */
  private[graft] def candidatePairs(docs: DataFrame, maxBucket: Int = LshMaxBucket): DataFrame =
    candidatePairsFromBuckets(bandBuckets(docs), maxBucket)

  /** The capped (band, b) self-join over a PRECOMPUTED bucket table — THE
    * load-bearing candidate construction (window-count cap, doc_a < doc_b,
    * distinct across bands) that the batch path ([[candidatePairs]]) and
    * StreamDedup's intra-batch path share; the q49 == q33 equality contract
    * rides on there being exactly one implementation.
    */
  private[graft] def candidatePairsFromBuckets(buckets: DataFrame, maxBucket: Int = LshMaxBucket): DataFrame = {
    val w = Window.partitionBy("band", "b")
    val ok = buckets
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n").between(2, maxBucket))
      .drop("__n")
    ok.select(col("band"), col("b"), col("doc_id").as("doc_a"))
      .join(ok.select(col("band"), col("b"), col("doc_id").as("doc_b")), Seq("band", "b"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact shingle-Jaccard for an arbitrary (doc_a, doc_b) candidate table.
    * `docs` only needs to cover the docs that appear in `cand` — callers
    * probing an incremental corpus (StreamDedup) pass just the candidate
    * docs so the verify stays O(candidates), not O(corpus).
    */
  private[graft] def jaccardVerify(docs: DataFrame, cand: DataFrame): DataFrame =
    jaccardVerifyFromShingles(shingles(docs), cand)

  /** [[jaccardVerify]] over a PRECOMPUTED shingle table — the shingles feed
    * three subtrees (sizes + both intersect sides), so callers that can
    * afford to materialize them (candidate-doc shingles are O(candidates))
    * checkpoint once and pass the cache here.
    */
  private[graft] def jaccardVerifyFromShingles(sh: DataFrame, cand: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .withColumn("ii", coalesce(col("i"), lit(0L)))
      .withColumn("jaccard", col("ii").cast("double") / (col("sza") + col("szb") - col("ii")))
  }

  /** Verified near-dup pairs: LSH candidates with exact shingle-Jaccard,
    * computed in the measured-first shape (r6): the corpus shingle explode
    * runs ONCE, into the checkpointed O(docs) signature table; candidates
    * (capped, checkpointed — O(cap²·buckets) by construction) come from the
    * cached signatures; and the exact-Jaccard verify shingles ONLY the docs
    * that appear in a candidate pair (a left-semi prune of the corpus —
    * guide §3.2's reduce-the-big-side-before-the-join, candidates ≪ corpus
    * at every scale). The r5 shape re-exploded the full corpus for the
    * signature pass AND all three verify subtrees — ~10 corpus-wide explode
    * stages per query where one suffices (profiled: the 2.3 s/1.2 s job
    * family dominating q34). Values are unchanged: per-pair Jaccard depends
    * only on the pair's own shingle sets.
    *
    * Dropped oversize buckets are logged when GRAFT_LSH_LOG=1 (opt-in;
    * [[oversizeBandBuckets]] is always available for monitoring).
    *
    * Returns (pairs, release); callers drain the pairs (or fold them into
    * their own checkpoint) before releasing.
    */
  private[graft] def verifiedPairsReleasable(
      docs: DataFrame,
      maxBucket: Int = LshMaxBucket
  ): (DataFrame, () => Unit) = {
    val docsSpread = graft.core.ScanOps.spread(docs)
    val (sig, relSig) = graft.core.CacheOps.checkpointReleasable(signatures(docsSpread))
    if (sys.env.get("GRAFT_LSH_LOG").contains("1")) {
      val dropped = bandsFromSig(sig)
        .groupBy("band", "b")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > maxBucket)
        .collect()
      if (dropped.nonEmpty)
        System.err.println(
          s"[lsh] dropped ${dropped.length} band buckets above cap=$maxBucket: " +
            dropped.take(5).map(r => s"(band=${r.getInt(0)}, n=${r.getLong(2)})").mkString(", ")
        )
    }
    val (cand, relCand) = graft.core.CacheOps.checkpointReleasable(
      candidatePairsFromBuckets(bandsFromSig(sig), maxBucket)
    )
    relSig() // candidates are materialized; the signatures served their purpose
    val candIds = cand
      .select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    val (shCand, relSh) = graft.core.CacheOps.checkpointReleasable(
      shingles(docsSpread.join(candIds, Seq("doc_id"), "left_semi"))
    )
    (jaccardVerifyFromShingles(shCand, cand), () => { relCand(); relSh() })
  }

  /** [[verifiedPairsReleasable]] with the caches left to the ContextCleaner
    * — the convenience form for specs and one-shot callers.
    */
  private[graft] def verifiedPairs(docs: DataFrame, maxBucket: Int = LshMaxBucket): DataFrame =
    verifiedPairsReleasable(docs, maxBucket)._1

  private val shingleSqlPrefix: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS tok
      |       FROM w, (SELECT unnest(range(1, 4001)) AS i) r WHERE i + 2 <= len(ws)),
      |sig AS (SELECT doc_id,
      |        min(md5('s1:' || tok)) AS h1, min(md5('s2:' || tok)) AS h2, min(md5('s3:' || tok)) AS h3, min(md5('s4:' || tok)) AS h4,
      |        min(md5('s5:' || tok)) AS h5, min(md5('s6:' || tok)) AS h6, min(md5('s7:' || tok)) AS h7, min(md5('s8:' || tok)) AS h8
      |        FROM sh GROUP BY doc_id),
      |bands AS (SELECT doc_id, md5(h1 || h2 || h3 || h4) AS b, 1 AS band FROM sig
      |          UNION ALL SELECT doc_id, md5(h5 || h6 || h7 || h8) AS b, 2 AS band FROM sig),
      |bok AS (SELECT band, b FROM bands GROUP BY band, b HAVING count(*) BETWEEN 2 AND $LshMaxBucket),
      |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |         FROM bands x JOIN bok k ON x.band = k.band AND x.b = k.b
      |         JOIN bands y ON x.band = y.band AND x.b = y.b AND x.doc_id < y.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c
      |          JOIN sh ta ON ta.doc_id = c.doc_a JOIN sh tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
      |          GROUP BY c.doc_a, c.doc_b),
      |verified AS (SELECT c.doc_a, c.doc_b,
      |                    CAST(coalesce(i, 0) AS DOUBLE) / (sa.sz + sb.sz - coalesce(i, 0)) AS jaccard
      |             FROM cand c LEFT JOIN inter USING (doc_a, doc_b)
      |             JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b)""".stripMargin

  /** q33 — LSH dedup candidate verification: every LSH candidate pair with
    * its exact shingle-Jaccard and the dedup verdict (≥ 0.5).
    */
  def q33LshDedupPairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val (vp, rel) = verifiedPairsReleasable(t(dir, "documents"))
    val out = vp
      .select(
        col("doc_a"),
        col("doc_b"),
        round(col("jaccard"), 4).as("jaccard_r"),
        (col("jaccard") >= 0.5).as("is_dup")
      )
      .orderBy("doc_a", "doc_b")
    graft.core.CacheOps.drain(out, rel)
  }
  val q33Sql: String =
    shingleSqlPrefix +
      """
        |SELECT doc_a, doc_b, CAST(round(jaccard, 4) AS DOUBLE) AS jaccard_r, jaccard >= 0.5 AS is_dup
        |FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Min-label connected components over an undirected edge table
    * (`edgesBoth` must carry both directions as (node, nbr)). Each
    * iteration does a neighbor-min propagation (one shuffle-by-key agg)
    * FOLLOWED by one pointer-jumping step (label := label of label — path
    * halving), so convergence is O(log diameter) instead of O(diameter):
    * a chain of 64 near-dups resolves in ~6 iterations, not 64
    * (TextDedupSpec pins the bound). Convergence test: labels only ever
    * decrease, so the label SUM strictly decreases until the fixpoint —
    * a null-safe scalar aggregate over the iteration's cache.
    *
    * ONE substantive driver action per iteration (r5 verdict #1): the
    * iteration's labels land in a single EAGER localCheckpoint (internal-row
    * cache + lineage cut, released deterministically through CacheOps), and
    * the convergence sum is a scan of that cache. The r5 shape rebased
    * through `df.rdd` instead, which (a) forced a full InternalRow→Row
    * conversion both ways and cached Java Row objects, and (b) under AQE
    * ran each rebase's shuffle stages as eager jobs — three dispatches plus
    * two row-format round-trips per iteration, the measured ~2× q34/q55
    * regression. The pointer jump self-joins `prop` without materializing
    * it: both sides share the identical Exchange subtree, which Spark's
    * exchange reuse evaluates once.
    *
    * Returns (labels (node, label), iterations, release) — `release` drops
    * the final label table's checkpoint cache NOW (callers drain first:
    * a local checkpoint has no recompute lineage).
    */
  private[graft] def connectedComponents(
      spark: SparkSession,
      edgesBoth: DataFrame
  ): (DataFrame, Int, () => Unit) = {
    // decimal(38,0) accumulator: a 10^10-node graph carrying ~10^10 ids sums
    // to ~10^20 > Long.MAX, which ANSI-mode Spark turns into a runtime
    // ArithmeticException (TextDedupSpec pins ids near Long.MAX/n)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    // a localCheckpoint's LogicalRDD keeps the source plan's attribute ids
    // and origin constraints; referencing one checkpoint from BOTH branches
    // of a union trips Catalyst's union constraint rewrite. The self-union
    // ("keep your own label") is therefore folded into the EDGE table as
    // self-loops, built once: min over neighbors' labels then includes the
    // node's own label through its (node, node) edge — identical algebra,
    // one union and one plan-reference fewer per iteration. The re-alias
    // projection after each checkpoint mints fresh ids for the remaining
    // join references.
    def fresh(df: DataFrame): DataFrame =
      df.select(col("node").as("node"), col("label").as("label"))
    val nodes = edgesBoth.select(col("node")).distinct()
    val (edgesLoop, relEdges) = graft.core.CacheOps.checkpointReleasable(
      edgesBoth.union(nodes.select(col("node"), col("node").as("nbr")))
    )
    // the initial labels are a cheap filter over the edgesLoop cache (the
    // self-loop rows ARE the node set) — no checkpoint of their own
    var labels = edgesLoop.filter(col("node") === col("nbr")).select(col("node"), col("node").as("label"))
    var relLabels: () => Unit = () => ()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged) {
      val prop = edgesLoop
        .join(labels, Seq("node"))
        .select(col("nbr").as("node"), col("label"))
        .groupBy("node")
        .agg(min(col("label")).as("label"))
      // pointer jump (path halving): every label value is itself a node
      // (labels start as node ids and min() preserves membership), so the
      // lookup join is total; label(label(x)) ≤ label(x) by monotonicity
      val jump = prop
        .as("a")
        .join(prop.as("b"), col("a.label") === col("b.node"))
        .select(col("a.node").as("node"), least(col("a.label"), col("b.label")).as("label"))
      val (jumpCp, relJump) = graft.core.CacheOps.checkpointReleasable(jump)
      val s = labelSum(jumpCp)
      relLabels()
      labels = fresh(jumpCp)
      relLabels = relJump
      iter += 1
      if (s.compareTo(prevSum) == 0) converged = true else prevSum = s
    }
    // the loop always runs at least once, so the returned labels are the
    // last jump CHECKPOINT (lineage-free) — edgesLoop can release now
    relEdges()
    (labels, iter, relLabels)
  }

  /** q34 — dedup cluster resolution: min-id connected components over the
    * verified pairs (pointer-jumping label propagation in Spark vs a
    * recursive transitive-closure CTE in DuckDB), keeper = smallest doc_id.
    * The final cluster list (the query's output) is collected and
    * re-created as a local relation when small, so every cached
    * intermediate can be released before returning — no cached RDDs
    * outlive the query; above the gate the distributed plan is returned
    * (caches released, AQE exchange reuse covers the recompute).
    */
  def q34DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val (vp, relVp) = verifiedPairsReleasable(t(dir, "documents"))
    val dup = vp.filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
    // the lazy edge plan materializes exactly once, into CC's own edgesLoop
    // CHECKPOINT at entry — the verify caches stay alive until CC returns
    // and release then (a plain .persist() here once let a CC-loop cache
    // miss recompute through already-released checkpoints; the checkpoint
    // chain cannot)
    val edgesBoth = dup
      .select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      .union(dup.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
    val (labels, _, release) = connectedComponents(spark, edgesBoth)
    relVp()
    val out = labels
      .groupBy(col("label").as("keeper"))
      .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_member"))
    val nLabeled = labels.count()
    if (nLabeled <= 2000000L) {
      val rows = out.as[(Long, Long, Long)].collect().sortBy(_._1)
      release()
      spark.createDataset(rows.toIndexedSeq).toDF("keeper", "n_members", "max_member")
    } else {
      // labels is a local checkpoint (no recompute lineage): the returned
      // plan still reads it, so release is left to the ContextCleaner on
      // this rare huge-output path
      out.orderBy("keeper")
    }
  }
  /** Oracle CTE chain through the resolved `labels(node, label)` dedup
    * components — shared by q34 and the quality-keeper variant (q55), so
    * the two oracles cannot drift on what a cluster IS.
    */
  private[graft] val dedupClusterSqlPrefix: String =
    shingleSqlPrefix +
      """,
        |dup AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.5),
        |e AS (SELECT doc_a AS x, doc_b AS y FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach AS (WITH RECURSIVE r(x, y) AS (SELECT x, y FROM e UNION SELECT r.x, e.y FROM r JOIN e ON r.y = e.x)
        |          SELECT x, y FROM r),
        |labels AS (SELECT x AS node, least(x, min(y)) AS label FROM reach GROUP BY x)""".stripMargin
  val q34Sql: String =
    dedupClusterSqlPrefix +
      """
        |SELECT label AS keeper, count(*) AS n_members, max(node) AS max_member
        |FROM labels GROUP BY label ORDER BY keeper""".stripMargin

  /** q46 — batch ANN: top-3 cosine neighbors for a SET of query vectors in
    * one bucketed join (the production shape — per-query probes like
    * q26/q28/q38 don't amortize over a 10^9-query batch; a
    * queries ⋈ candidates equi-join on the sign-code bucket does).
    * 4-bit blocking → exact double-accumulated cosine on same-bucket
    * candidates → windowed top-3 per query. Recall is the blocking's
    * documented trade, identical in the oracle.
    */
  def q46BatchAnn(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val dot = expr(
      "aggregate(zip_with(qe, ce, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    val nq = expr("aggregate(qe, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val nc = expr("aggregate(ce, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("cand_id").asc)
    // candidate generation (incl. the dense-block cap) is batchAnnCandidates
    // — the ONE implementation TextDedupSpec pins; this query only scores it
    batchAnnCandidates(t(dir, "embeddings"), bits = 4, maxBucket = LshMaxBucket, queryIds = (1L to 5L))
      .withColumn("cos_r", round(dot / (sqrt(nq) * sqrt(nc)), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("rn").cast("long").as("rn"), col("cand_id"), col("cos_r"))
      .orderBy("qid", "rn")
  }
  val q46Sql: String = {
    val b = sqlSignBucket(4)
    s"""WITH e AS (SELECT vec_id, embedding, $b AS bucket FROM embeddings),
       |cap AS (SELECT bucket, vec_id, embedding,
       |               row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
       |        FROM e),
       |cand AS (SELECT q.vec_id AS qid, c.vec_id AS cand_id, q.embedding AS qe, c.embedding AS ce
       |         FROM e q JOIN cap c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id AND c.rn <= $LshMaxBucket
       |         WHERE q.vec_id BETWEEN 1 AND 5),
       |pairs AS (SELECT qid, cand_id, CAST(unnest(qe) AS DOUBLE) AS x, CAST(unnest(ce) AS DOUBLE) AS y FROM cand),
       |sums AS (SELECT qid, cand_id, sum(x*y) AS dot, sum(x*x) AS nq, sum(y*y) AS nc FROM pairs GROUP BY qid, cand_id),
       |scored AS (SELECT qid, cand_id, CAST(round(dot / (sqrt(nq) * sqrt(nc)), 4) AS DOUBLE) AS cos_r FROM sums),
       |ranked AS (SELECT qid, cand_id, cos_r,
       |                  row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand_id) AS rn
       |           FROM scored)
       |SELECT qid, CAST(rn AS BIGINT) AS rn, cand_id, cos_r FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** q45 — BPE-style pre-tokenization counts: the GPT-2-family
    * pre-tokenizer splits text into word / number / punctuation chunks
    * before byte-pair merging; this is that split as a portable regex
    * (letters+ | digits+ | single non-alnum-non-space), lowercased, with
    * per-doc total/distinct chunk counts and the corpus-level
    * total-token histogram a tokenizer-training pass needs. Same regex
    * dialect in Spark (Java regex) and DuckDB (RE2), so the oracle is
    * value-level.
    */
  def q45RegexTokens(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    t(dir, "documents")
      .select(col("doc_id"), expr(s"regexp_extract_all(lower(text), '$pat', 0)").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct")
      )
      .groupBy("n_tokens")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"), max(col("n_distinct")).as("max_distinct"))
      .orderBy("n_tokens")
  }
  val q45Sql: String =
    """WITH tok AS (SELECT doc_id,
      |                    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
      |                    CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_distinct
      |             FROM documents)
      |SELECT n_tokens, count(*) AS n_docs, min(doc_id) AS first_doc, max(n_distinct) AS max_distinct
      |FROM tok GROUP BY n_tokens ORDER BY n_tokens""".stripMargin

  /** q44 — trigram full-text search: the READ path for the reference's
    * write-only FTS5 trigram profile index
    * (/root/reference/pkg/store/schema.sql:12-25 builds the index; nothing
    * in pkg/ ever queries it). Build a distinct (trigram → doc) postings
    * table — shuffle-by-trigram, the inverted-index shape — and rank docs
    * by how many of the query's character trigrams they contain. The query
    * string derives from doc 0's text prefix (deterministic; the oracle
    * mirrors it with a scalar subquery), its trigram set is tiny and
    * broadcasts into the probe join. At corpus scale the postings build is
    * the one-time index pass (bucket it by `g` for reuse) and each search
    * touches only the query trigrams' posting lists.
    */
  /** The deterministic search string q44/q48 share: doc 0's lowercased
    * 24-char prefix (the oracle mirrors it with a scalar subquery).
    */
  private def searchQueryText(dir: String)(implicit spark: SparkSession): String =
    t(dir, "documents")
      .filter(col("doc_id") === 0)
      .select(lower(substring(col("text"), 1, 24)))
      .collect()
      .headOption
      .map(_.getString(0))
      .getOrElse(
        throw new IllegalArgumentException(
          s"q44/q48: no document with doc_id = 0 in $dir/documents.parquet — the query text derives from it (oracle mirrors the same scalar subquery)"
        )
      )

  def q44TrigramSearch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    // positions capped at 2000 ON BOTH SIDES (the oracle's bounded-range
    // trick can't enumerate unbounded lengths) — an indexing-prefix bound,
    // mirrored exactly so long documents can't desynchronize the oracle
    val docs = graft.core.ScanOps
      .spread(t(dir, "documents"))
      .select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 3)
    val tri = docs.select(
      col("doc_id"),
      explode(array_distinct(expr("transform(sequence(1, least(length(t) - 2, 2000)), i -> substring(t, i, 3))"))).as("g")
    )
    val qText = searchQueryText(dir)
    val qTri = qText.sliding(3).filter(_.length == 3).toSeq.distinct
    tri
      .join(broadcast(qTri.toDF("g")), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_match"))
      .withColumn("score", round(col("n_match").cast("double") / lit(qTri.size.toDouble), 4))
      .orderBy(col("n_match").desc, col("doc_id").asc)
      .limit(10)
  }
  val q44Sql: String =
    """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE len(text) >= 3),
      |tri AS (SELECT DISTINCT doc_id, substr(t, i, 3) AS g
      |        FROM d, (SELECT unnest(range(1, 2001)) AS i) r WHERE i + 2 <= len(t)),
      |q AS (SELECT DISTINCT substr(qt, i, 3) AS g
      |      FROM (SELECT (SELECT lower(substr(text, 1, 24)) FROM documents WHERE doc_id = 0) AS qt),
      |           (SELECT unnest(range(1, 23)) AS i) WHERE i + 2 <= len(qt)),
      |m AS (SELECT doc_id, count(*) AS n_match FROM tri JOIN q USING (g) GROUP BY doc_id)
      |SELECT doc_id, n_match,
      |       CAST(round(CAST(n_match AS DOUBLE) / (SELECT count(*) FROM q), 4) AS DOUBLE) AS score
      |FROM m ORDER BY n_match DESC, doc_id LIMIT 10""".stripMargin

  /** q48 — index-backed trigram search: q44's exact query served from the
    * PERSISTED bucketed postings index (TrigramIndex) instead of a corpus
    * scan. The index builds once per corpus (first call; ~q44's postings
    * pass) and every later call is probe-only — InSet(g) bucket pruning +
    * row-group skipping make the read O(query trigrams), records-read-
    * asserted by TrigramIndexSpec. Same output as q44, so the SAME
    * value-level oracle pins the indexed path (the oracle recomputes from
    * the documents table — it cannot see the index, which is the point).
    */
  def q48IndexedSearch(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val path = TrigramIndex.defaultPath(dir)
    val stamp = TrigramIndex.corpusFingerprint(spark, s"$dir/documents.parquet")
    if (!TrigramIndex.current(spark, path, stamp))
      TrigramIndex.build(spark, t(dir, "documents"), path, corpusStamp = stamp)
    TrigramIndex.search(spark, path, searchQueryText(dir), topK = 10)
  }
  val q48Sql: String = q44Sql

  /** Core of q47: rank corpus docs by 3-gram shingle overlap against each
    * benchmark doc. `benchMaxId` splits the documents table (doc_id <
    * benchMaxId = the held-out eval set); shingles whose CORPUS document
    * frequency exceeds `dfCap` are dropped before matching (IDF-style
    * pruning, the same mega-key guard as the LSH caps: a trigram present in
    * thousands of docs is boilerplate, carries no contamination signal, and
    * would otherwise be one quadratic shuffle key). Exposed for
    * TextDedupSpec's planted-contamination fixture.
    */
  private[graft] def decontaminationScan(
      docs: DataFrame,
      benchMaxId: Long,
      dfCap: Int,
      topK: Int
  ): DataFrame = {
    val bsh = shingles(docs.filter(col("doc_id") < benchMaxId)).select(col("doc_id").as("bench_id"), col("tok"))
    val bSize = bsh.groupBy("bench_id").agg(count(lit(1)).as("n_bench"))
    // the DF cap via groupBy + anti-join, NOT a count-over-window: a window
    // partitioned by tok has no partial aggregation, so a boilerplate
    // shingle in 10^8 docs lands all its rows on ONE task just to be
    // discarded; the groupBy collapses per-partition (map-side combine) and
    // the anti-join is AQE-skew-splittable (strategy left to Catalyst — the
    // over-cap list is small in practice and broadcasts)
    val shCorpus = shingles(docs.filter(col("doc_id") >= benchMaxId))
    val hotToks = shCorpus.groupBy("tok").agg(count(lit(1)).as("__df")).filter(col("__df") > dfCap).select("tok")
    val csh = shCorpus.join(hotToks, Seq("tok"), "left_anti")
    val w = Window.partitionBy(col("bench_id")).orderBy(col("n_common").desc, col("doc_id").asc)
    csh
      .join(broadcast(bsh), Seq("tok"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(bSize), Seq("bench_id"))
      .withColumn("overlap_r", round(col("n_common").cast("double") / col("n_bench"), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("bench_id"), col("rn").cast("long").as("rn"), col("doc_id"), col("n_common"), col("overlap_r"))
      .orderBy("bench_id", "rn")
  }

  /** q47 — decontamination scan (training-data hygiene's most-asked query):
    * for each doc in the held-out "benchmark" set (doc_id < 16 — the
    * deterministic eval-set stand-in), the top-5 corpus docs by 3-gram
    * shingle overlap, with the contamination ratio |∩| / |bench shingles|.
    * Scale shape: the benchmark side is small by definition → its shingle
    * set broadcasts into the probe join; the corpus side streams through
    * one shuffle-by-shingle; boilerplate shingles are DF-capped (mirrored
    * in the oracle's HAVING) so no shuffle key goes quadratic. A planted
    * exact copy surfaces at overlap_r = 1.0 (TextDedupSpec pins it).
    */
  def q47Decontamination(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    decontaminationScan(t(dir, "documents"), benchMaxId = 16L, dfCap = LshMaxBucket, topK = 5)
  }
  val q47Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS tok
       |       FROM w, (SELECT unnest(range(1, 4001)) AS i) r WHERE i + 2 <= len(ws)),
       |bsh AS (SELECT doc_id AS bench_id, tok FROM sh WHERE doc_id < 16),
       |bsize AS (SELECT bench_id, count(*) AS n_bench FROM bsh GROUP BY bench_id),
       |csh0 AS (SELECT doc_id, tok FROM sh WHERE doc_id >= 16),
       |rare AS (SELECT tok FROM csh0 GROUP BY tok HAVING count(*) <= $LshMaxBucket),
       |csh AS (SELECT c.doc_id, c.tok FROM csh0 c JOIN rare USING (tok)),
       |m AS (SELECT c.doc_id, b.bench_id, count(*) AS n_common FROM csh c JOIN bsh b USING (tok) GROUP BY c.doc_id, b.bench_id),
       |r AS (SELECT bench_id, doc_id, n_common,
       |             CAST(round(CAST(n_common AS DOUBLE) / s.n_bench, 4) AS DOUBLE) AS overlap_r,
       |             row_number() OVER (PARTITION BY bench_id ORDER BY n_common DESC, doc_id) AS rn
       |      FROM m JOIN bsize s USING (bench_id))
       |SELECT bench_id, CAST(rn AS BIGINT) AS rn, doc_id, n_common, overlap_r
       |FROM r WHERE rn <= 5 ORDER BY bench_id, rn""".stripMargin

  /** q49 — streaming incremental LSH dedup, batch-mode replay: the
    * documents table arrives in 3 deterministic micro-batches (doc_id mod
    * 3) and each batch's near-dup pairs are detected incrementally against
    * the postings of the batches before it (StreamDedup.dedupBatch — the
    * SAME function the foreachBatch runner executes; StreamDedupSpec pins
    * the replay against a real multi-micro-batch stream). The union of the
    * per-batch emissions equals the batch q33 pipeline's verified pair set
    * whenever no band bucket exceeds the cap (guaranteed at oracle scale:
    * fewer total docs than the cap), so the q33 DuckDB oracle pins the
    * incremental path value-level.
    */
  def q49StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val docs = t(dir, "documents").select("doc_id", "text")
    var postings: Option[DataFrame] = None
    val releases = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val emitted = (0 until 3).map { k =>
      val chunk = docs.filter(pmod(col("doc_id"), lit(3)) === k)
      // prior docs need no materialized state table in the replay: the
      // union of chunks 0..k-1 IS the filter pmod < k over the same scan
      // (the streaming runner reads its parquet store instead) — one fewer
      // checkpoint job per micro-batch (r6)
      val seen = if (k == 0) None else Some(docs.filter(pmod(col("doc_id"), lit(3)) < k))
      val (pairs, np, relBatch) = graft.streaming.StreamDedup.dedupBatch(spark, chunk, postings, seen)
      releases += relBatch
      // materialize the accumulated postings once per micro-batch (the role
      // the streaming runner's parquet write plays) so later batches never
      // recompute earlier batches' signatures; released once the emissions
      // are drained below
      val (postCp, rp) = graft.core.CacheOps.checkpointReleasable(
        postings.map(_.unionByName(np)).getOrElse(np)
      )
      releases += rp
      postings = Some(postCp)
      pairs
    }
    // same drain-then-release discipline as q34: emissions are O(capped
    // candidates); collect when small, otherwise keep a single O(pairs)
    // checkpoint alive and free every intermediate either way
    graft.core.CacheOps.drain(emitted.reduce(_ unionByName _), releases.toSeq: _*)
  }
  val q49Sql: String = q33Sql

  /** Word n-grams of the tokenized doc (`ws`), 1-based positions, capped at
    * [[NGramPrefixCap]] positions — the same indexing-prefix bound as q44's
    * trigrams, mirrored in the oracles' `least(...)`, so a pathological
    * mega-document bounds its per-row explode instead of dominating a task.
    * Callers must guarantee `size(ws) >= n` (Spark's `sequence(1, k)` turns
    * DESCENDING for k < 1, unlike DuckDB's empty `range`).
    */
  private[graft] val NGramPrefixCap = 5000
  private[graft] def wordGrams(n: Int, wsCol: String = "ws"): Column = {
    val parts = (0 until n).map(j => s"element_at($wsCol, i + $j)").mkString(", ' ', ")
    expr(s"transform(sequence(1, least(size($wsCol) - ${n - 1}, $NGramPrefixCap)), i -> concat($parts))")
  }

  /** q50 — repetition quality signals (the Gopher-rule family: Rae et al.
    * 2021 §A1.1 filters on most-common-2-gram and duplicate-n-gram
    * fractions; occurrence-fraction form here). Two signals per doc:
    * `top2gram_frac` (occurrences of the doc's most frequent word 2-gram /
    * total 2-grams — boilerplate repeats one phrase) and `dup3gram_frac`
    * (fraction of 3-gram occurrences beyond each gram's first — template
    * churn). dup3 is PER-ROW NATIVE (array_distinct on the gram array — no
    * shuffle); top2 needs per-gram counts, one explode into a partially
    * aggregated (doc_id, gram) count — keys are doc-unique so the shuffle
    * is skew-free by construction. Flag thresholds documented inline and
    * mirrored unrounded in the oracle.
    */
  def q50Repetition(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    repetitionSignals(t(dir, "documents"))
  }

  /** Core of q50 over any (doc_id, text) frame — spec-testable with planted
    * repetitive docs (the corpus fixtures are word soup and never trip the
    * flags, so the flag semantics are pinned by RepetitionSpec instead).
    */
  private[graft] def repetitionSignals(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val d3 = docs
      .select(col("doc_id"), wordGrams(3).as("g3"))
      .select(
        col("doc_id"),
        (lit(1.0) - size(array_distinct(col("g3"))).cast("double") / size(col("g3")).cast("double")).as("dup3")
      )
    val top2 = docs
      .select(col("doc_id"), explode(wordGrams(2)).as("g"))
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("top_n"), sum(col("n")).as("tot"))
      .select(col("doc_id"), (col("top_n").cast("double") / col("tot").cast("double")).as("top2"))
    d3.join(top2, "doc_id")
      .select(
        col("doc_id"),
        round(col("top2"), 4).as("top2gram_frac"),
        round(col("dup3"), 4).as("dup3gram_frac"),
        // Gopher-shaped gates: one dominant phrase (>20% of 2-grams) or
        // heavy 3-gram recycling (>40% repeat occurrences)
        (col("top2") > 0.2 || col("dup3") > 0.4).as("flagged")
      )
      .orderBy("doc_id")
  }
  val q50Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |w3 AS (SELECT * FROM w WHERE len(ws) >= 3),
       |d3 AS (SELECT doc_id,
       |              1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) AS dup3
       |       FROM (SELECT doc_id,
       |                    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                     FOR i IN range(1, least(len(ws) - 1, ${NGramPrefixCap + 1}))] AS g3
       |             FROM w3)),
       |g2 AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
       |                              FOR i IN range(1, least(len(ws), ${NGramPrefixCap + 1}))]) AS g
       |       FROM w3),
       |c2 AS (SELECT doc_id, g, count(*) AS n FROM g2 GROUP BY 1, 2),
       |t2 AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top2 FROM c2 GROUP BY 1)
       |SELECT doc_id,
       |       CAST(round(top2, 4) AS DOUBLE) AS top2gram_frac,
       |       CAST(round(dup3, 4) AS DOUBLE) AS dup3gram_frac,
       |       top2 > 0.2 OR dup3 > 0.4 AS flagged
       |FROM d3 JOIN t2 USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q51 — deterministic content-hash train/val/test split: bucket =
    * first-4-hex-chars of md5(text) as an integer mod 100 (the md5 parity
    * trick, see the object Scaladoc), 90/5/5 assignment. Content-hashed
    * splits are the reproducible-pipeline staple: re-runs, re-shards, and
    * incremental ingests all land a doc in the SAME split with zero
    * coordination state, and exact duplicates land together (no train/test
    * leakage through copies). Per (source, split) accounting — one
    * skew-free 15-key aggregation; the assignment itself is a pure
    * projection that fuses into any downstream scan.
    */
  def q51HashSplit(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    hashSplit(t(dir, "documents"))
  }

  /** The q51 split assignment as a column over `text` — the row-level form
    * the corpus-export pipeline stamps onto each kept doc.
    */
  private[graft] def splitCol: Column = {
    val b = conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10).cast("long") % 100
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** Core of q51 over any (doc_id, text, source, n_chars) frame — the
    * assignment is [[splitCol]], THE split formula (one definition; the
    * export pipeline stamps the same column).
    */
  private[graft] def hashSplit(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"), col("n_chars"), splitCol.as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"), min(col("doc_id")).as("first_doc"))
      .orderBy("source", "split")
  val q51Sql: String =
    """WITH s AS (SELECT *, CAST('0x' || substring(md5(text), 1, 4) AS BIGINT) % 100 AS b FROM documents)
      |SELECT source,
      |       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
      |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS first_doc
      |FROM s GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  /** q52 — quality-filter cascade with drop accounting: the corpus-curation
    * front door (FineWeb/CCNet shape) — an ordered rule chain where each
    * doc gets its FIRST failing rule as the drop reason (`kept` if none),
    * then per-reason counts so a pipeline run reports exactly where its
    * volume went. Rules reuse the signals of q20 (length, diversity), q50
    * (3-gram repetition, per-row form), and q21 (language heuristic); the
    * whole cascade is one pure projection (no UDFs, codegen-fused with the
    * scan) plus a 6-key aggregation. dup3 guards size(ws) < 3 explicitly —
    * Spark's `sequence(1, k)` turns descending for k < 1.
    */
  def q52FilterCascade(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    filterCascade(graft.core.ScanOps.spread(t(dir, "documents")))
  }

  /** Core of q52 over any (doc_id, text) frame — spec-testable with docs
    * planted to hit each rule (and the first-failing-rule ordering).
    */
  private[graft] def filterCascade(documents: DataFrame): DataFrame =
    cascadeVerdicts(documents)
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("verdict")

  /** Per-doc first-failing-rule verdict (doc_id, verdict) — the row-level
    * form q52 aggregates.
    */
  private[graft] def cascadeVerdicts(documents: DataFrame): DataFrame =
    withVerdict(documents).select(col("doc_id"), col("verdict"))

  /** `documents` with a `verdict` column appended (all input columns
    * preserved) — the corpus-export pipeline's form: the cascade is a pure
    * projection, so stamping it beats recomputing-and-joining. `skipRules`
    * removes named rules from the chain (first-failing order preserved) —
    * e.g. the crawl fixture corpus is link soup with no English stopword
    * markers, so its curation skips `non_english`; q52 always runs the
    * full chain.
    */
  private[graft] val CascadeRuleNames: Seq[String] =
    Seq("too_short", "too_long", "low_diversity", "repetitive", "non_english")

  private[graft] def withVerdict(documents: DataFrame, skipRules: Set[String] = Set.empty): DataFrame = {
    val unknown = skipRules.diff(CascadeRuleNames.toSet)
    require(unknown.isEmpty, s"unknown cascade rules: ${unknown.mkString(",")}")
    // helper columns get reserved names so a caller corpus that already has
    // a `len`/`ws` column is carried through untouched ("every other column
    // is carried through" is CorpusPipeline.curate's contract)
    val lenC = "__graft_len"
    val wsC = "__graft_ws"
    val docs = documents
      .withColumn(lenC, length(col("text")))
      .withColumn(wsC, split(col("text"), " "))
    val dup3 = when(
      size(col(wsC)) >= 3, {
        val g3 = wordGrams(3, wsC)
        lit(1.0) - size(array_distinct(g3)).cast("double") / size(g3).cast("double")
      }
    ).otherwise(lit(0.0))
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (col(lenC) < 100),
      "too_long" -> (col(lenC) > 2000),
      "low_diversity" ->
        (size(array_distinct(col(wsC))).cast("double") / size(col(wsC)).cast("double") < 0.3),
      "repetitive" -> (dup3 > 0.5),
      "non_english" ->
        !(col("text").contains(" the ") || col("text").startsWith("the ") || col("text").contains(" a "))
    )
    val verdict = rules.filterNot(r => skipRules.contains(r._1)).foldRight(lit("kept")) {
      case ((name, cond), rest) => when(cond, name).otherwise(rest)
    }
    docs.withColumn("verdict", verdict).drop(lenC, wsC)
  }
  val q52Sql: String =
    s"""WITH w AS (SELECT doc_id, text, length(text) AS len, string_split(text, ' ') AS ws FROM documents),
       |sig AS (SELECT doc_id, len, text,
       |               CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS diversity,
       |               CASE WHEN len(ws) >= 3 THEN
       |                 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
       |               ELSE 0.0 END AS dup3
       |        FROM (SELECT *, [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                         FOR i IN range(1, least(len(ws) - 1, ${NGramPrefixCap + 1}))] AS g3
       |              FROM w)),
       |v AS (SELECT doc_id,
       |             CASE WHEN len < 100 THEN 'too_short'
       |                  WHEN len > 2000 THEN 'too_long'
       |                  WHEN diversity < 0.3 THEN 'low_diversity'
       |                  WHEN dup3 > 0.5 THEN 'repetitive'
       |                  WHEN NOT (text LIKE '% the %' OR text LIKE 'the %' OR text LIKE '% a %') THEN 'non_english'
       |                  ELSE 'kept' END AS verdict
       |      FROM sig)
       |SELECT verdict, count(*) AS n_docs, min(doc_id) AS first_doc
       |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin

  /** PII regexes, portable between Java regex (Spark) and RE2 (DuckDB):
    * char classes, bounded repeats, no backreferences/boundaries. Email
    * before phone in the redaction chain (mirrored in the oracle).
    */
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** q53 — PII detection + redaction with per-segment accounting, the
    * training-data hygiene scrub (emails, phone numbers). The test corpus
    * carries no organic PII (pure word soup), so the op runs over a
    * deterministic contact-note table derived from `customer` (name →
    * email, custkey → formatted phone; construction mirrored verbatim in
    * the oracle) — detection AND the redacted text are then value-level
    * pinned (an md5-prefix checksum over every redacted note), not a
    * trivially-zero pass. Pure projections + a 5-key aggregation; at
    * corpus scale the scrub fuses into the scan with no shuffle beyond
    * the final stats. TextFilterSpec pins the edge cases (multiple PII
    * per note, none, adjacency).
    */
  def q53PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    piiRedact(contactNotes(t(dir, "customer")))
  }

  /** Deterministic contact notes from `customer`: one per row, each with
    * one synthesized email and one 3-3-4 phone.
    */
  private[graft] def contactNotes(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("note_id"),
      col("c_mktsegment").as("segment"),
      concat(
        lit("reach "),
        lower(col("c_name")),
        lit(" at "),
        regexp_replace(lower(col("c_name")), "#", "."),
        lit("@"),
        lower(col("c_mktsegment")),
        lit(".example or "),
        lpad((col("c_custkey") * 37 % 900 + 100).cast("string"), 3, "0"),
        lit("-"),
        lpad((col("c_custkey") * 59 % 1000).cast("string"), 3, "0"),
        lit("-"),
        lpad((col("c_custkey") * 97 % 10000).cast("string"), 4, "0")
      ).as("note")
    )

  /** Core of q53 over any (note_id, segment, note) frame. */
  private[graft] def piiRedact(notes: DataFrame): DataFrame = {
    val red = regexp_replace(regexp_replace(col("note"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    notes
      .select(
        col("segment"),
        col("note").rlike(EmailRe).as("has_email"),
        col("note").rlike(PhoneRe).as("has_phone"),
        red.as("red")
      )
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n_notes"),
        sum(when(col("has_email"), 1L).otherwise(0L)).as("n_email"),
        sum(when(col("has_phone"), 1L).otherwise(0L)).as("n_phone"),
        sum(length(col("red"))).as("red_chars"),
        sum(conv(substring(md5(col("red").cast("binary")), 1, 8), 16, 10).cast("long")).as("red_check")
      )
      .orderBy("segment")
  }
  val q53Sql: String =
    """WITH n AS (SELECT c_custkey AS note_id, c_mktsegment AS segment,
      |                  'reach ' || lower(c_name) || ' at ' || replace(lower(c_name), '#', '.') ||
      |                  '@' || lower(c_mktsegment) || '.example or ' ||
      |                  lpad(CAST(c_custkey * 37 % 900 + 100 AS VARCHAR), 3, '0') || '-' ||
      |                  lpad(CAST(c_custkey * 59 % 1000 AS VARCHAR), 3, '0') || '-' ||
      |                  lpad(CAST(c_custkey * 97 % 10000 AS VARCHAR), 4, '0') AS note
      |           FROM customer),
      |r AS (SELECT segment,
      |             regexp_matches(note, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') AS has_email,
      |             regexp_matches(note, '[0-9]{3}-[0-9]{3}-[0-9]{4}') AS has_phone,
      |             regexp_replace(regexp_replace(note, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |                            '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
      |      FROM n)
      |SELECT segment, count(*) AS n_notes,
      |       CAST(sum(CASE WHEN has_email THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
      |       CAST(sum(CASE WHEN has_phone THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
      |       CAST(sum(length(red)) AS BIGINT) AS red_chars,
      |       CAST(sum(CAST('0x' || substring(md5(red), 1, 8) AS BIGINT)) AS BIGINT) AS red_check
      |FROM r GROUP BY segment ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- q80

  /** q80 — split-leakage audit: near-duplicate pairs that STRADDLE the
    * q51 content-hash train/val/test assignment. q47 scans for
    * contamination against an EXTERNAL benchmark set; this is the internal
    * complement — a near-dup of a training doc sitting in val/test leaks
    * the answer into evaluation. Exact duplicates can never leak here
    * (identical text ⇒ identical md5 ⇒ same split — the q51 guarantee);
    * what leaks is precisely the near-dup band (0.5 ≤ j < 1), which is why
    * the audit composes the VERIFIED LSH pairs (q33's capped
    * shingle→minhash→band machinery, reused as-is) with the q51
    * [[splitCol]] assignment — two doc-keyed broadcast-sized joins on top
    * of a pipeline whose scale story (bucket caps, map-side combine,
    * O(cap²·buckets) candidates) is already pinned by q33/q34. Emits the
    * actionable artifact: the offending pair, both splits, and the
    * verified similarity.
    */
  def q80SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = t(dir, "documents")
    val splits = docs.select(col("doc_id"), splitCol.as("split"))
    val (vp, rel) = verifiedPairsReleasable(docs)
    val out = vp
      .filter(col("jaccard") >= 0.5)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("split_a"),
        col("split_b"),
        round(col("jaccard"), 4).as("jaccard_r")
      )
      .orderBy("doc_a", "doc_b")
    graft.core.CacheOps.drain(out, rel)
  }
  val q80Sql: String =
    shingleSqlPrefix +
      """,
        |spl AS (SELECT doc_id, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |        FROM (SELECT doc_id, CAST('0x' || substring(md5(text), 1, 4) AS BIGINT) % 100 AS b FROM documents))
        |SELECT v.doc_a, v.doc_b, sa.split AS split_a, sb.split AS split_b,
        |       CAST(round(v.jaccard, 4) AS DOUBLE) AS jaccard_r
        |FROM verified v JOIN spl sa ON sa.doc_id = v.doc_a JOIN spl sb ON sb.doc_id = v.doc_b
        |WHERE v.jaccard >= 0.5 AND sa.split <> sb.split ORDER BY doc_a, doc_b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_dedup_exact" -> q18DedupExact _,
    "q19_token_count" -> q19TokenCount _,
    "q20_quality_score" -> q20QualityScore _,
    "q21_lang_id" -> q21LangId _,
    "q22_fingerprint" -> q22Fingerprint _,
    "q23_jaccard" -> q23Jaccard _,
    "q24_minhash_lsh" -> q24MinhashLsh _,
    "q25_simhash" -> q25Simhash _,
    "q26_ann_cosine_topk" -> q26AnnCosineTopK _,
    "q27_ivf_buckets" -> q27IvfBuckets _,
    "q28_ann_bucketed" -> q28AnnBucketed _,
    "q33_lsh_dedup_pairs" -> q33LshDedupPairs _,
    "q34_dedup_clusters" -> q34DedupClusters _,
    "q38_ann_multiprobe" -> q38AnnMultiProbe _,
    "q41_embedding_near_dup" -> q41EmbeddingNearDup _,
    "q42_simhash_near_dup" -> q42SimhashNearDup _,
    "q44_trigram_search" -> q44TrigramSearch _,
    "q45_regex_tokens" -> q45RegexTokens _,
    "q46_batch_ann" -> q46BatchAnn _,
    "q47_decontamination" -> q47Decontamination _,
    "q48_indexed_search" -> q48IndexedSearch _,
    "q49_stream_dedup" -> q49StreamDedup _,
    "q50_repetition" -> q50Repetition _,
    "q51_hash_split" -> q51HashSplit _,
    "q52_filter_cascade" -> q52FilterCascade _,
    "q53_pii_redact" -> q53PiiRedact _,
    "q80_split_leakage" -> q80SplitLeakage _
  )

  val oracles: Map[String, String] = Map(
    "q18_dedup_exact" -> q18Sql,
    "q19_token_count" -> q19Sql,
    "q20_quality_score" -> q20Sql,
    "q21_lang_id" -> q21Sql,
    "q22_fingerprint" -> q22Sql,
    "q23_jaccard" -> q23Sql,
    "q24_minhash_lsh" -> q24Sql,
    "q25_simhash" -> q25Sql,
    "q26_ann_cosine_topk" -> q26Sql,
    "q27_ivf_buckets" -> q27Sql,
    "q28_ann_bucketed" -> q28Sql,
    "q33_lsh_dedup_pairs" -> q33Sql,
    "q34_dedup_clusters" -> q34Sql,
    "q38_ann_multiprobe" -> q38Sql,
    "q41_embedding_near_dup" -> q41Sql,
    "q42_simhash_near_dup" -> q42Sql,
    "q44_trigram_search" -> q44Sql,
    "q45_regex_tokens" -> q45Sql,
    "q46_batch_ann" -> q46Sql,
    "q47_decontamination" -> q47Sql,
    "q48_indexed_search" -> q48Sql,
    "q49_stream_dedup" -> q49Sql,
    "q50_repetition" -> q50Sql,
    "q51_hash_split" -> q51Sql,
    "q52_filter_cascade" -> q52Sql,
    "q53_pii_redact" -> q53Sql,
    "q80_split_leakage" -> q80Sql
  )
}
