package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SignalQueries

/** Pins the corpus-signal operators (q58-q60) on planted fixtures:
  *
  *  - q58: a doc's repeated rare term ranks first; a term in more than
  *    half the corpus is excluded (the stopword/mega-key guard),
  *  - q59: a doc made of corpus-rare tokens scores strictly below a doc
  *    made of corpus-common tokens,
  *  - q60: the two-phase bucket-cutoff sample is row-identical to the
  *    naive per-stratum window under FORCED multi-partitioning, including
  *    a stratum smaller than k.
  */
class SignalQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.Sessions.local(4, appName = "signal-queries-spec")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sigfix").toString
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ---------------------------------------------------------------- q58

  test("q58: repeated rare term ranks first; corpus-majority terms are excluded") {
    // 'common' appears in all 4 docs (df=4 > N/2=2 → excluded);
    // doc 1 repeats 'zebra' (tf=3, df=1) — its top keyword.
    val dir = writeDocs(
      Seq(
        (1L, "common zebra zebra zebra apple", "en"),
        (2L, "common apple banana", "en"),
        (3L, "common cherry", "en"),
        (4L, "common dates", "en")
      )
    )
    val out = SignalQueries
      .q58TfIdfKeywords(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.contains((1L, 1L, "zebra")), s"zebra must be doc 1's top keyword: ${out.mkString(",")}")
    assert(!out.exists(_._3 == "common"), "a term in more than half the corpus is never a keyword")
    // 'apple' has df=2 (docs 1,2); 2*2 <= 4 so it stays eligible
    assert(out.exists(_._3 == "apple"))
  }

  // ---------------------------------------------------------------- q59

  test("q59: a doc of corpus-rare tokens scores below a doc of corpus-common tokens") {
    // 'aaa' dominates the corpus; doc 9's tokens are hapaxes.
    val commonText = Seq.fill(20)("aaa").mkString(" ")
    val dir = writeDocs(
      Seq(
        (1L, commonText, "en"),
        (2L, commonText, "en"),
        (3L, commonText, "en"),
        (9L, "qqq www eee rrr ttt", "en")
      )
    )
    val out = SignalQueries
      .q59UnigramLmScore(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    assert(out(9L) < out(1L), s"hapax doc must score lower: ${out.mkString(",")}")
    assert(out(1L) === out(2L) && out(2L) === out(3L), "identical docs score identically")
  }

  // ---------------------------------------------------------------- q61

  test("q61: Lloyd iterations recover a planted two-cluster structure from lowest-id init") {
    val sp = spark; import sp.implicits._
    // even ids huddle near the origin, odd ids near (10, 10, 10, 10);
    // init centroids are vec 0 (cluster A member) and vec 1 (cluster B
    // member), so two iterations must partition exactly by parity
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + (i % 7) * 0.01f, base - (i % 5) * 0.01f, base, base + 0.02f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = SignalQueries
      .kmeansAssign(emb, k = 2, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L) === ((20L, 0L, 38L)), s"cluster 0 = the 20 even ids: $out")
    assert(out(1L) === ((20L, 1L, 39L)), s"cluster 1 = the 20 odd ids: $out")
    // determinism: a re-run (fresh plan) yields the identical manifest
    val again = SignalQueries
      .kmeansAssign(emb.repartition(5), k = 2, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(again === out)
  }

  // ---------------------------------------------------------------- q62

  test("q62: recrawl tiers and clamps land exactly where the formula says") {
    val sp = spark; import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Double) = new java.sql.Timestamp(t0.getTime + (hours * 3600 * 1000).toLong)
    val events = Seq(
      (1L, at(0)), (1L, at(12)),            // span 0.5 d / 1 change → 0.5 → daily
      (2L, at(0)), (2L, at(480)),           // 20 d → monthly
      (3L, at(0)), (3L, at(0.01)),          // tiny span → clamped to 0.25 → daily
      (4L, at(0)),                          // single obs → excluded
      (5L, at(0)), (5L, at(72)), (5L, at(144)) // 6 d / 2 changes → 3 d → weekly
    ).toDF("user_id", "ts")
    val out = SignalQueries
      .recrawlIntervals(events)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getString(4))))
      .toMap
    assert(out === Map(
      1L -> ((0.5, "daily")),
      2L -> ((20.0, "monthly")),
      3L -> ((0.25, "daily")),
      5L -> ((3.0, "weekly"))
    ), s"got $out")
  }

  // ---------------------------------------------------------------- q63

  test("q63: HITS on a 2-hub star puts all authority on the shared target") {
    val sp = spark; import sp.implicits._
    // 1→3, 2→3, 3→4: after one full iteration the hubs are 1,2 (0.4 each)
    // and the dominant authority is 3 (0.8), all exactly computable
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = SignalQueries
      .hits(nodes, edges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(out(1L) === ((0.4, 0.0)))
    assert(out(2L) === ((0.4, 0.0)))
    assert(out(3L)._1 === 0.2 && out(3L)._2 === 0.8)
    assert(out(4L) === ((0.0, 0.2)))
  }

  // ---------------------------------------------------------------- q69

  test("q69: a planted collocation outranks pairs of individually common words") {
    // 'nnn yyy' always adjacent, each word nowhere else; 'the cat' also
    // co-occurs 3 times but 'the' floods the corpus → much lower PMI
    val dir = writeDocs(
      Seq(
        (1L, "the cat sat nnn yyy the dog ran the end", "en"),
        (2L, "the cat ate nnn yyy the bird the pond", "en"),
        (3L, "the cat ran nnn yyy the fish the lake", "en")
      )
    )
    val top = SignalQueries.q69PmiCollocations(spark, dir).select("a", "b", "cab").head()
    assert(top.getString(0) === "nnn" && top.getString(1) === "yyy" && top.getLong(2) === 3L, s"top pair: $top")
  }

  // ---------------------------------------------------------------- q60

  test("q60: two-phase stratified sample equals the naive window under forced partitioning") {
    val sp = spark; import sp.implicits._
    implicit val s: SparkSession = spark
    val rng = new scala.util.Random(7)
    // 3 strata: big (400), medium (120), tiny (5 < k) — tiny must yield all 5
    val rows = (0 until 400).map(i => (i.toLong, s"big doc $i ${rng.nextInt()}", "en")) ++
      (0 until 120).map(i => (1000L + i, s"med doc $i ${rng.nextInt()}", "de")) ++
      (0 until 5).map(i => (2000L + i, s"tiny doc $i", "zh"))
    val docs = rows.toDF("doc_id", "text", "lang").repartition(7)
    val k = 50
    val twoPhase = SignalQueries
      .stratifiedSample(docs, "lang", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val naive = docs
      .select(col("lang"), col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .withColumn("rn", row_number().over(Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("lang", "rn", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(twoPhase.toSeq === naive.toSeq)
    val byLang = twoPhase.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang === Map("en" -> 50, "de" -> 50, "zh" -> 5), s"exact-k per stratum (all of an under-k stratum): $byLang")
  }

  // ---------------------------------------------------------------- q73

  test("q73: window catches non-adjacent pairs with exact 1/d weights; beyond-window pairs don't count") {
    // 'aaa xxx bbb' x3: (aaa,bbb) at d=2 -> n=3, wt=3*(1/2)=1.5 — invisible
    // to q69's adjacent bigrams; (ccc,ddd) at d=6 > window 5 -> never a pair
    val dir = writeDocs(
      Seq(
        (1L, "aaa xxx bbb", "en"),
        (2L, "aaa xxx bbb", "en"),
        (3L, "aaa xxx bbb", "en"),
        (4L, "ccc fff ggg hhh iii jjj ddd", "en")
      )
    )
    val out = SignalQueries
      .q73Cooccurrence(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out((("aaa", "bbb"))) === ((3L, 1.5)), s"got $out")
    assert(out((("aaa", "xxx"))) === ((3L, 3.0)))
    assert(out((("xxx", "bbb"))) === ((3L, 3.0)))
    assert(!out.keySet.exists { case (a, b) => a == "ccc" && b == "ddd" }, s"beyond-window pair leaked: $out")
  }

  // ---------------------------------------------------------------- q74

  test("q74: target-like CONTENT outranks off-target content regardless of the doc's own label") {
    // target lang 'en' writes 'foo', others write 'bar'; doc 4 is labeled
    // zh but WRITTEN like the target — importance scoring is content-based,
    // so it must tie the genuine en doc and beat the bar docs
    val dir = writeDocs(
      Seq(
        (1L, "foo foo foo foo", "en"),
        (2L, "bar bar bar bar", "zh"),
        (3L, "bar bar bar bar", "zh"),
        (4L, "foo foo foo foo", "zh")
      )
    )
    val out = SignalQueries
      .q74DsirScore(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    assert(out(1L) === out(4L), s"same content must score identically: $out")
    assert(out(1L) > out(2L), s"target-like content must outrank off-target: $out")
    assert(out(2L) === out(3L))
  }

  // ---------------------------------------------------------------- q75

  test("q75: temperature mixing upsamples the small source and downsamples the big one") {
    // source 'big': 9 docs x 10 tokens; source 'tiny': 1 doc x 10 tokens —
    // nat shares 0.9/0.1; alpha=0.7 tempering must pull both toward the
    // middle: big epochs < 1 < tiny epochs, and shares stay normalized
    val ten = (0 until 10).map(i => s"tok$i").mkString(" ")
    val sp = spark; import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mixfix").toString
    ((0 until 9).map(i => (i.toLong, ten, "en", "big")) :+ ((9L, ten, "en", "tiny")))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SignalQueries
      .q75MixtureWeights(spark, tmp)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (bigTok, bigNat, bigAlpha, bigEp) = out("big")
    val (tinyTok, tinyNat, tinyAlpha, tinyEp) = out("tiny")
    assert(bigTok === 90L && tinyTok === 10L)
    assert(bigNat === 0.9 && tinyNat === 0.1)
    assert(bigAlpha < 0.9 && tinyAlpha > 0.1, s"tempering must compress the gap: $out")
    assert(bigEp < 1.0 && tinyEp > 1.0, s"epochs must up/downsample: $out")
  }

  // ---------------------------------------------------------------- q76

  test("q76: geometric frequencies yield a negative slope and exact vocab/token mass") {
    // 5 terms with freqs 16/8/4/2/1 → vocab 5, tokens 31, clean Zipf decay
    val text = Seq.fill(16)("aaa") ++ Seq.fill(8)("bbb") ++ Seq.fill(4)("ccc") ++
      Seq.fill(2)("ddd") ++ Seq("eee")
    val dir = writeDocs(Seq((1L, text.mkString(" "), "en")))
    val r = SignalQueries.q76ZipfDiagnostics(spark, dir).collect().head
    assert(r.getLong(0) === 5L, s"vocab: $r")
    assert(r.getLong(1) === 31L, s"tokens: $r")
    assert(r.getLong(2) === 5L, s"n_fit: $r")
    assert(r.getDouble(3) < -1.0, s"geometric decay is steeper than Zipf's -1: $r")
  }

  // ---------------------------------------------------------------- q72

  test("q72: near-dups drop within their trained cell, keeper is the lowest id, orthogonal vectors survive") {
    val sp = spark; import sp.implicits._
    // two well-separated cells seeded by init ids 0 and 1; one near-dup
    // planted in each; id 4 is orthogonal to everything → kept
    val emb = Seq(
      (0L, Seq(10.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 10.0, 0.0, 0.0)),
      (2L, Seq(9.9, 0.1, 0.0, 0.0)), // cell of 0, cos ≈ 1 → dropped, keeper 0
      (3L, Seq(0.1, 9.9, 0.0, 0.0)), // cell of 1, cos ≈ 1 → dropped, keeper 1
      (4L, Seq(0.0, 0.0, 10.0, 0.0)) // cos ≈ 0 with every cell-mate → kept
    ).toDF("vec_id", "embedding")
    val (assign, _, _) = SignalQueries.kmeansFit(emb, k = 2, iters = 2)
    val drops = SignalQueries
      .semanticDedupDrops(assign.select("cid", "vec_id", "v"), tau = 0.35, maxCell = 4096)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    assert(drops === Map(2L -> 0L, 3L -> 1L), s"got $drops")
  }

  test("q72: a collapsed mega-cell is truncated at the cap, dedup still removes the kept tail") {
    val sp = spark; import sp.implicits._
    // 60 identical vectors collapse into ONE cell; cap 50 → members 0-49
    // kept, 1-49 all drop with keeper 0, 50-59 are the documented
    // truncation recall trade (untouched, NOT deduped)
    val emb = (0L until 60L).map(i => (i, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val (assign, _, _) = SignalQueries.kmeansFit(emb, k = 2, iters = 2)
    val drops = SignalQueries
      .semanticDedupDrops(assign.select("cid", "vec_id", "v"), tau = 0.35, maxCell = 50)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    assert(drops === (1L to 49L).map(_ -> 0L).toMap, s"got $drops")
  }

  // ---------------------------------------------------------------- q78

  /** Plain-Scala replay of q78's 2-iteration hashed-LR training — written
    * independently of the Spark plan (loops + MessageDigest) so agreement
    * pins the whole trajectory, not just the plumbing.
    */
  private def lrReference(docs: Seq[(Long, String)]): Map[Long, (Double, Double)] = {
    val B = 256
    val lr = 5.0
    def md5bucket(term: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(term.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      java.lang.Integer.parseInt(hex.substring(0, 4), 16) % B
    }
    val re = "[a-z]{3,}".r
    val feats = docs.flatMap { case (id, text) =>
      val toks = re.findAllIn(text.toLowerCase).toSeq
      if (toks.isEmpty) None
      else {
        val ws = text.split(" ", -1)
        val y = if (2 * ws.distinct.length > ws.length) 1.0 else 0.0
        val cnt = toks.groupBy(md5bucket).view.mapValues(_.size.toDouble / toks.size).toMap
        Some((id, y, cnt))
      }
    }
    val n = feats.size.toDouble
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    var w = Map.empty[Int, Double].withDefaultValue(0.0)
    var b = 0.0
    (1 to 2).foreach { _ =>
      val grads = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
      var gb = 0.0
      feats.foreach { case (_, y, x) =>
        val p = sigmoid(x.map { case (h, v) => w(h) * v }.sum + b)
        x.foreach { case (h, v) => grads(h) += (p - y) * v }
        gb += p - y
      }
      w = w ++ grads.map { case (h, g) => h -> (w(h) - lr * g / n) }
      b -= lr * gb / n
    }
    feats.map { case (id, y, x) =>
      id -> (y, sigmoid(x.map { case (h, v) => w(h) * v }.sum + b))
    }.toMap
  }

  test("q78: Spark 2-iteration hashed-LR training matches an independent Scala replay, and separates the classes") {
    // y=1 docs (diverse vocab) vs y=0 docs (one word repeated); disjoint
    // vocab between classes so 2 GD steps must order the scores
    val rows = Seq(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel",
      2L -> "india juliet kilo lima mike november oscar papa",
      3L -> "quebec romeo sierra tango uniform victor whiskey xray",
      4L -> "spam spam spam spam spam spam spam spam",
      5L -> "junk junk junk junk junk junk junk junk",
      6L -> "noise noise noise noise noise noise noise noise",
      7L -> "1 2 3 4 5" // no [a-z]{3,} token — excluded from training and output
    )
    val sp = spark; import sp.implicits._
    val df = rows.toDF("doc_id", "text")
    val got = SignalQueries
      .logisticQuality(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    val ref = lrReference(rows)
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L), "doc 7 (no tokens) excluded, rest ordered")
    got.foreach { case (id, y, score, predicted) =>
      val (refY, refScore) = ref(id)
      assert(y.toDouble === refY, s"doc $id label")
      val want = BigDecimal(refScore).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score === want, s"doc $id: spark $score vs reference $want")
      assert(predicted === (score > 0.5), s"doc $id predicted flag")
    }
    val hi = got.filter(_._2 == 1L).map(_._3)
    val lo = got.filter(_._2 == 0L).map(_._3)
    assert(hi.nonEmpty && lo.nonEmpty && hi.min > lo.max,
      s"2 GD iterations must separate the planted classes: hi=$hi lo=$lo")
    // determinism: a re-run is row-identical
    val again = SignalQueries
      .logisticQuality(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    assert(again === got)
  }

  // ---------------------------------------------------------------- q79

  test("q79: the classic BPE example learns (e,s) then (es,t) then (l,o), ties lexicographic") {
    // Sennrich et al.'s worked vocabulary: low x5, lower x2, newest x6,
    // widest x3. Hand-computed: es=9 ties st=9 (e<s wins); after merging,
    // (es,t)=9 dominates; then lo=7 ties ow=7 (l<o wins).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val sp = spark; import sp.implicits._
    val got = SignalQueries
      .bpeMerges(Seq((1L, text)).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)
    ), s"got $got")
  }

  test("q79: overlapping pairs merge leftmost-greedy — 'aaa' under (a,a) becomes [aa, a]") {
    // word aaa x2 contributes (a,a) count 4 (two positions x two words);
    // the fold must leave [aa, a] (NOT triple-merge), so iteration 2 sees
    // candidate (aa,a) at count 2, outvoted by bcd's (b,c)=3
    val sp = spark; import sp.implicits._
    val got = SignalQueries
      .bpeMerges(Seq((1L, "aaa aaa bcd bcd bcd")).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "b", "c", "bc", 3L),
      (3L, "bc", "d", "bcd", 3L)
    ), s"got $got")
  }

  test("q81: applying the learned merges compresses the Sennrich corpus to hand-computed token counts") {
    // merges (e,s),(es,t),(l,o) encode: low -> [lo,w]=2, lower -> [lo,w,e,r]=4,
    // newest -> [n,e,w,est]=4, widest -> [w,i,d,est]=4.
    // totals: words 16; chars 5*3+2*5+6*6+3*6 = 79; tokens 5*2+2*4+6*4+3*4 = 54
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val sp = spark; import sp.implicits._
    val got = SignalQueries
      .bpeEncode(Seq((1L, text), (2L, "12 34 !!")).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got === Seq((1L, 16L, 79L, 54L, 0.6835)), s"got $got — doc 2 (no alpha words) excluded")
    // nothing cached survives the query (train releases, apply is lazy)
    got.foreach(_ => ())
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty, s"cached RDDs leaked: ${leftover.keys.mkString(",")}")
  }

  // ---------------------------------------------------------------- q82

  test("q82: a width-4 sketch forces collisions; estimates match a plain-Scala CMS replay, error one-sided") {
    val w = 4
    def cell(r: Int, term: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s"$r:$term".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % w
    }
    // 12 terms across 4 columns per row: collisions are unavoidable
    val counts = ('a' to 'l').zipWithIndex.map { case (ch, i) => s"ter$ch" -> (200 + i * 13) }
    val text = counts.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val sp = spark; import sp.implicits._
    val got = SignalQueries
      .cmsHeavyHitters(Seq((1L, text)).toDF("doc_id", "text"), w)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    // independent replay: cell-wise sums, min over rows
    val cms = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    counts.foreach { case (t, n) => (0 until 4).foreach(r => cms((r, cell(r, t))) += n.toLong) }
    val expected = counts
      .map { case (t, n) => (t, (0 until 4).map(r => cms((r, cell(r, t)))).min, n.toLong) }
      .filter(_._2 >= 200L)
      .map { case (t, est, tru) => (t, est, tru, est > tru) }
      .sortBy(_._1)
    assert(got === expected, s"got $got\nexpected $expected")
    assert(expected.exists(_._4), "fixture must force at least one collision overestimate")
    assert(got.forall { case (_, est, tru, _) => est >= tru }, "count-min error is one-sided")
  }
}
