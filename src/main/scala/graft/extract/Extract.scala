package graft.extract

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Page-content extraction: html→text, outlink extraction, URL
  * canonicalization, and the leaked-secret scanner.
  *
  * Every function here exists in two forms that are proven equal by test:
  *   - a pure Scala function (used by the sequential executable spec and by
  *     the corpus generator, giving the byte-identical-extraction invariant
  *     of BASELINE.json input_hint), and
  *   - a Column expression / deterministic UDF for the distributed engine.
  *
  * The extraction spec is deliberately trivial to state (no charset or
  * locale ambiguity): UTF-8 decode, drop every `<...>` tag, collapse
  * ASCII whitespace runs to a single space, trim.
  */
object Extract extends Serializable {

  // ---------- text extraction ----------

  private val TagRe = "<[^>]*>"
  private val WsRe = "\\s+"

  /** Reference extraction. Byte-identical invariant: for every generated
    * page, `extractText(html) == text` (FIXTURES.md §1).
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    s.replaceAll(TagRe, " ").replaceAll(WsRe, " ").trim
  }

  /** Column form — built from codegen'd native functions (no UDF in the
    * hot path); proven equal to [[extractText]] by ExtractSpec.
    */
  def extractTextCol(html: Column): Column =
    trim(regexp_replace(regexp_replace(decode(html, "UTF-8"), TagRe, " "), WsRe, " "))

  // ---------- URL canonicalization ----------
  // Web analog of the reference's relay-URL normalize/validate
  // (/root/reference/pkg/relays/relay.go:467-547): lowercase scheme+host,
  // strip fragment and trailing '/', reject userinfo / query / .onion /
  // non-http(s). Returns None for rejects.

  private val UrlRe =
    "^(https?)://([^/@?#\\s]+)(/[^?#\\s]*)?$".r

  def canonicalUrl(raw: String): Option[String] = {
    val s = raw.trim
    if (s.isEmpty) return None
    // cheap rejects first (reference rejects userinfo/query/fragment URLs)
    if (s.contains("@") || s.contains("?") || s.contains("#")) return None
    val lowered =
      if (s.length >= 8 && s.substring(0, 8).equalsIgnoreCase("https://")) "https://" + s.substring(8)
      else if (s.length >= 7 && s.substring(0, 7).equalsIgnoreCase("http://")) "http://" + s.substring(7)
      else return None
    lowered match {
      case UrlRe(scheme, host0, path0) =>
        val host = host0.toLowerCase
        if (host.isEmpty || host.endsWith(".onion")) return None
        val path = Option(path0).getOrElse("")
        val trimmedPath = if (path == "/" || path.isEmpty) "" else path.stripSuffix("/")
        Some(s"$scheme://$host$trimmedPath")
      case _ => None
    }
  }

  /** Host (politeness key) of an already-canonical URL. */
  def hostOf(url: String): String = {
    val i = url.indexOf("://")
    val rest = if (i >= 0) url.substring(i + 3) else url
    val j = rest.indexOf('/')
    if (j >= 0) rest.substring(0, j) else rest
  }

  // ---------- outlink extraction ----------

  private val HrefRe = java.util.regex.Pattern.compile("href=\"([^\"]*)\"")

  /** All outlinks of a page: href values in document order, canonicalized,
    * deduplicated keeping first occurrence, self-link removed.
    * Mirrors ParseTags + self-exclusion (/root/reference/pkg/events/
    * events.go:31-51, pkg/pipe/engine/engine.go:384).
    */
  def extractOutlinks(html: Array[Byte], selfUrl: String): Array[String] = {
    val s = new String(html, StandardCharsets.UTF_8)
    val m = HrefRe.matcher(s)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    while (m.find()) {
      canonicalUrl(m.group(1)).foreach { u =>
        if (u != selfUrl) out += u
      }
    }
    out.toArray
  }

  /** Oversize gate (reference TooBig, /root/reference/pkg/events/events.go:19-27):
    * reject pages with >maxOutlinks links or >maxContent bytes of html.
    */
  val MaxOutlinks = 50000
  val MaxContentBytes = 1000000

  def tooBig(html: Array[Byte], nOutlinks: Int): Boolean =
    nOutlinks > MaxOutlinks || html.length > MaxContentBytes

  // ---------- secret-pattern scan (LeakPolicy analog) ----------
  // Reference: find `nsec1[bech32]{58}` candidates with a cheap substring
  // pre-filter, then validate (/root/reference/pkg/leaks/leaks.go:273-331).
  // Validation here is a full BIP-173 bech32 checksum verify (public
  // algorithm); the reference additionally curve-validates the decoded key,
  // which has no web analog and needs no crypto dependency.

  private val Charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val CharsetMap: Array[Byte] = {
    val a = Array.fill[Byte](128)(-1)
    Charset.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i.toByte }
    a
  }
  private val NsecRe = java.util.regex.Pattern.compile("nsec1[qpzry9x8gf2tvdw0s3jn54khce6mua7l]{58}")

  private def polymod(values: Seq[Int]): Int = {
    val gen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)
    var chk = 1
    values.foreach { v =>
      val b = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ v
      var i = 0
      while (i < 5) { if (((b >>> i) & 1) == 1) chk ^= gen(i); i += 1 }
    }
    chk
  }

  private def hrpExpand(hrp: String): Seq[Int] =
    hrp.map(_.toInt >>> 5) ++ Seq(0) ++ hrp.map(_.toInt & 31)

  /** BIP-173 bech32 checksum verification for an `nsec1...` candidate. */
  def validBech32Secret(candidate: String): Boolean = {
    if (candidate.length != 63 || !candidate.startsWith("nsec1")) return false
    val data = candidate.substring(5).map { c =>
      if (c >= 128) return false
      val v = CharsetMap(c.toInt)
      if (v < 0) return false
      v.toInt
    }
    polymod(hrpExpand("nsec") ++ data) == 1
  }

  /** Distinct validated secrets in a text, document order.
    * Cheap `contains` pre-filter first (reference optimization O7).
    */
  def findSecrets(text: String): Array[String] = {
    if (text == null || !text.contains("nsec1")) return Array.empty
    val m = NsecRe.matcher(text)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    while (m.find()) { val c = m.group(); if (validBech32Secret(c)) out += c }
    out.toArray
  }

  /** Distinct SUSPECTED secrets: pattern matches that fail the checksum
    * (the reference's `suspected` leak-record tier,
    * /root/reference/pkg/leaks/leaks.go:146-151).
    */
  def findSuspects(text: String): Array[String] = {
    if (text == null || !text.contains("nsec1")) return Array.empty
    val m = NsecRe.matcher(text)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    while (m.find()) { val c = m.group(); if (!validBech32Secret(c)) out += c }
    out.toArray
  }

  /** Lowercase md5 hex — the driver-side twin of Spark's `md5(binary)`
    * column (used for the deterministic page-version tiebreaker and leak
    * proofs; proven equal by ExtractSpec).
    */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  // ---------- UDF registrations (deterministic by construction) ----------

  import org.apache.spark.sql.SparkSession

  /** Registers the extraction UDFs on a session. All are pure functions of
    * their inputs — never marked nondeterministic, so Catalyst may push,
    * dedup, and reorder them freely.
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("canon_url", (s: String) => canonicalUrl(if (s == null) "" else s).orNull)
    spark.udf.register("url_host", (s: String) => if (s == null) null else hostOf(s))
    spark.udf.register(
      "extract_outlinks",
      (html: Array[Byte], self: String) =>
        if (html == null) Array.empty[String] else extractOutlinks(html, self)
    )
    spark.udf.register(
      "find_secrets",
      (text: String) => findSecrets(text)
    )
    spark.udf.register(
      "find_suspects",
      (text: String) => findSuspects(text)
    )
  }
}
