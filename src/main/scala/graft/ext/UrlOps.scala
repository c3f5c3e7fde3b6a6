package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** URL canonicalization and registrable-domain extraction — the key
  * derivation under per-URL dedup and per-domain quotas/mixing in a
  * web-crawl training pipeline. Two crawls of one page rarely agree
  * byte-for-byte on the URL (scheme/host case, default ports, tracking
  * params, param order, trailing slash, fragments), so URL-exact dedup
  * without canonicalization silently under-merges; and domain quotas need
  * the REGISTRABLE domain (eTLD+1 under the public-suffix list), not the
  * hostname — `a.site.co.uk` and `b.site.co.uk` are one registrant, while
  * `site.github.io` is its own (private suffix). Rules implemented, each
  * a documented choice a real canonicalizer makes:
  *  - scheme + host lowercased; leading `www.` stripped
  *  - default ports dropped (`:443` on https, `:80` on http), others kept
  *  - fragment dropped; tracking params dropped (`utm_*`, `fbclid`,
  *    `gclid`); remaining params sorted by (key, value)
  *  - trailing slash stripped except the root path
  *  - registrable domain by LONGEST public-suffix match over a built-in
  *    PSL subset (multi-label suffixes like `co.uk` and private suffixes
  *    like `github.io` both exercise the label-wise match)
  *
  * Scale contract: pure per-row string work inside one `mapPartitions`
  * (the PSL subset is a compile-time constant here; a full PSL is a
  * ~200 KB broadcast in production) — no shuffle until the final display
  * sort. Malformed URLs degrade to a dropped row, never a throw.
  */
object UrlOps {

  /** PSL subset: label-wise suffixes, longest match wins. Includes
    * multi-label public suffixes and a private-registry suffix. */
  private[ext] val PublicSuffixes: Set[List[String]] =
    Set("com", "org", "net", "io", "uk", "co.uk", "org.uk", "com.au",
        "ac.jp", "github.io").map(_.split('.').toList.reverse)

  final case class CanonUrl(doc_id: Long, canon_url: String, reg_domain: String)

  /** Longest-suffix match over whole labels; registrable domain = the
    * matched suffix plus one label. None when the host IS a bare suffix
    * (nothing registrable) or has no known suffix. */
  private[ext] def registrableDomain(host: String): Option[String] = {
    val labels = host.split('.').toList
    if (labels.exists(_.isEmpty)) return None
    val rev = labels.reverse
    val best = PublicSuffixes.filter(sfx => rev.startsWith(sfx)).map(_.length)
      .reduceOption(_ max _).getOrElse(return None)
    if (labels.length <= best) None // host is exactly a public suffix
    else Some(labels.takeRight(best + 1).mkString("."))
  }

  /** Parse + canonicalize; None on anything malformed (no scheme
    * separator, empty host, non-numeric port). */
  private[ext] def canonicalize(docId: Long, url: String): Option[CanonUrl] = {
    val sep = url.indexOf("://")
    if (sep <= 0) return None
    val scheme = url.substring(0, sep).toLowerCase
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return None
    val rest = url.substring(sep + 3)
    // authority ends at the first of / ? #
    val authEnd0 = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val authEnd = if (authEnd0 < 0) rest.length else authEnd0
    val auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    if (auth.isEmpty) return None
    val (hostRaw, portRaw) = auth.lastIndexOf(':') match {
      case -1 => (auth, "")
      case i  => (auth.substring(0, i), auth.substring(i + 1))
    }
    if (hostRaw.isEmpty) return None
    if (portRaw.nonEmpty && !portRaw.forall(_.isDigit)) return None
    val host0 = hostRaw.toLowerCase
    // strip a leading `www.` only when a registrable domain survives it —
    // `www.com` is itself a registrable host, not chrome on `com`
    val stripped =
      if (host0.startsWith("www.") && host0.length > 4) host0.substring(4) else host0
    val (host, reg) = registrableDomain(stripped) match {
      case Some(r) => (stripped, r)
      case None => (host0, registrableDomain(host0).getOrElse(return None))
    }
    val port = portRaw match {
      case "" => ""
      case "443" if scheme == "https" => ""
      case "80" if scheme == "http"  => ""
      case p => ":" + p
    }
    // split tail into path / query / fragment
    val noFrag = tail.indexOf('#') match { case -1 => tail; case i => tail.substring(0, i) }
    val qIdx = noFrag.indexOf('?')
    val path0 = if (qIdx < 0) noFrag else noFrag.substring(0, qIdx)
    val query0 = if (qIdx < 0) "" else noFrag.substring(qIdx + 1)
    val path1 = if (path0.isEmpty) "/" else path0
    val path = if (path1.length > 1 && path1.endsWith("/")) path1.dropRight(1) else path1
    val params = query0.split('&').toSeq.filter(_.nonEmpty)
      .map { kv => kv.indexOf('=') match {
        case -1 => (kv, ""); case i => (kv.substring(0, i), kv.substring(i + 1)) } }
      .filterNot { case (k, _) =>
        k.startsWith("utm_") || k == "fbclid" || k == "gclid" }
      .sortBy(identity)
    // valueless params normalize to `k=` — one canonical spelling
    val query = if (params.isEmpty) ""
      else params.map { case (k, v) => s"$k=$v" }.mkString("?", "&", "")
    Some(CanonUrl(docId, s"$scheme://$host$port$path$query", reg))
  }

  // ------------------------------------------------------------- deterministic synthesis
  /** One messy crawl URL per doc (seed = doc_id), exercising every rule:
    * mixed-case scheme/host, www prefix, default vs explicit ports,
    * trailing slash, scrambled + tracking params, a fragment — and a
    * 1-in-29 malformed row that must be dropped. The oracle reconstructs
    * the canonical form and registrable domain in closed form. */
  def synthUrl(id: Long): String = {
    if (id % 29 == 0) return "not a url at all"
    val tlds = Seq("com", "org", "co.uk", "github.io")
    val tld0 = tlds((id % 4).toInt)
    val tld = if (id % 2 == 0) tld0.toUpperCase else tld0
    val scheme = if (id % 2 == 0) "HTTPS" else "hTtp"
    val www = if (id % 2 == 0) "WWW." else ""
    val host = s"${www}SUB${id % 3}.Site${id % 50}.$tld"
    val port =
      if (id % 5 == 0) { if (id % 2 == 0) ":443" else ":80" }
      else if (id % 5 == 1) ":8080" else ""
    val path = if (id % 3 == 0) "/" else s"/a/b${id % 7}/"
    val query = s"?utm_source=news&b=${id % 9}&a=${id % 3}&gclid=G$id"
    s"$scheme://$host$port$path$query#sec2"
  }

  // ------------------------------------------------------------- q217: canonicalization through the gate
  /** REAL canonicalization through the DuckDB gate: synthesize the messy
    * URL ([[synthUrl]]), canonicalize it back, emit (canon_url,
    * reg_domain) per doc. The oracle builds both strings in closed form —
    * a canonicalizer that keeps a default port, misses the www strip or
    * the trailing slash, fails to sort/filter params, truncates at the
    * fragment wrong, or matches `co.uk` as `uk` (one-label suffix match)
    * mismatches. Malformed 1-in-29 rows must vanish. Map-only; the only
    * exchange is the display sort. */
  def q217UrlCanon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.flatMap(id => canonicalize(id, synthUrl(id))))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q217Sql: String =
    """WITH m AS (SELECT doc_id AS id FROM documents WHERE doc_id % 29 <> 0),
      |x AS (SELECT id,
      |  CASE id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |              WHEN 2 THEN 'co.uk' ELSE 'github.io' END AS tld FROM m)
      |SELECT id AS doc_id,
      |  'http' || CASE WHEN id % 2 = 0 THEN 's' ELSE '' END || '://sub' || (id % 3)::VARCHAR
      |    || '.site' || (id % 50)::VARCHAR || '.' || tld
      |    || CASE WHEN id % 5 = 1 THEN ':8080' ELSE '' END
      |    || CASE WHEN id % 3 = 0 THEN '/' ELSE '/a/b' || (id % 7)::VARCHAR END
      |    || '?a=' || (id % 3)::VARCHAR || '&b=' || (id % 9)::VARCHAR AS canon_url,
      |  'site' || (id % 50)::VARCHAR || '.' || tld AS reg_domain
      |FROM x ORDER BY doc_id""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q217_url_canon", q217UrlCanon _, Some(q217Sql)),
  )
}
