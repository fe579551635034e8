package etlmudah.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import etlmudah.scale.Sampling
import etlmudah.text.TextStats

/** Web-corpus curation by URL: host extraction, registered-domain
  * (eTLD+1) normalization, per-domain statistics, and per-domain
  * document caps.
  *
  * Every serious web-scale corpus curates at the REGISTERED-DOMAIN
  * grain, not the raw-host grain: C4 deduplicates and filters per
  * domain, RefinedWeb caps pages per domain, FineWeb reports token
  * share per domain — because subdomains (www./blog./m.) are the same
  * publisher and crawl skew concentrates in a Zipf head of domains.
  * The reference's corpus carries listing URLs end to end
  * (`dags/dag.py:133`, `ad_url` kept through transform and load);
  * these operators are the curation its corpus would need at crawl
  * scale.
  *
  * All parsing is regexp/array arithmetic over built-in functions —
  * zero UDFs, everything re-derivable in any SQL engine (q174/q175's
  * oracles replay it in DuckDB).
  *
  * 100 TB shape: `domainStats` is one map-side-combined aggregate
  * whose key cardinality is the registered-domain count (~10^7 for
  * the full web — far below doc count); the share window runs over
  * the AGGREGATED frame only (the q06 pattern). `domainCap` is one
  * keyed window in md5-uniform order (the q89 `capPerStratum` shape)
  * — deterministic, growth-stable, and skew-safe because the hot
  * domain's window sorts only its own rows.
  */
object Web {

  /** Multi-label public suffixes recognized by [[registeredDomain]].
    * A compact built-in subset of the Public Suffix List — the full
    * PSL is a data file (~9k rules) a production deployment would
    * broadcast-join instead; the heuristic tier keeps the operator
    * expression-only and covers the dominant ccTLD patterns. */
  val DefaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.my", "gov.my", "edu.my", "org.my",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.sg", "co.in", "co.kr")

  /** Host part of an absolute URL: `scheme://HOST[:port][/path...]`.
    * Pure regexp — port, path, query, and fragment are all cut by the
    * `[/:?#]` stop class. Unparseable strings yield ''. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registered domain (eTLD+1) of a host under the built-in
    * multi-label suffix list: `blog.example.co.uk` -> `example.co.uk`,
    * `www.example.com` -> `example.com`, bare `example.com` and
    * anything with fewer than 3 labels pass through unchanged.
    * Lowercases first (DNS is case-insensitive). */
  def registeredDomain(host: Column,
                       multiSuffixes: Seq[String] = DefaultMultiSuffixes): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    when(n <= 2, h)
      .when(last2.isin(multiSuffixes: _*), concat_ws(".", slice(labels, -3, 3)))
      .otherwise(last2)
  }

  /** Deterministic synthetic URL per doc — the testdata carries no URL
    * column, so the query tier synthesizes one the way the media tier
    * synthesizes blobs (`fakeMediaHeader` precedent): subdomain,
    * domain label, and public suffix all cycle on `docId`, so the
    * oracle recomputes the exact same URLs and every downstream
    * assertion checks REAL parsing logic on both engines. */
  def fakeUrl(docId: Column, source: Column): Column = {
    val suffix = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("com.my")),
      (docId % 4 + 1).cast("int"))
    val sub = element_at(array(lit("www."), lit("blog."), lit("")),
      (docId % 3 + 1).cast("int"))
    concat(lit("https://"), sub, lit("d"), (docId % 7).cast("string"),
      lit("."), suffix, lit("/"), source, lit("/"), docId.cast("string"))
  }

  /** Canonical form of an absolute URL — the dedup KEY web-crawl
    * pipelines group on before any content hashing, because the same
    * page arrives under many spellings (case, www, default ports,
    * param order, tracking params, fragments):
    *
    *  - scheme and host lowercase; a leading `www.` drops
    *  - default ports strip (`:80` for http, `:443` for https);
    *    non-default ports stay
    *  - the fragment drops entirely
    *  - tracking params (`utm_*`, `gclid`, `fbclid`, `ref` by
    *    default) drop; surviving params SORT by full `k=v` text so
    *    param order can't split a page
    *  - trailing path slashes drop (the root path collapses to the
    *    bare host)
    *
    * Pure regexp/array arithmetic over built-ins (the [[urlHost]]
    * contract); the array lambda runs over a per-URL handful of
    * params, not a hot path. Unparseable input (no scheme/host)
    * yields null so garbage never collides in a dedup group. */
  def canonicalUrl(url: Column,
                   dropParams: Seq[String] =
                     Seq("utm_[^=]*", "gclid", "fbclid", "ref")): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(lower(urlHost(url)), "^www\\.", "")
    val port = regexp_extract(url, "^[^:/?#]+://[^/:?#]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path = regexp_replace(
      regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val dropRe = "^(" + dropParams.mkString("|") + ")="
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(dropRe))
    val qs = array_join(array_sort(params), "&")
    val qsPart = when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qsPart))
  }

  /** Per-registered-domain curation report: docs, distinct hosts,
    * whitespace tokens, and each domain's share of the corpus — the
    * table a RefinedWeb-style "cap pages per domain" policy reads
    * before choosing its cap. One aggregate keyed by domain; the
    * share window runs over the aggregated (domain-sized) frame. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val host = urlHost(col(urlCol))
    val agg = df
      .select(registeredDomain(host).as("domain"), host.as("host"),
        TextStats.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("n_tok")).as("n_tokens"))
    agg
      .withColumn("doc_share",
        round(col("n_docs") / sum(col("n_docs")).over(
          Window.partitionBy()), 6))
      .orderBy(col("domain"))
  }

  /** Per-registered-domain document cap (RefinedWeb "at most N pages
    * per domain"), md5-uniform deterministic order — delegates to
    * [[Sampling.capPerStratum]] with the derived domain as the
    * stratum, so the quota semantics (and q89's oracle shape) carry
    * over unchanged. */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
                cap: Int, salt: String = "domcap"): DataFrame =
    Sampling.capPerStratum(
      df.withColumn("domain", registeredDomain(urlHost(col(urlCol)))),
      idCol, "domain", cap, salt)
}
