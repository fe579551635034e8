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
    * PSL is a data file (~9k rules) a production deployment feeds to
    * [[pslRegisteredDomain]] instead; the heuristic tier keeps the
    * operator expression-only and covers the dominant ccTLD
    * patterns. */
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

  /** Registered domain under a FULL Public Suffix List — the
    * production form of [[registeredDomain]] (whose built-in list is a
    * documented subset): `rules` is a one-column ("rule") DataFrame of
    * PSL-syntax lines — plain suffixes ("co.uk"), wildcards ("*.ck",
    * one arbitrary label in place of *), and exceptions ("!www.ck",
    * overriding a wildcard); comment lines ("//...") and blanks are
    * tolerated. Resolution follows publicsuffix.org: an exception rule
    * wins outright (its public suffix is the rule minus its leftmost
    * label); otherwise the LONGEST matching rule wins; an unmatched
    * host falls to the default rule "*" (public suffix = the TLD).
    * The registered domain is the public suffix plus one label —
    * null when the host IS a public suffix (no registrable domain; a
    * stricter answer than the heuristic tier's passthrough).
    *
    * Adds `out` to `df`. Scale shape: the rule table broadcasts (~9k
    * rows for the real PSL); hosts resolve once on the DISTINCT host
    * frame (domain-bounded — the q174 rationale), each host exploding
    * at most `maxLabels` candidate suffixes into two broadcast
    * equi-joins (plain/exception on the suffix, wildcard on the
    * suffix's tail — never an OR-join that would plan a nested loop);
    * the resolved (host, label-count) table broadcasts back onto the
    * corpus. The corpus itself is never shuffled. */
  def pslRegisteredDomain(df: DataFrame, hostCol: String, rules: DataFrame,
                          out: String = "domain",
                          maxLabels: Int = 8): DataFrame = {
    val parsed = rules.select(lower(trim(col("rule"))).as("raw"))
      .filter(col("raw") =!= "" && !col("raw").startsWith("//"))
      .select(
        when(col("raw").startsWith("!"), lit("e"))
          .when(col("raw").startsWith("*."), lit("w"))
          .otherwise(lit("p")).as("kind"),
        regexp_replace(col("raw"), "^(!|\\*\\.)", "").as("key"))
      .withColumn("klab", size(split(col("key"), "\\.")))
    val hNorm = lower(col(hostCol))
    val hosts = df.select(hNorm.as("__h"))
      .filter(col("__h").isNotNull && col("__h") =!= "").distinct()
    val lab = split(col("__h"), "\\.")
    val cands = hosts.select(col("__h"), explode(transform(
        sequence(lit(1), least(size(lab), lit(maxLabels))),
        k => struct(concat_ws(".", slice(lab, -k, k)).as("suffix"),
          when(k >= 2, concat_ws(".", slice(lab, -(k - 1), k - 1)))
            .otherwise(lit("")).as("tail")))).as("c"))
      .select(col("__h"), col("c.suffix").as("suffix"),
        col("c.tail").as("tail"))
    val pe = cands.join(broadcast(parsed.filter(col("kind") =!= "w")),
        col("suffix") === col("key"))
      .select(col("__h"), col("kind"),
        when(col("kind") === "e", col("klab") - 1)
          .otherwise(col("klab")).as("pslab"))
    val wd = cands.filter(col("tail") =!= "")
      .join(broadcast(parsed.filter(col("kind") === "w")),
        col("tail") === col("key"))
      .select(col("__h"), col("kind"), (col("klab") + 1).as("pslab"))
    val best = pe.unionByName(wd).groupBy(col("__h")).agg(
        max(when(col("kind") === "e", col("pslab"))).as("__exc"),
        max(when(col("kind") =!= "e", col("pslab"))).as("__reg"))
      .select(col("__h"), coalesce(col("__exc"), col("__reg")).as("__pslab"))
    val resolved = hosts.join(best, Seq("__h"), "left")
      .select(col("__h"), coalesce(col("__pslab"), lit(1)).as("__pslab"))
    val labs = split(hNorm, "\\.")
    df.join(broadcast(resolved), hNorm === col("__h"), "left")
      .withColumn(out,
        when(col("__pslab").isNotNull && size(labs) > col("__pslab"),
          concat_ws(".", slice(labs, -(col("__pslab") + 1),
            col("__pslab") + 1))))
      .drop("__h", "__pslab")
  }

  /** robots.txt PATH-rule gate (RFC 9309 / Google REP) — the crawl-
    * compliance tier below [[metaRobots]]'s page-level directives:
    * per-host Allow/Disallow PATH rules decide whether a URL may be
    * kept at all. `rules` is a (host, directive, path) DataFrame —
    * directive 'allow'/'disallow', path a robots pattern where `*`
    * matches any octet run and a trailing `$` anchors the end;
    * matching is from the path start. Resolution per RFC 9309: the
    * matching rule with the LONGEST pattern (octets, `$` excluded)
    * wins; on a tie, allow wins; a URL matching no rule for its host
    * is allowed (and so is a host with no rules at all).
    *
    * Adds boolean `out` to `df`. Rule patterns compile to SQL LIKE
    * with an explicit escape (literal %/_/\\ in a path cannot act as
    * wildcards), so the oracle replays the compilation verbatim.
    * Assumes rules are already filtered to the crawler's user-agent
    * group (agent resolution is a fetch-time concern — one group's
    * rules per host reach the engine).
    *
    * 100 TB shape: rules broadcast (robots files are small; even 10⁷
    * hosts x ~20 rules fits executors); the host equi-join fans each
    * page out to its own host's rules only, the verdict reduces in a
    * page-keyed aggregate (max over (precedence, allow) — one
    * exchange on the page id), and the verdict joins back id-keyed.
    * The corpus is never shuffled by rule text. */
  def robotsPathGate(df: DataFrame, urlCol: String, idCol: String,
                     rules: DataFrame,
                     out: String = "crawl_allowed"): DataFrame = {
    val esc = (c: Column) => replace(replace(replace(c,
      lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"), lit("\\_"))
    val r = rules.select(lower(col("host")).as("__rh"),
        (lower(col("directive")) === "allow").cast("int").as("__allow"),
        col("path").as("__p"))
      // RFC 9309: an empty rule value means "no restriction" (an empty
      // Disallow allows everything) — it must NOT compile to LIKE '%'
      // at precedence 0, which would read as a match-everything rule.
      // Empty/null-path rows are dropped before compilation.
      .where(length(col("__p")) > 0)
      .withColumn("__anch", col("__p").endsWith("$"))
      .withColumn("__body", when(col("__anch"),
        expr("substring(__p, 1, length(__p) - 1)")).otherwise(col("__p")))
      .withColumn("__prec", length(col("__body")))
      .withColumn("__like", concat(
        replace(esc(col("__body")), lit("*"), lit("%")),
        when(col("__anch"), lit("")).otherwise(lit("%"))))
      .select(col("__rh"), col("__allow"), col("__prec"), col("__like"))
    val host = lower(urlHost(col(urlCol)))
    val path0 = regexp_extract(col(urlCol), "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val pages = df.select(col(idCol).as("__id"), host.as("__h"),
      when(path0 === "", lit("/")).otherwise(path0).as("__path"))
    val verdict = pages
      .join(broadcast(r), col("__h") === col("__rh") &&
        expr("__path LIKE __like ESCAPE '\\\\'"))
      .groupBy(col("__id"))
      .agg(max(struct(col("__prec"), col("__allow"))).as("__b"))
      .select(col("__id"), (col("__b.__allow") === 1).as("__v"))
    df.join(verdict, col(idCol) === col("__id"), "left")
      .withColumn(out, coalesce(col("__v"), lit(true)))
      .drop("__id", "__v")
  }

  /** Deterministic synthetic URL per doc — the testdata carries no URL
    * column, so the query tier synthesizes one the way the media tier
    * synthesizes blobs (`fakeMediaHeader` precedent): subdomain,
    * domain label, and public suffix all cycle on `docId`, so the
    * oracle recomputes the exact same URLs and every downstream
    * assertion checks REAL parsing logic on both engines. */
  def fakeUrl(docId: Column, source: Column): Column =
    concat(lit("https://"), fakeHost(docId),
      lit("/"), source, lit("/"), docId.cast("string"))

  /** Host part of [[fakeUrl]] alone — a pure function of `docId`
    * (subdomain, d-label, and public suffix cycle on it), so link
    * injection ([[fakeLinkUrls]]) and the oracles can re-derive any
    * doc's host closed-form without string surgery on the full URL. */
  def fakeHost(docId: Column): Column = {
    val suffix = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("com.my")),
      (docId % 4 + 1).cast("int"))
    val sub = element_at(array(lit("www."), lit("blog."), lit("")),
      (docId % 3 + 1).cast("int"))
    concat(sub, lit("d"), (docId % 7).cast("string"), lit("."), suffix)
  }

  /** Deterministic synthetic OUTLINKS for doc `docId`: two absolute
    * URLs pointing at the [[fakeHost]]s of docs `docId+1` and
    * `3*docId+5` — closed-form functions of the id, so the link-graph
    * oracles carry the known href targets instead of replicating the
    * extractor (the q190/q202 discipline). The host arithmetic
    * guarantees no self-link can arise — for both targets it is the
    * mod-4 SUFFIX residue that never coincides: docId % 4 == (docId+1)
    * % 4 is impossible, and docId % 4 == (3*docId+5) % 4 reduces to
    * 2*docId + 1 ≡ 0 (mod 4), which no integer satisfies (the d-label
    * mod-7 residues CAN coincide, e.g. docId ≡ 1 mod 7 for the second
    * link). [[hostLinkEdges]] still filters defensively. */
  def fakeLinkUrls(docId: Column): Column = array(
    concat(lit("https://"), fakeHost(docId + 1),
      lit("/x/"), docId.cast("string")),
    concat(lit("http://"), fakeHost(docId * 3 + 5), lit("/y")))

  /** HTML → text extraction — the first transform every web-crawl
    * training corpus applies (C4, RefinedWeb, FineWeb all start from
    * WARC/WET markup): drop the invisible containers, keep block
    * structure as line breaks, strip the remaining tags, decode the
    * common entities, and normalize whitespace.
    *
    * Five deterministic passes, all codegen'd built-ins (zero UDFs),
    * each portable between Java regex and RE2 so the oracle replays
    * the chain verbatim in DuckDB:
    *
    *  1. `<script>`/`<style>` elements drop WITH their content
    *     (non-greedy dotall to the matching close tag — one pass per
    *     element name so `<script>..</style>` junk can't cross-close),
    *     and `<!-- comments -->` drop;
    *  2. block-level tags (`p div br li ul ol h1-h6 tr table
    *     blockquote`) become newlines so paragraph boundaries survive
    *     the strip;
    *  3. every remaining tag becomes a space (inline tags must not
    *     weld `a<b>b` into `ab`);
    *  4. the six dominant named/numeric entities decode — `&lt; &gt;
    *     &quot; &#39; &apos; &nbsp;` first, `&amp;` LAST (decoding
    *     `&amp;` first would manufacture new entities out of
    *     `&amp;lt;`, the classic double-decode bug);
    *  5. whitespace normalizes: space runs collapse (the class is
    *     explicit — Java's `\s` includes `\x0B`, RE2's does not, so
    *     `\s` is banned here), spaces hugging a newline drop, newline
    *     runs collapse, and the result is trimmed of both.
    *
    * Regex-tier fidelity, not a DOM parse: CDATA and conditional
    * comments are out of scope (vanishing in real crawls; a WARC
    * production deployment would front a proper parser as a source-
    * level concern). 100 TB shape: a per-row projection inside
    * whole-stage codegen — no shuffle, no state, scales linearly. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val ent = replace(replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&apos;"), lit("'")), lit("&nbsp;"), lit(" "))
    val amp = replace(ent, lit("&amp;"), lit("&"))
    val sp = regexp_replace(amp, "[ \\t\\r\\f]+", " ")
    val nl = regexp_replace(sp, " ?\\n ?", "\n")
    trim(regexp_replace(nl, "\\n+", "\n"), " \n")
  }

  /** Robots directives of a page: the content of its
    * `<meta name="robots">` tag, lowercased ('' when absent) — the
    * crawl-policy signal a compliant corpus filters on before any
    * content processing (a `noindex` page asked not to be kept).
    * Both attribute orders are matched (name-first and content-first;
    * HTML attribute order is free); values must be quoted (the
    * overwhelmingly dominant form — unquoted `content=` values are
    * out of this regex tier's scope). Pure regexp, RE2/Java-portable. */
  def metaRobots(html: Column): Column = {
    val nameFirst = regexp_extract(html,
      "(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']robots[\"'][^>]*" +
        "\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val contentFirst = regexp_extract(html,
      "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"'][^>]*" +
        "\\bname\\s*=\\s*[\"']robots[\"']", 1)
    lower(when(nameFirst =!= "", nameFirst).otherwise(contentFirst))
  }

  /** True when [[metaRobots]] carries a `noindex` or `none` directive
    * (word-boundary match: `noindexing` or a `nonessential` token in a
    * malformed value must not fire). */
  def metaNoindex(html: Column): Column =
    metaRobots(html).rlike("(?i)\\b(noindex|none)\\b")

  /** Deterministic synthetic HTML page per doc (the [[fakeUrl]] /
    * `fakeMediaHeader` precedent: the testdata carries plain text, so
    * the query tier wraps it in markup both engines can re-synthesize
    * byte-identically). The page deliberately exercises every
    * [[htmlToText]] pass: a style block, a script whose BODY contains
    * `<` and a fake close-tag prefix, a comment, entities of all six
    * kinds, block tags, an inline tag inside flowing text, and
    * doubled spaces. The three-arg overload injects a
    * `<meta name="robots">` tag when `robots` is non-null (the
    * [[metaRobots]] round-trip surface). */
  def fakeHtml(docId: Column, text: Column): Column =
    fakeHtml(docId, text, lit(null).cast("string"))

  /** Four-arg overload: additionally injects one `<a>` element per URL
    * in `links` (array<string>) into the body, plus a RELATIVE href
    * and a fragment-only href that an absolute-URL extractor
    * ([[hrefHosts]]) must ignore — the link-graph round-trip surface.
    * Anchor text is the fixed token `out` (q223's closed-form etext
    * depends on it); the five-arg overload varies anchors. */
  def fakeHtml(docId: Column, text: Column, robots: Column,
               links: Column): Column =
    fakeHtml(docId, text, robots, links,
      transform(links, _ => lit("out")))

  /** Five-arg overload: per-link ANCHOR TEXT from the parallel
    * `anchors` array — the [[hrefHostAnchors]] round-trip surface. */
  def fakeHtml(docId: Column, text: Column, robots: Column,
               links: Column, anchors: Column): Column = {
    val linkHtml = concat(
      lit("<a href=\"/rel/1\">rel</a><a href=\"#frag\">frag</a>"),
      array_join(zip_with(links, anchors, (u, a) =>
        concat(lit("<a class=\"o\" href=\""), u, lit("\">"), a,
          lit("</a>"))), ""))
    concat(fakeHtml(docId, text, robots), linkHtml)
  }

  def fakeHtml(docId: Column, text: Column, robots: Column): Column = {
    val id = docId.cast("string")
    val meta = when(robots.isNotNull,
      concat(lit("<meta name=\"robots\" content=\""), robots, lit("\">")))
      .otherwise(lit(""))
    concat(
      lit("<html><head>"), meta, lit("<title>Doc "), id,
      lit("</title><style type=\"text/css\">body { color:#333; }</style>"),
      lit("<script>var x = 1 < 2 && \"</scr\" + \"junk\";</script>"),
      lit("</head><body><!-- crawl "), id,
      lit(" --><h1>Title &amp; Doc "), id,
      lit("</h1><p>Lead&nbsp;para  &lt;kept&gt;.</p><div class=\"b\">"),
      text,
      lit("</div><ul><li>item&#39;s one</li><li>item &quot;two&quot;</li>"),
      lit("</ul><em>fine</em>print</body></html>"))
  }

  /** Hosts of all ABSOLUTE outlinks on a page: every `<a href="...">`
    * whose value starts with a scheme yields its host; relative,
    * fragment-only, and schemeless hrefs are ignored (they stay on the
    * page's own host and carry no cross-host endorsement). Lowercased
    * (DNS case-insensitivity), duplicates kept — a page linking a host
    * twice endorses it twice, and the edge miner aggregates weights.
    * One codegen'd `regexp_extract_all` per row; both quote styles
    * match via the `["']` class, and the host stop class `[/:?#"']`
    * cuts port/path/query/fragment exactly as [[urlHost]] does. */
  def hrefHosts(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?i)<a\\b[^>]*\\bhref\\s*=\\s*[\"']" +
          "[A-Za-z][A-Za-z0-9+.-]*://([^/:?#\"']+)"), lit(1)),
      h => lower(h))

  /** (host, anchor) pairs of all absolute outlinks on a page — the
    * anchor-text signal: what OTHER pages call a target is a
    * first-class relevance/label source (the classic use is ranking;
    * in corpus curation it profiles what a domain is known for).
    * Same absolute-href contract as [[hrefHosts]] (relative/fragment
    * links carry no cross-host signal); the two parallel
    * `regexp_extract_all` passes share one pattern, so group 1
    * (host) and group 2 (anchor body, trimmed) zip in match order.
    * Anchor bodies are the raw inner content to the matching close
    * tag — markup inside an anchor is the consumer's concern. */
  def hrefHostAnchors(html: Column): Column = {
    val pat = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"']" +
      "[A-Za-z][A-Za-z0-9+.-]*://([^/:?#\"']+)[^>]*>(.*?)</a\\s*>"
    zip_with(
      regexp_extract_all(html, lit(pat), lit(1)),
      regexp_extract_all(html, lit(pat), lit(2)),
      (h, a) => struct(lower(h).as("host"), trim(a).as("anchor")))
  }

  /** Per-target-domain anchor-term profile: tokenize every anchor
    * pointing at a registered domain and keep each domain's topK
    * terms by link count (count DESC, term ASC — deterministic).
    * Returns (domain, term, n_links, rank).
    *
    * Scale shape: extraction is per-row; the (domain, term) aggregate
    * map-side combines with key cardinality bounded by domains x
    * anchor vocabulary (Zipf-tiny against the corpus); the top-k
    * window runs over that AGGREGATED frame only, and
    * InferWindowGroupLimit prunes it per-partition before the
    * exchange. */
  def anchorTermProfile(df: DataFrame, htmlCol: String,
                        topK: Int = 3): DataFrame = {
    import etlmudah.text.TextStats
    val pairs = df.select(
        explode(hrefHostAnchors(col(htmlCol))).as("ha"))
      .select(registeredDomain(col("ha.host")).as("domain"),
        explode(TextStats.tokens(lower(col("ha.anchor")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("domain"), col("term"))
      .agg(count(lit(1)).as("n_links"))
    pairs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(col("n_links").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("domain"), col("rank"))
  }

  /** Host-level link graph mined from pages: one directed edge
    * page-host -> outlink-host per absolute href, weight = link count.
    * Self-links drop (intra-host navigation is not endorsement — the
    * PageRank convention). The CommonCrawl/FineWeb curation prior
    * starts here: rank hosts on this graph, then select documents.
    *
    * Scale shape: extraction is a per-row projection; the only
    * exchange is the (src,dst)-keyed weight aggregate, map-side
    * combined, with key cardinality bounded by the distinct linked
    * host-pair count (web-graph sparse, ~10-100 outlinks/page onto a
    * Zipf head of hosts) — never corpus-sized. */
  def hostLinkEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(lower(urlHost(col(urlCol))).as("src_host"),
        explode(hrefHosts(col(htmlCol))).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("weight"))

  /** Host centrality: integer-lattice PageRank over a (src_host,
    * dst_host, weight) link graph on md5-60bit host ids — the
    * [[etlmudah.text.TextStats.textRankKeywords]] portable-hash
    * discipline, so a SQL twin re-derives identical ids and replays
    * the BIGINT-exact rounds. Returns (host, rank) ordered rank DESC,
    * host ASC. The id/name join is |hosts|-sized (domain-bounded, far
    * below page count) and broadcasts; 60-bit collisions merge hosts
    * with probability ~H²/2⁶¹ — negligible below 10⁸ hosts. */
  def hostRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    def hid(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(hid(col("src_host")).as("src"),
      hid(col("dst_host")).as("dst"), col("weight"))
    val hosts = edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .distinct()
      .withColumn("node", hid(col("host")))
    etlmudah.graph.Centrality.pageRankInt(e, iters)
      .join(broadcast(hosts), Seq("node"))
      .select(col("host"), col("rank"))
      .orderBy(desc("rank"), col("host"))
  }

  /** Host hubs & authorities — [[etlmudah.graph.Centrality]]
    * `.hitsInt` over the same md5-60bit host-id graph as [[hostRank]]:
    * authorities are the DESTINATION hosts (what curation wants to
    * keep), hubs the DIRECTORY hosts that point at them (what link-
    * expansion crawls from). Same portable-hash discipline, so a SQL
    * twin replays every half-round. Returns (host, hub, auth) ordered
    * auth DESC, host ASC. */
  def hostHits(edges: DataFrame, iters: Int = 2): DataFrame = {
    def hid(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(hid(col("src_host")).as("src"),
      hid(col("dst_host")).as("dst"), col("weight"))
    val hosts = edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .distinct()
      .withColumn("node", hid(col("host")))
    etlmudah.graph.Centrality.hitsInt(e, iters)
      .join(broadcast(hosts), Seq("node"))
      .select(col("host"), col("hub"), col("auth"))
      .orderBy(desc("auth"), col("host"))
  }

  /** Crawl frontier — bounded-hop BFS from a trusted seed-host set
    * over the link graph ([[etlmudah.graph.Centrality]] `.bfsDepths`
    * on the same md5-60bit host ids as [[hostRank]]): the breadth
    * layer of seed expansion ("crawl everything within h hops of the
    * hosts we already trust") next to [[hostRankSeeded]]'s proximity
    * ranking. Returns (host, depth), depth = shortest hops from any
    * seed (0 = seed), ordered (depth, host); hosts beyond `maxHops`
    * are absent. Seeds not present in the graph still report at
    * depth 0 (they are the caller's trust anchors, reachable or not). */
  def crawlFrontier(edges: DataFrame, seedHosts: DataFrame,
                    maxHops: Int): DataFrame = {
    def hid(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(hid(col("src_host")).as("src"),
      hid(col("dst_host")).as("dst"))
    val hosts = edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .union(seedHosts.select(col("host")))
      .distinct()
      .withColumn("node", hid(col("host")))
    val seeds = seedHosts.select(hid(col("host")).as("node")).distinct()
    etlmudah.graph.Centrality.bfsDepths(e, seeds, maxHops)
      .join(broadcast(hosts), Seq("node"))
      .select(col("host"), col("depth"))
      .orderBy(col("depth"), col("host"))
  }

  /** PERSONALIZED host rank — [[hostRank]] with the teleport mass
    * pinned to a trusted seed-host set ([[etlmudah.graph.Centrality]]
    * `.personalizedPageRankInt`): the "rank the web by proximity to
    * hosts we already trust" prior (the seed-expansion discipline of
    * curated crawls). `seedHosts` is a (host STRING) frame; hosts not
    * in the graph are ignored. Output adds `is_seed`. */
  def hostRankSeeded(edges: DataFrame, seedHosts: DataFrame,
                     iters: Int = 3): DataFrame = {
    def hid(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(hid(col("src_host")).as("src"),
      hid(col("dst_host")).as("dst"), col("weight"))
    val hosts = edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .distinct()
      .withColumn("node", hid(col("host")))
    val seeds = seedHosts.select(hid(col("host")).as("node")).distinct()
    etlmudah.graph.Centrality.personalizedPageRankInt(e, seeds, iters)
      .join(broadcast(hosts), Seq("node"))
      .select(col("host"), col("is_seed"), col("rank"))
      .orderBy(desc("rank"), col("host"))
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
