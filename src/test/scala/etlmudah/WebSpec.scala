package etlmudah.web

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {

  test("urlHost: scheme/port/path/query/fragment all cut; garbage yields ''") {
    import spark.implicits._
    val cases = Seq(
      ("https://www.example.com/a/b?q=1", "www.example.com"),
      ("http://example.co.uk:8080/x", "example.co.uk"),
      ("ftp://files.example.org#frag", "files.example.org"),
      ("custom+v1.0://h.example.my/p", "h.example.my"),
      ("not a url", ""),
      ("", ""))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Web.urlHost(col("url")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    cases.foreach { case (u, want) => assert(got(u) == want, s"url=$u") }
  }

  test("registeredDomain: eTLD+1 under the multi-suffix list; short hosts pass through") {
    import spark.implicits._
    val cases = Seq(
      ("www.example.com", "example.com"),
      ("a.b.c.example.com", "example.com"),
      ("blog.example.co.uk", "example.co.uk"),
      ("example.co.uk", "example.co.uk"),        // exactly label+multi-suffix
      ("deep.sub.shop.com.my", "shop.com.my"),
      ("example.com", "example.com"),
      ("localhost", "localhost"),
      ("co.uk", "co.uk"),                        // bare suffix: n<=2 passthrough
      ("WWW.Example.COM", "example.com"),        // DNS case-insensitivity
      ("", ""))
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), Web.registeredDomain(col("h")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"host=$h") }
  }

  test("domainStats: hand-computed grouping, host distincts, and shares summing to 1") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://www.pub.com/a", "one two"),
      (2L, "https://blog.pub.com/b", "three"),
      (3L, "https://pub.com/c", "four five six"),
      (4L, "https://other.co.uk/d", "seven")).toDF("id", "url", "text")
    val got = Web.domainStats(df, "url", "text").collect()
    val byDom = got.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byDom("pub.com") == ((3L, 3L, 6L, 0.75)))
    assert(byDom("other.co.uk") == ((1L, 1L, 1L, 0.25)))
    assert(math.abs(got.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("domainCap: at most cap per domain, deterministic, kept rows are real rows") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("url", Web.fakeUrl(col("doc_id"), col("source")))
    val kept = Web.domainCap(docs, "url", "doc_id", cap = 5)
    val per = kept.groupBy(col("domain")).count().collect()
    assert(per.nonEmpty && per.forall(_.getLong(1) <= 5L))
    // some domain actually hits the cap (the corpus is bigger than 5/domain)
    assert(per.exists(_.getLong(1) == 5L))
    // kept ids are a subset of the corpus and the pick is deterministic
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(all))
    val again = Web.domainCap(docs, "url", "doc_id", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
  }

  test("canonicalUrl: each rule lands; equivalence classes collide; idempotent") {
    import spark.implicits._
    val fixtures = Seq(
      // case + www + default https port + tracking + fragment + slash
      ("a1", "HTTPS://WWW.Example.COM:443/p/5/?b=2&utm_source=x&a=1#sec"),
      ("a2", "https://example.com/p/5?a=1&b=2&fbclid=z"),
      // same page, param order shuffled and a ref tracker
      ("a3", "https://Example.com/p/5/?ref=tw&b=2&a=1"),
      // DIFFERENT page: same params but a real extra param
      ("b1", "https://example.com/p/5?a=1&b=2&c=3"),
      // http default port drops; NON-default port survives
      ("c1", "http://site.org:80/x"), ("c2", "http://site.org/x"),
      ("c3", "http://site.org:8080/x"),
      // root path collapses to the bare host; all-tracking query drops
      ("d1", "https://host.net/?utm_campaign=q"), ("d2", "https://host.net"),
      // www is a host PREFIX rule, not a substring rule
      ("e1", "https://www.www-stats.com/p"),
      // garbage: no scheme -> null, never a colliding empty key
      ("g1", "not a url"), ("g2", "/relative/only"))
    val got = fixtures.toDF("id", "url")
      .select(col("id"), Web.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a1") == Some("https://example.com/p/5?a=1&b=2"))
    assert(got("a1") == got("a2") && got("a2") == got("a3"))
    assert(got("b1") == Some("https://example.com/p/5?a=1&b=2&c=3"))
    assert(got("b1") != got("a1"))
    assert(got("c1") == Some("http://site.org/x") && got("c1") == got("c2"))
    assert(got("c3") == Some("http://site.org:8080/x"))
    assert(got("d1") == Some("https://host.net") && got("d1") == got("d2"))
    assert(got("e1") == Some("https://www-stats.com/p"))
    assert(got("g1").isEmpty && got("g2").isEmpty)
    // idempotence: canonicalizing a canonical form is the identity
    val twice = fixtures.toDF("id", "url")
      .select(col("id"), Web.canonicalUrl(col("url")).as("c"))
      .select(col("id"), col("c"), Web.canonicalUrl(col("c")).as("cc"))
      .filter(col("c").isNotNull)
      .collect()
    twice.foreach(r => assert(r.getString(1) == r.getString(2), r.getString(0)))
  }

  test("htmlToText: element drops, block newlines, entity order, whitespace") {
    import spark.implicits._
    val cases = Seq(
      // script body contains < and a fake close-tag prefix: the
      // non-greedy match must run to the REAL close tag, no further
      ("s1", """a<script>if (1 < 2) x = "</scr";</script>b""", "a b"),
      // a style block inside head, tags stripped, title text kept
      ("s2", "<head><title>T</title><style>p { c:1 }</style></head>", "T"),
      ("s3", "x<!-- hidden <b>bold</b> -->y", "x y"),
      // block tags break lines; inline tags become spaces, not welds
      ("s4", "<p>one</p><p>two</p>", "one\ntwo"),
      ("s5", "fine<em>print</em>here", "fine print here"),
      ("s6", "a<br/>b", "a\nb"),
      // entity decode order: &amp;lt; must yield the LITERAL "&lt;"
      ("e1", "&amp;lt; &lt;b&gt; &quot;q&quot; &#39;a&#39; &nbsp;", "&lt; <b> \"q\" 'a'"),
      // whitespace: runs collapse, spaces hugging newlines drop,
      // newline runs collapse, ends trim
      ("w1", "  a   b  \t c  ", "a b c"),
      ("w2", "<p> a </p> <p> b </p>", "a\nb"),
      // unclosed trailing < survives (regex tier, not a DOM parse)
      ("u1", "text <unclosed", "text <unclosed"))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "h")
      .select(col("id"), Web.htmlToText(col("h")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) => assert(got(id) == want, s"case=$id got=[${got(id)}]") }
  }

  test("metaRobots/metaNoindex: attribute orders, quoting, case, word boundaries") {
    import spark.implicits._
    val cases = Seq(
      ("n1", """<meta name="robots" content="noindex, follow">""", "noindex, follow", true),
      // content BEFORE name — attribute order is free in HTML
      ("n2", """<meta content="NOINDEX" name="robots">""", "noindex", true),
      ("n3", """<meta name='robots' content='none'>""", "none", true),
      ("n4", """<meta name="robots" content="index, follow">""", "index, follow", false),
      // word boundary: a 'noindexing' token must not fire
      ("n5", """<meta name="robots" content="noindexing">""", "noindexing", false),
      ("n6", """<meta name="author" content="x">""", "", false),
      ("n7", "no meta at all", "", false),
      // tag buried mid-document, uppercase tag/attr names
      ("n8", """<html><head><META NAME="robots" CONTENT="NONE"></head>""", "none", true))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "h")
      .select(col("id"), Web.metaRobots(col("h")).as("d"),
        Web.metaNoindex(col("h")).as("ni"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    cases.foreach { case (id, _, d, ni) =>
      assert(got(id) == ((d, ni)), s"case=$id got=${got(id)}") }
  }

  test("htmlToText over fakeHtml: doc text survives verbatim inside the page") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val rows = docs.select(col("text"),
        Web.htmlToText(Web.fakeHtml(col("doc_id"), col("text"))).as("t"))
      .collect()
    rows.foreach { r =>
      val (text, t) = (r.getString(0), r.getString(1))
      assert(t.contains(text), "doc text must survive extraction verbatim")
      assert(!t.contains("<script") && !t.contains("color:#333") &&
        !t.contains("crawl") && !t.contains("&amp;"),
        "script/style/comment bodies and undecoded entities must not leak")
      assert(t.startsWith("Doc ") && t.contains("Title & Doc "),
        "title text and decoded & must both be present")
    }
  }

  test("pslRegisteredDomain: longest match, wildcard, exception, default, bare-suffix null") {
    import spark.implicits._
    val rules = Seq("// comment line", "", "com", "uk", "co.uk",
      "*.ck", "!www.ck", "jp", "kobe.jp", "*.kobe.jp").toDF("rule")
    val cases = Seq(
      // nested suffixes: co.uk (2 labels) must beat uk (1)
      ("blog.example.co.uk", "example.co.uk"),
      ("example.co.uk", "example.co.uk"),
      ("CO.UK", null),                      // host IS a public suffix
      // wildcard *.ck: example.ck is a public suffix
      ("a.b.example.ck", "b.example.ck"),
      ("example.ck", null),
      // exception !www.ck overrides the wildcard: ps = ck
      ("www.ck", "www.ck"),
      ("sub.www.ck", "www.ck"),
      // nested wildcard under a plain rule (real PSL shape for .jp)
      ("x.y.kobe.jp", "x.y.kobe.jp"),       // *.kobe.jp: ps = y.kobe.jp
      ("city.kobe.jp", null),               // matches *.kobe.jp itself
      ("example.kobe.jp", null),
      ("foo.jp", "foo.jp"),
      // no rule matches: default * — ps is the TLD
      ("example.org", "example.org"),
      ("deep.sub.example.org", "example.org"),
      ("localhost", null))
    val got = cases.map(_._1).toDF("host")
      .transform(d => Web.pslRegisteredDomain(d, "host", rules))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host=$h got=${got(h)} want=$want") }
    // the heuristic tier keeps its documented behavior on its own list
    // (q174/q175/q190's contract is untouched by the PSL tier)
    val heur = Seq("blog.example.co.uk").toDF("h")
      .select(Web.registeredDomain(col("h"))).collect()(0).getString(0)
    assert(heur == "example.co.uk")
  }

  test("robotsPathGate: longest match, allow-wins ties, wildcard, anchor, literal %, default allow") {
    import spark.implicits._
    val rules = Seq(
      ("a.com", "disallow", "/private"),
      ("a.com", "allow", "/private/ok"),       // longer allow wins inside
      ("a.com", "disallow", "/tmp*.html$"),    // wildcard + anchor
      ("b.org", "allow", "/x"),
      ("b.org", "disallow", "/x"),             // exact tie: allow wins
      ("c.net", "disallow", "/100%"),          // literal % must not wildcard
      ("d.io", "disallow", "/"))               // block everything
      .toDF("host", "directive", "path")
    val cases = Seq(
      (1L, "https://a.com/private/doc", false),
      (2L, "https://a.com/private/ok/doc", true),
      (3L, "https://a.com/public", true),
      (4L, "https://a.com/tmp123.html", false),
      (5L, "https://a.com/tmp123.html?q=1", false), // query cut before match
      (6L, "https://a.com/tmp123.htmlx", true),     // anchor holds
      (7L, "https://b.org/x/y", true),              // tie -> allow
      (8L, "https://c.net/100%25", false)
        .copy(_2 = "https://c.net/100%"),           // literal % blocked
      (9L, "https://c.net/100x", true),             // % did not wildcard
      (10L, "https://d.io/", false),
      (11L, "https://d.io", false),                 // empty path -> "/"
      (12L, "https://unruled.com/anything", true))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "url")
      .transform(d => Web.robotsPathGate(d, "url", "id", rules))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    cases.foreach { case (id, url, want) =>
      assert(got(id) == want, s"id=$id url=$url got=${got(id)}") }
  }

  test("robotsPathGate: RFC 9309 empty rule value means no restriction, not match-all") {
    import spark.implicits._
    // an empty Disallow (and a null path) must be ignored entirely —
    // naively compiled they'd become LIKE '%' at precedence 0 and turn
    // every otherwise-unmatched b.org path into a disallow (case 3)
    val rules = Seq(
      ("a.com", "disallow", ""),
      ("a.com", "disallow", null),
      ("b.org", "disallow", ""),
      ("b.org", "disallow", "/x"),
      ("b.org", "allow", "/x"))
      .toDF("host", "directive", "path")
    val cases = Seq(
      (1L, "https://a.com/anything", true),   // only empty rules -> default allow
      (2L, "https://b.org/x/y", true),        // tie on /x -> allow wins
      (3L, "https://b.org/other", true))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "url")
      .transform(d => Web.robotsPathGate(d, "url", "id", rules))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    cases.foreach { case (id, url, want) =>
      assert(got(id) == want, s"id=$id url=$url got=${got(id)}") }
  }

  test("hrefHosts: absolute hrefs only, both quote styles, lowercased, dups kept") {
    import spark.implicits._
    val html =
      """<a href="https://A.Example.COM/path?q=1">x</a>
        |<a class="o" href='http://b.org:8080/y'>y</a>
        |<a href="/relative/z">rel</a><a href="#frag">f</a>
        |<a href="mailto:x@example.com">m</a>
        |<a data-x="1" href="https://a.example.com">again</a>
        |<p>no link</p>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Web.hrefHosts(col("h")).as("hosts"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a.example.com", "b.org", "a.example.com"),
      s"got $got")
    // mailto: matched? 'mailto' has no '//' so it must not — asserted
    // by the exact list above; empty page yields empty array not null
    val empty = Seq("<p>none</p>").toDF("h")
      .select(Web.hrefHosts(col("h")).as("hosts")).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("hrefHostAnchors: (host, anchor) pairs zip in match order; relative links skipped") {
    import spark.implicits._
    val html =
      """<a href="https://A.com/x">First Link</a>
        |<a href="/rel">nope</a>
        |<a class="z" href='http://b.org'>  spaced  </a>
        |<a href="https://c.net/p?q=1">c</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Web.hrefHostAnchors(col("h"))).as("p"))
      .select(col("p.host"), col("p.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a.com", "First Link"), ("b.org", "spaced"),
      ("c.net", "c")), got.toString)
  }

  test("hostLinkEdges: weighted host->host edges, self-links dropped") {
    import spark.implicits._
    val pages = Seq(
      ("https://src1.com/a",
        "<a href='https://dst.org'>1</a><a href='http://dst.org/p'>2</a>" +
          "<a href='https://src1.com/self'>self</a>"),
      ("https://src2.com/b", "<a href=\"https://dst.org\">1</a>"),
      ("https://src2.com/c", "<a href=\"https://src1.com\">1</a>"))
      .toDF("url", "page")
    val got = Web.hostLinkEdges(pages, "url", "page").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("src1.com", "dst.org") -> 2L,
      ("src2.com", "dst.org") -> 1L,
      ("src2.com", "src1.com") -> 1L), s"got $got")
  }

  test("hostRank: in-link-favored host ranks first; integer lattice hand-checked") {
    import spark.implicits._
    // a -> c, b -> c: N=3, r0 = scale div 3; c's round-1 contribution
    // is r0 from a plus r0 from b (single out-edges, weight/outw = 1)
    val edges = Seq(("a.com", "c.com", 1L), ("b.com", "c.com", 1L))
      .toDF("src_host", "dst_host", "weight")
    val got = Web.hostRank(edges, iters = 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val scale = 1000000000000L
    val r0 = scale / 3
    val base = (15 * scale) / (100 * 3)
    val cRank = base + (85 * (r0 + r0)) / 100
    assert(got.head == (("c.com", cRank)), s"got ${got.head}")
    // a and b tie on rank (no in-links): host ASC breaks the tie
    assert(got(1) == (("a.com", base)) && got(2) == (("b.com", base)))
  }

  test("fakeLinkUrls round-trip: hrefHosts over the linked fakeHtml " +
    "recovers exactly the closed-form target hosts") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    val id = col("doc_id")
    val rows = docs.select(id.as("i"),
        Web.hrefHosts(Web.fakeHtml(id, col("text"),
          lit(null).cast("string"), Web.fakeLinkUrls(id))).as("hosts"),
        Web.fakeHost(id + 1).as("h1"),
        Web.fakeHost(id * 3 + 5).as("h2"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == Seq(r.getString(2), r.getString(3)),
        s"doc ${r.getLong(0)}: ${r.getSeq[String](1)}")
    }
  }
}
