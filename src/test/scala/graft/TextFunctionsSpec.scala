package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Text-analysis primitives on handcrafted strings. */
class TextFunctionsSpec extends SparkSpec {

  private def one[T](colExpr: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(colExpr).collect().head.get(0)
      .asInstanceOf[T]
  }

  private def oneList(colExpr: org.apache.spark.sql.Column,
      text: String): List[String] = {
    import spark.implicits._
    Seq(text).toDF("text").select(colExpr).collect().head
      .getSeq[String](0).toList
  }

  test("tokens: lowercased, whitespace-split, empties dropped") {
    val t = oneList(TextFunctions.tokens(col("text")),
      "  Hello   WORLD\tfoo\nbar  ")
    assert(t == List("hello", "world", "foo", "bar"))
    assert(oneList(TextFunctions.tokens(col("text")), "") == Nil)
  }

  test("shingles: consecutive k-grams, short input → empty") {
    val s = oneList(
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3),
      "a b c d")
    assert(s == List("a b c", "b c d"))
    assert(oneList(
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3),
      "a b") == Nil)
  }

  test("normalize + fingerprint collapse case/punctuation variants") {
    val f1 = one[String](TextFunctions.fingerprint(col("text")),
      "Hello, World!")
    val f2 = one[String](TextFunctions.fingerprint(col("text")),
      "hello world")
    assert(f1 == f2)
  }

  test("bpeTokenCount: letter runs, digit runs, single marks") {
    assert(one[Int](TextFunctions.bpeTokenCount(col("text")),
      "abc123 def!?") == 5) // abc, 123, def, !, ?
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    assert(one[String](TextFunctions.langId(col("text")),
      "the cat is in the house and it is warm") == "en")
    assert(one[String](TextFunctions.langId(col("text")),
      "der Hund ist nicht mit der Katze") == "de")
    assert(one[String](TextFunctions.langId(col("text")),
      "le chat est dans la maison pour un moment") == "fr")
    assert(one[String](TextFunctions.langId(col("text")),
      "el perro es por una casa con los gatos") == "es")
    assert(one[String](TextFunctions.langId(col("text")),
      "zzz qqq xxx") == "und")
  }

  test("qualityScore stays in [0,1] and rewards longer clean text") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val outOfRange = docs.select(
      TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(outOfRange == 0)
    val qLong = one[Double](TextFunctions.qualityScore(col("text")),
      ("the quick brown fox jumps over the lazy dog and keeps " * 10))
    val qJunk = one[Double](TextFunctions.qualityScore(col("text")),
      "#@! $% ^&*")
    assert(qLong > qJunk)
  }

  test("redactPii scrubs every email and phone, leaves clean text alone") {
    val dirty = "mail a.b-c_1%x@sub.example.co.uk then +1-555-0042 and " +
      "second@ex.io; call +44-123-9999 done"
    val got = one[String](TextFunctions.redactPii(col("text")), dirty)
    assert(got == "mail <EMAIL> then <PHONE> and <EMAIL>; call <PHONE> done")
    // nothing matchable survives the scrub
    assert(one[Int](TextFunctions.emailCount(col("text")), got) == 0)
    assert(one[Int](TextFunctions.phoneCount(col("text")), got) == 0)
    assert(one[Int](TextFunctions.emailCount(col("text")), dirty) == 2)
    assert(one[Int](TextFunctions.phoneCount(col("text")), dirty) == 2)
    // clean text is untouched (idempotence on redacted output included)
    val clean = "no personal data here, just words and 123 numbers"
    assert(one[String](TextFunctions.redactPii(col("text")), clean) == clean)
    assert(one[String](TextFunctions.redactPii(col("text")), got) == got)
  }

  test("htmlToText strips markup/script/style/comments, decodes core " +
      "entities in the right order, collapses whitespace") {
    def x(html: String): String =
      one[String](TextFunctions.htmlToText(col("text")), html)
    // script CONTENT goes, including a phantom tag opener (1<2) and a
    // literal closing tag inside a string; style, comments, and the
    // whole <head> (title text is chrome, not prose) go too
    assert(x("<html><head><title>Site name</title></head>" +
      "<body><style>p{a:1}</style><h1>T</h1>" +
      "<!-- menu\nstuff --><p>hello   world</p>" +
      "<script>if(1<2){var s='</div>';}</script></body></html>") ==
      "T hello world")
    // entity decode: &amp; LAST, so &amp;lt; is the literal text &lt;
    assert(x("a &lt;b&gt; &quot;c&quot; &#39;d&apos; e&nbsp;f &amp; " +
      "g &amp;lt; h") == "a <b> \"c\" 'd' e f & g &lt; h")
    // decoded entities are TEXT, not markup — never re-stripped
    assert(x("<p>&lt;script&gt;x&lt;/script&gt;</p>") ==
      "<script>x</script>")
    // HTML5 raw-text rule: a literal "</script>" inside a JS string
    // still CLOSES the script element (browsers do the same — pages
    // must write "<\/script>"), so the fragment after it is rendered
    // text, exactly like a browser, modulo tag-boundary spacing
    assert(x("<script>var s='</script>';alert(1)</script>after") ==
      "';alert(1) after")
    // block tags become separators, not concatenation
    assert(x("<p>one</p><p>two</p>") == "one two")
    // plain text passes through normalized; malformed markup degrades
    // to stripped spans, never an error
    assert(x("just\n\n text\t here") == "just text here")
    assert(x("<p unclosed attr >ok") == "ok")
    assert(x("") == "")
  }

  test("htmlToText decodes numeric character references — decimal and " +
      "hex, astral code points — and passes malformed or out-of-range " +
      "references through verbatim") {
    def x(html: String): String =
      one[String](TextFunctions.htmlToText(col("text")), html)
    // the ubiquitous crawl cases: smart quote (decimal), NBSP (hex),
    // uppercase-X hex, astral emoji (surrogate pair emitted)
    assert(x("it&#8217;s") == "it’s")
    assert(x("a&#xA0;b") == "a b")
    assert(x("q&#X2019;q") == "q’q")
    assert(x("hi &#128512;!") == "hi 😀!")
    // decimal apostrophe still decodes (moved from the named list to
    // the kernel), named entities still decode after numerics
    assert(x("&#39;d&apos; &amp; &lt;x&gt;") == "'d' & <x>")
    // malformed / unterminated / empty / overlong / zero / surrogate /
    // beyond-Unicode references pass through verbatim — totality
    assert(x("&#; &#xzz; &#x; &#38 end") == "&#; &#xzz; &#x; &#38 end")
    assert(x("&#0; &#xD800; &#1114112; &#99999999;") ==
      "&#0; &#xD800; &#1114112; &#99999999;")
    // no rescan: a decoded '&' never combines with following text into
    // a second decode round within the kernel
    assert(x("&#38;#60;") == "&#60;")
    // double-escaped NAMED entity via &amp; still yields literal text
    assert(x("g &amp;lt; h") == "g &lt; h")
  }

  test("normalizeUnicode: NFKC folds fullwidth + ligatures and " +
      "composes accents, NFC composes without compatibility folding, " +
      "both idempotent; dedup keys collide across Unicode forms") {
    // every non-ASCII literal is an explicit escape so no editor or
    // formatter can silently re-normalize the test inputs
    val fwAbc = "\uFF21\uFF42\uFF43"        // fullwidth Abc
    val fiLig = "\uFB01le"                    // fi-ligature + "le"
    val eDecomp = "e\u0301"                   // e + combining acute
    val eComp = "\u00E9"                      // precomposed
    val ohm = "\u2126"                        // ohm sign
    val omega = "\u03A9"                      // Greek capital omega
    def nk(s: String): String =
      one[String](TextFunctions.normalizeUnicode(col("text")), s)
    def nc(s: String): String =
      one[String](TextFunctions.normalizeUnicode(col("text"), "NFC"), s)
    // NFKC: compatibility folding — fullwidth letters, the fi ligature
    assert(nk(fwAbc) == "Abc")
    assert(nk(fiLig) == "file")
    // both forms compose decomposed accents; NFC keeps fullwidth as-is
    assert(nk(eDecomp) == eComp && nc(eDecomp) == eComp)
    assert(nc(fwAbc) == fwAbc)
    // ohm sign canonically maps to Greek capital omega in BOTH forms
    assert(nc(ohm) == omega && nk(ohm) == omega)
    // idempotent; plain ASCII passes through untouched
    assert(nk(nk(fwAbc + eDecomp + fiLig)) == nk(fwAbc + eDecomp + fiLig))
    assert(nc("plain ascii 123") == "plain ascii 123")
    // the point: the same visible text in different Unicode forms
    // fingerprints identically once normalized
    val composed = "caf" + eComp + " r" + eComp + "sum" + eComp
    val decomposed = "caf" + eDecomp + " r" + eDecomp + "sum" + eDecomp
    assert(composed != decomposed) // genuinely different byte forms
    assert(one[String](md5(TextFunctions.normalizeUnicode(col("text"))),
      composed) ==
      one[String](md5(TextFunctions.normalizeUnicode(col("text"))),
        decomposed))
  }

  test("url parsing: host/port/path/query across userinfo, trailing " +
      "dots, casing, and authority-only URLs; malformed input is total") {
    import graft.functions.UrlFunctions._
    def host(u: String) = one[String](urlHost(col("text")), u)
    def port(u: String) = one[String](urlPort(col("text")), u)
    def path(u: String) = one[String](urlPath(col("text")), u)
    def query(u: String) = one[String](urlQuery(col("text")), u)
    assert(host("HTTPS://WWW.Example.COM:443/a?b#c") == "www.example.com")
    assert(host("http://user:pw@Host.Org:8080/x") == "host.org")
    assert(host("http://fqdn.example.net./") == "fqdn.example.net")
    assert(host("http://h?q=1") == "h") // authority-only + query
    assert(port("http://h:8080/x") == "8080" && port("http://h/x") == "")
    assert(path("https://h:443/A/B?q") == "/A/B" && path("http://h") == "")
    assert(query("http://h/p?a=1&b=2#frag") == "a=1&b=2")
    // malformed / non-URL input degrades to empty parts, never throws
    for (bad <- Seq("", "not a url", "mailto:x@y.z", "://nohost"))
      assert(host(bad) == "", bad)
  }

  test("registeredDomain: two-label default, cc-second-level three-" +
      "label case, single-label host is its own domain") {
    import graft.functions.UrlFunctions._
    def rd(h: String) = one[String](registeredDomain(col("text")), h)
    assert(rd("news.example.co.uk") == "example.co.uk")
    assert(rd("a.b.example.com.au") == "example.com.au")
    assert(rd("cdn.mirror.org") == "mirror.org")
    assert(rd("deep.sub.domain.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("localhost") == "localhost")
  }

  test("registeredDomain under a public-suffix list: multi-level and " +
      "private suffixes, wildcard and exception rules, longest match, " +
      "implicit-* default, host-is-a-suffix totality") {
    import graft.functions.UrlFunctions._
    val psl = Seq(
      "// ===BEGIN ICANN DOMAINS===", "", // comments/blanks skipped
      "com", "uk", "co.uk", "io",
      "*.ck", "!www.ck",
      "// ===BEGIN PRIVATE DOMAINS===",
      "github.io", "s3.amazonaws.com")
    def rd(h: String) =
      one[String](registeredDomain(col("text"), psl), h)
    // longest match wins: co.uk over uk; github.io (private) over io
    assert(rd("news.example.co.uk") == "example.co.uk")
    assert(rd("example.uk") == "example.uk")
    assert(rd("project.user.github.io") == "user.github.io")
    assert(rd("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    assert(rd("deep.sub.example.com") == "example.com")
    // wildcard *.ck: any x.ck is a public suffix...
    assert(rd("shop.foo.bar.ck") == "foo.bar.ck")
    // ...except the !www.ck exception, whose suffix is just ck
    assert(rd("www.ck") == "www.ck")
    assert(rd("sub.www.ck") == "www.ck")
    // unlisted TLD: implicit * rule (last label is the suffix)
    assert(rd("example.zz") == "example.zz")
    assert(rd("a.b.example.zz") == "example.zz")
    // PSL matching is case-insensitive: a directly-passed uppercase
    // host must not miss every rule
    assert(rd("News.Example.CO.UK") == "example.co.uk")
    // a host that IS a public suffix returns itself (totality), as do
    // single-label hosts and empty strings
    assert(rd("github.io") == "github.io")
    assert(rd("com") == "com")
    assert(rd("localhost") == "localhost")
    assert(rd("") == "")
    // the heuristic form groups the private suffix WRONG (collapses
    // every github.io user site into one "domain") — the reason the
    // PSL overload exists
    assert(one[String](registeredDomain(col("text")),
      "project.user.github.io") == "github.io")
    // totality branches return the GROUPING-KEY form (lowercased),
    // not the raw input — case variants of suffix-hosts must not
    // split into distinct domains
    assert(rd("GitHub.IO") == "github.io")
    assert(rd("COM") == "com")
    assert(rd("LocalHost") == "localhost")
  }

  test("registeredDomain under a PSL bridges IDN hosts through " +
      "punycode: unicode hosts match the punycode rules the real list " +
      "carries, outputs group with already-punycoded hosts, IDNA " +
      "rejects degrade to the raw host") {
    import graft.functions.UrlFunctions._
    // the real publicsuffix.org list stores IDN rules in punycode
    val psl = Seq("de", "com", "io", "github.io", "xn--p1ai")
    def rd(h: String) =
      one[String](registeredDomain(col("text"), psl), h)
    // unicode host → punycode registered domain under a punycode rule
    assert(rd("www.münchen.de") == "xn--mnchen-3ya.de")
    assert(rd("пример.рф") == "xn--e1afmkfd.xn--p1ai")
    // unicode label UNDER an ASCII registrable part: the registered
    // domain is pure ASCII and must match the non-IDN answer
    assert(rd("bücher.example.com") == "example.com")
    // private-suffix rule with a unicode registrable label
    assert(rd("café.github.io") == "xn--caf-dma.github.io")
    // the SAME grouping key whether the caller passes unicode or the
    // already-punycoded wire form — that equality IS the fix
    assert(rd("MÜNCHEN.de") == rd("xn--mnchen-3ya.de"))
    // IDNA2003 ß→ss folding (java.net.IDN default flags)
    assert(rd("faß.de") == "fass.de")
    // a host IDNA rejects (empty label from a double dot) degrades to
    // the lowercased raw host — totality over crawl garbage
    assert(rd("bad..ü.de").nonEmpty)
    // pure-ASCII hosts are untouched by the bridge
    assert(rd("plain.example.com") == "example.com")
    // the standalone grouping form: unicode and wire-form hosts
    // produce ONE key, ASCII passes through lowercased, rejects
    // degrade instead of throwing
    def ha(h: String) = one[String](hostAscii(col("text")), h)
    assert(ha("www.MÜNCHEN.de") == "www.xn--mnchen-3ya.de")
    assert(ha("www.münchen.de") == ha("WWW.xn--MNCHEN-3ya.de"))
    assert(ha("Plain.Example.COM") == "plain.example.com")
    assert(ha("bad..ü.de").nonEmpty)
  }

  test("normalizeUrl: lowercases scheme+host, drops userinfo/fragment/" +
      "default ports/utm params, keeps case-significant path+query and " +
      "non-default ports, renders empty path as /") {
    import graft.functions.UrlFunctions._
    def n(u: String) = one[String](normalizeUrl(col("text")), u)
    assert(n("HTTPS://WWW.Ex.COM:443/Art/9?utm_source=f&page=2#frag") ==
      "https://www.ex.com/Art/9?page=2")
    assert(n("http://u:p@Host.ORG:80/a?id=7&utm_campaign=x") ==
      "http://host.org/a?id=7")
    assert(n("https://h.net:8443/x") == "https://h.net:8443/x")
    assert(n("http://H.com?utm_a=1&utm_b=2") == "http://h.com/")
    // utm removal in the middle keeps a single joining &
    assert(n("http://h.com/p?a=1&utm_x=2&b=3") == "http://h.com/p?a=1&b=3")
    // unparseable input → empty string, total
    assert(n("nonsense") == "")
  }
}
