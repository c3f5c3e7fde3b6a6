package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the URL canonicalizer — hand-built adversarial URLs
  * pinning each rule independently of the synth round-trip, plus the
  * public-suffix longest-match edge cases and malformed degradation. */
class UrlOpsSpec extends AnyFunSuite {

  private def canon(u: String): Option[String] =
    UrlOps.canonicalize(0L, u).map(_.canon_url)
  private def reg(u: String): Option[String] =
    UrlOps.canonicalize(0L, u).map(_.reg_domain)

  test("scheme/host case, www strip, default ports") {
    assert(canon("HTTPS://WWW.Ex.COM:443/") == Some("https://ex.com/"))
    assert(canon("http://ex.com:80/x") == Some("http://ex.com/x"))
    assert(canon("http://ex.com:443/x") == Some("http://ex.com:443/x")) // 443 NOT default for http
    assert(canon("https://ex.com:8080/x") == Some("https://ex.com:8080/x"))
    assert(canon("http://www.com/x") == Some("http://www.com/x")) // www. strip must not empty the host
  }

  test("fragments, tracking params, param sort, trailing slash") {
    assert(canon("http://ex.com/a/?utm_source=x&b=2&a=1&fbclid=F#frag") ==
      Some("http://ex.com/a?a=1&b=2"))
    assert(canon("http://ex.com/?gclid=G") == Some("http://ex.com/"))
    assert(canon("http://ex.com") == Some("http://ex.com/")) // empty path → root
    assert(canon("http://ex.com/p?z=1&z=0&y=9") == Some("http://ex.com/p?y=9&z=0&z=1"))
    // fragment containing '?' must not resurrect a query
    assert(canon("http://ex.com/p#frag?x=1") == Some("http://ex.com/p"))
  }

  test("registrable domain: longest public-suffix match, private suffixes") {
    assert(reg("http://a.b.site.co.uk/") == Some("site.co.uk"))
    assert(reg("http://deep.site.github.io/") == Some("site.github.io"))
    assert(reg("http://site.com/") == Some("site.com"))
    assert(reg("http://www.sub.site.org.uk/") == Some("site.org.uk"))
    // a bare public suffix has nothing registrable
    assert(UrlOps.canonicalize(0L, "http://co.uk/").isEmpty)
    // unknown TLD: no suffix match → dropped
    assert(UrlOps.canonicalize(0L, "http://site.nosuchtld/").isEmpty)
  }

  test("malformed URLs degrade to None, never throw") {
    Seq("", "not a url at all", "http://", "http://:80/", "http://ex.com:8a/x",
        "://ex.com", "ht tp://ex.com/").foreach { u =>
      assert(UrlOps.canonicalize(1L, u).isEmpty, s"url [$u]")
    }
  }

  test("synth round-trips: every id canonicalizes to the oracle's closed form") {
    (0L to 300L).filter(_ % 29 != 0).foreach { id =>
      val got = UrlOps.canonicalize(id, UrlOps.synthUrl(id))
        .getOrElse(fail(s"id $id did not canonicalize"))
      val tld = Seq("com", "org", "co.uk", "github.io")((id % 4).toInt)
      val schemeS = if (id % 2 == 0) "s" else ""
      val port = if (id % 5 == 1) ":8080" else ""
      val path = if (id % 3 == 0) "/" else s"/a/b${id % 7}"
      assert(got.canon_url ==
        s"http$schemeS://sub${id % 3}.site${id % 50}.$tld$port$path?a=${id % 3}&b=${id % 9}")
      assert(got.reg_domain == s"site${id % 50}.$tld")
    }
    (0L to 300L).filter(_ % 29 == 0).foreach { id =>
      assert(UrlOps.canonicalize(id, UrlOps.synthUrl(id)).isEmpty)
    }
  }
}
