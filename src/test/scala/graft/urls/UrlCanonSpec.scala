package graft.urls

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class UrlCanonSpec extends AnyFunSuite {

  /** Deterministic sampling (no scalatestplus bridge in the offline cache). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("canonicalize basics") {
    assert(UrlCanon.canonicalize("HTTP://WWW.Shugiin.GO.JP:80/index.nsf/html/index.htm") ==
      "http://www.shugiin.go.jp/index.nsf/html/index.htm")
    assert(UrlCanon.canonicalize("https://example.com:443/a/./b/../c") == "https://example.com/a/c")
    assert(UrlCanon.canonicalize("https://example.com") == "https://example.com/")
    assert(UrlCanon.canonicalize("https://example.com/p#frag") == "https://example.com/p")
    assert(UrlCanon.canonicalize("https://example.com/%7Euser/%41") == "https://example.com/~user/A")
    assert(UrlCanon.canonicalize("https://example.com/p?b=2&a=1") == "https://example.com/p?a=1&b=2")
    assert(UrlCanon.canonicalize("https://example.com:8080/p") == "https://example.com:8080/p")
  }

  test("canonicalize handles raw Japanese path/query characters") {
    assert(UrlCanon.canonicalize("https://kokkai.ndl.go.jp/検索?q=法律案&p=1") ==
      "https://kokkai.ndl.go.jp/検索?p=1&q=法律案")
  }

  test("resolve matches urljoin semantics") {
    val base = "https://www.shugiin.go.jp/internet/itdb_gian.nsf/html/gian/kaiji204.htm"
    assert(UrlCanon.resolve(base, "honbun/g20409011.htm") ==
      "https://www.shugiin.go.jp/internet/itdb_gian.nsf/html/gian/honbun/g20409011.htm")
    assert(UrlCanon.resolve(base, "/other/page.htm") == "https://www.shugiin.go.jp/other/page.htm")
    assert(UrlCanon.resolve(base, "https://other.jp/x") == "https://other.jp/x")
    assert(UrlCanon.resolve(base, "?q=1") ==
      "https://www.shugiin.go.jp/internet/itdb_gian.nsf/html/gian/kaiji204.htm?q=1")
    assert(UrlCanon.resolve(base, "../up.htm") ==
      "https://www.shugiin.go.jp/internet/itdb_gian.nsf/html/up.htm")
    assert(UrlCanon.resolve("https://example.com", "p1") == "https://example.com/p1")
  }

  test("hostOf") {
    assert(UrlCanon.hostOf("https://WWW.Sangiin.go.jp:443/x") == "www.sangiin.go.jp")
    assert(UrlCanon.hostOf("relative/path") == "")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https")
    host <- Gen.oneOf("Example.COM", "www.shugiin.go.jp", "H1.example.jp")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "B", ".", "..", "p%41", "法律"))
    q <- Gen.oneOf(None, Some("b=2&a=1"), Some("x=%7e"))
    frag <- Gen.oneOf(None, Some("sec"))
  } yield s"$scheme://$host$port/${segs.mkString("/")}" +
    q.map("?" + _).getOrElse("") + frag.map("#" + _).getOrElse("")

  test("property: fast path agrees with the full canonicalizer") {
    val canonGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https")
      host <- Gen.oneOf("h1.example.jp", "www.shugiin.go.jp", "a-b.c")
      segs <- Gen.listOfN(2, Gen.oneOf("p1", "B", "法律", "x.y", "index.htm", ""))
      tail <- Gen.oneOf("", "?b=2&a=1", "#f", " ", "/./x", "%41")
    } yield s"$scheme://$host/${segs.mkString("/")}$tail"
    for (url <- samples(canonGen, 400)) {
      assert(UrlCanon.canonicalize(url) == UrlCanon.canonicalizeSlow(url), s"url=$url")
      if (UrlCanon.isCanonicalFast(url))
        assert(UrlCanon.hostOf(url) == UrlCanon.parse(url).authority.toLowerCase, s"url=$url")
    }
  }

  test("property: canonicalize is idempotent") {
    for (url <- samples(urlGen, 300)) {
      val once = UrlCanon.canonicalize(url)
      assert(UrlCanon.canonicalize(once) == once, s"url=$url")
    }
  }

  test("property: equivalent forms share a canonical form and hash") {
    for (path <- Seq("a/b", "a/./b", "x/../a/b")) {
      val c1 = UrlCanon.canonicalize(s"https://E.com:443/$path")
      val c2 = UrlCanon.canonicalize("https://e.com/a/b")
      assert(c1 == c2, s"path=$path")
      assert(UrlCanon.urlHash(c1) == UrlCanon.urlHash(c2))
    }
  }

  test("urlHash matches Spark SQL xxhash64") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq("https://e.com/a", "https://h1.example.jp/p0?x=1", "日本語URL")
    val sparkHashes = vals.toDF("s").select(xxhash64($"s")).as[Long].collect().toSeq
    assert(sparkHashes == vals.map(UrlCanon.urlHash))
  }

  test("hostOfOrSame: same reference on host match, correct value otherwise") {
    val prev = "h7.example.jp"
    // match → the EXACT same reference (the allocation-free contract)
    assert(UrlCanon.hostOfOrSame("https://h7.example.jp/p3", prev) eq prev)
    assert(UrlCanon.hostOfOrSame("http://h7.example.jp/x/y", prev) eq prev)
    // different host → fresh correct value
    assert(UrlCanon.hostOfOrSame("https://h8.example.jp/p3", prev) == "h8.example.jp")
    // prefix/suffix near-misses must NOT match
    assert(UrlCanon.hostOfOrSame("https://h7.example.jp2/p3", prev) == "h7.example.jp2")
    assert(UrlCanon.hostOfOrSame("https://xh7.example.jp/p3", prev) == "xh7.example.jp")
    // slow-path URLs agree with hostOf
    for (u <- Seq("HTTPS://H7.Example.JP:443/p", "https://user@h.jp/p", "relative/path"))
      assert(UrlCanon.hostOfOrSame(u, prev) == UrlCanon.hostOf(u))
    assert(UrlCanon.hostOfOrSame("https://h.jp/p", null) == "h.jp")
  }
}
