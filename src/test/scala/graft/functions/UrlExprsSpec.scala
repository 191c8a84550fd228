package graft.functions

import graft.SparkTestSession
import graft.urls.UrlCanon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlExprsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val urls = Seq(
    "HTTP://Host3.Example.JP:80/a/./b/../c7?b=2&a=1#frag",
    "https://www.shugiin.go.jp/internet/itdb.nsf/html/x.htm",
    "http://h0.example.jp/p0")

  test("CanonicalizeUrl expression == UrlCanon.canonicalize, inside codegen") {
    val got = urls.toDF("u")
      .select(UrlFns.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(got == urls.map(UrlCanon.canonicalize))
  }

  test("ResolveUrl / UrlHost expressions match the engine functions") {
    val got = Seq(("https://a.example.jp/dir/page.html", "../x.pdf")).toDF("base", "href")
      .select(UrlFns.resolveUrl($"base", $"href").as("r"),
        UrlFns.urlHost(UrlFns.canonicalizeUrl($"base")).as("h"))
      .as[(String, String)].head()
    assert(got._1 == UrlCanon.resolve("https://a.example.jp/dir/page.html", "../x.pdf"))
    assert(got._2 == "a.example.jp")
  }

  test("SQL registration: the functions are callable from pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT canonicalize_url('HTTP://A.Example.JP:80/x/../y?b=2&a=1') AS c,
        |  url_host('https://h9.example.jp/p') AS h,
        |  poly_hash('abc') AS ph,
        |  simhash64(array('a','b')) AS sh,
        |  size(xx_shingle_hashes(array('a','b','c','d'))) AS nx,
        |  dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin).head()
    assert(r.getAs[String]("c") == UrlCanon.canonicalize("HTTP://A.Example.JP:80/x/../y?b=2&a=1"))
    assert(r.getAs[String]("h") == "h9.example.jp")
    assert(r.getAs[Long]("ph") == HashImpl.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getAs[Int]("nx") == 2)
    assert(r.getAs[Double]("dp") == 11.0)
  }

  test("SQL registration: optional shingle width is honored; wrong arity fails at plan time") {
    // 4 tokens: 3 bigrams, 2 trigrams
    assert(spark.sql("SELECT size(xx_shingle_hashes(array('a','b','c','d'), 2)) AS n")
      .head().getAs[Int]("n") == 3)
    assert(spark.sql("SELECT size(poly_shingle_hashes(array('a','b','c','d'), 2)) AS n")
      .head().getAs[Int]("n") == 3)
    val e = intercept[Exception](spark.sql("SELECT dot_f64(array(1.0d))").head())
    assert(e.getMessage.contains("dot_f64"))
    val e2 = intercept[Exception](spark.sql("SELECT url_host('a', 'b')").head())
    assert(e2.getMessage.contains("url_host"))
  }
}
