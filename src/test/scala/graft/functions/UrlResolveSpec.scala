package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFC 3986 §5.4 reference-resolution battery — every normal AND
  * abnormal example from the RFC, against the RFC's own base
  * `http://a/b/c/d;p?q`, plus the expression face and the strict-mode
  * same-scheme case.
  */
class UrlResolveSpec extends SparkSpec {
  import spark.implicits._

  private val base = "http://a/b/c/d;p?q"
  private def r(ref: String) = UrlResolve.resolve(base, ref)

  test("RFC 3986 §5.4.1 normal examples") {
    r("g:h") shouldBe "g:h"
    r("g") shouldBe "http://a/b/c/g"
    r("./g") shouldBe "http://a/b/c/g"
    r("g/") shouldBe "http://a/b/c/g/"
    r("/g") shouldBe "http://a/g"
    r("//g") shouldBe "http://g"
    r("?y") shouldBe "http://a/b/c/d;p?y"
    r("g?y") shouldBe "http://a/b/c/g?y"
    r("#s") shouldBe "http://a/b/c/d;p?q#s"
    r("g#s") shouldBe "http://a/b/c/g#s"
    r("g?y#s") shouldBe "http://a/b/c/g?y#s"
    r(";x") shouldBe "http://a/b/c/;x"
    r("g;x") shouldBe "http://a/b/c/g;x"
    r("g;x?y#s") shouldBe "http://a/b/c/g;x?y#s"
    r("") shouldBe "http://a/b/c/d;p?q"
    r(".") shouldBe "http://a/b/c/"
    r("./") shouldBe "http://a/b/c/"
    r("..") shouldBe "http://a/b/"
    r("../") shouldBe "http://a/b/"
    r("../g") shouldBe "http://a/b/g"
    r("../..") shouldBe "http://a/"
    r("../../") shouldBe "http://a/"
    r("../../g") shouldBe "http://a/g"
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    // over-popping past the root is absorbed
    r("../../../g") shouldBe "http://a/g"
    r("../../../../g") shouldBe "http://a/g"
    r("/./g") shouldBe "http://a/g"
    r("/../g") shouldBe "http://a/g"
    // '.'/'..' are only dot segments as COMPLETE segments
    r("g.") shouldBe "http://a/b/c/g."
    r(".g") shouldBe "http://a/b/c/.g"
    r("g..") shouldBe "http://a/b/c/g.."
    r("..g") shouldBe "http://a/b/c/..g"
    // nonsensical-but-legal combinations
    r("./../g") shouldBe "http://a/b/g"
    r("./g/.") shouldBe "http://a/b/c/g/"
    r("g/./h") shouldBe "http://a/b/c/g/h"
    r("g/../h") shouldBe "http://a/b/c/h"
    r("g;x=1/./y") shouldBe "http://a/b/c/g;x=1/y"
    r("g;x=1/../y") shouldBe "http://a/b/c/y"
    // strict mode: a same-scheme reference stays absolute
    r("http:g") shouldBe "http:g"
  }

  test("edge shapes beyond the RFC battery") {
    // absolute reference with dot segments in its own path
    r("http://other.test/x/./y/../z") shouldBe "http://other.test/x/z"
    // network-path reference with dot segments
    r("//h2.test/a/../b") shouldBe "http://h2.test/b"
    // base with authority and EMPTY path: merge prepends '/'
    UrlResolve.resolve("http://h.test", "x/y") shouldBe "http://h.test/x/y"
    // a ':' in a relative path is not a scheme
    r("./a:b") shouldBe "http://a/b/c/a:b"
    // query-only reference drops the base fragmentless query correctly
    UrlResolve.resolve("http://h.test/p?old#f", "?new") shouldBe
      "http://h.test/p?new"
  }

  test("expression face: codegen over a frame, null-safe") {
    val df = Seq(
      ("http://a/b/c/d;p?q", "../g"),
      ("http://a/b/c/d;p?q", null.asInstanceOf[String]))
      .toDF("base", "href")
      .select(ResolveUrlFunctions.resolveUrl(col("base"), col("href"))
        .as("u"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    got shouldBe Array("http://a/b/g", null)
  }
}
