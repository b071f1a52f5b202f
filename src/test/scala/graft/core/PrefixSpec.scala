package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's only hermetic unit tests
  * (`/root/reference/test/testCommon.js:1-26`) plus seeded property-style
  * checks for the resolution chain and fail-open filter.
  */
class PrefixSpec extends AnyFunSuite {
  import Prefix._

  test("parses string suppression lists") {
    assert(parseSuppressionList(Some("bucket/a=1/b=2/bob, bucket/z=200/y=whatever/dude")) ==
      SuppressPrefixes(Set("bucket/a=1/b=2/bob", "bucket/z=200/y=whatever/dude")))
    assert(parseSuppressionList(Some("*")) == SuppressAll)
    assert(parseSuppressionList(None) == SuppressNone)
  }

  test("suppresses all wildcard transforms") {
    assert(transformHiveStylePrefix("bucket/a=1/b=2/bob", SuppressAll) == "bucket/a=1/b=2/bob")
  }

  test("transforms hive-style prefix") {
    val suppress = SuppressPrefixes(Set("bucket/a=1/b=2/bob"))
    assert(transformHiveStylePrefix("bucket/z=200/y=whatever/dude", suppress) == "bucket/z=*/y=*/dude")
  }

  test("does not transform suppressed prefix") {
    val suppress = SuppressPrefixes(Set("bucket/a=1/b=2/bob"))
    assert(transformHiveStylePrefix("bucket/a=1/b=2/bob", suppress) == "bucket/a=1/b=2/bob")
  }

  test("only first = in a token starts the wildcard") {
    assert(transformHiveStylePrefix("b/k=v=w/x") == "b/k=*/x")
    assert(transformHiveStylePrefix("b//k=v") == "b//k=*")
    assert(transformHiveStylePrefix("plain/path") == "plain/path")
  }

  test("shortenPrefix drops last segment") {
    assert(shortenPrefix("a/b/c") == "a/b")
    assert(shortenPrefix("a") == "")
  }

  test("prefixChain is longest-to-shortest") {
    assert(prefixChain("b/a/c") == List("b/a/c", "b/a", "b"))
  }

  test("resolve picks longest matching prefix") {
    val configs = Map("b" -> 1, "b/a" -> 2)
    assert(resolve("b/a/c", configs).contains("b/a" -> 2))
    assert(resolve("b/x/c", configs).contains("b" -> 1))
    assert(resolve("z/x", configs).isEmpty)
  }

  test("searchKey strips filename and wildcard-transforms the dir") {
    assert(searchKey("bucket", "data/csv/capture_date=2015-09-28/f.csv") ==
      "bucket/data/csv/capture_date=*")
    assert(searchKey("bucket", "f.csv") == "bucket")
  }

  test("filename filter is fail-open on malformed regex") {
    assert(filenameMatches("any.csv", Some("[unclosed")))
    assert(filenameMatches("x.csv", Some("\\.csv$")))
    assert(!filenameMatches("x.json", Some("\\.csv$")))
    assert(filenameMatches("x.anything", None))
  }

  private def randomPaths(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      val segs = 1 + rnd.nextInt(6)
      (1 to segs).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString +
          (if (rnd.nextBoolean()) s"=${rnd.nextInt(100)}" else "")
      }.mkString("/")
    }
  }

  test("property: chain length == segment count; any chain element resolves") {
    randomPaths(200).foreach { p =>
      val chain = prefixChain(p)
      assert(chain.length == p.split("/", -1).length)
      chain.foreach { c => assert(resolve(p, Map(c -> ())).contains(c -> ())) }
    }
  }

  test("property: transform is idempotent") {
    randomPaths(200).foreach { p =>
      val once = transformHiveStylePrefix(p)
      assert(transformHiveStylePrefix(once) == once)
    }
  }
}
