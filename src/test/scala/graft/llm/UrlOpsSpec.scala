package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("canonicalization folds every spelling variant of a page to one key") {
    val c = UrlOps.canonicalized(UrlOps.withUrls(docs(100)))
      .select($"doc_id", $"canonical").as[(Long, String)].collect().toMap
    // each consecutive pair (2k, 2k+1) differs in host case, default
    // port, trailing slash, gclid value and fragment — same canonical
    (0L until 50L).foreach { k =>
      assert(c(2 * k) === c(2 * k + 1), s"pair $k: ${c(2 * k)} vs ${c(2 * k + 1)}")
    }
    // distinct pages stay distinct: page index differs across pairs
    assert(c.values.toSet.size === 50)
  }

  test("parsed host is lowercased and port-free; domain is the last two labels") {
    val p = UrlOps.parsed(UrlOps.withUrls(docs(12)))
      .select($"doc_id", $"host", $"domain", $"path_depth")
      .as[(Long, String, String, Long)].collect()
    p.foreach { case (id, host, domain, depth) =>
      assert(host === s"h${(id / 2) % 7}.example.org", s"doc $id")
      assert(!host.contains(":"), s"port must be stripped: $host")
      assert(domain === "example.org")
      assert(depth === 3L, s"doc $id: /docs/<i>/page-<k> has depth 3, got $depth")
    }
  }

  test("tracking parameters vanish, the surviving parameter keeps its value") {
    val c = UrlOps.canonicalized(UrlOps.withUrls(docs(6)))
      .select($"doc_id", $"canonical").as[(Long, String)].collect()
    c.foreach { case (id, canon) =>
      assert(!canon.contains("utm_") && !canon.contains("gclid"), canon)
      assert(canon.contains(s"?ref=r${(id / 2) % 3}"), canon)
      assert(!canon.contains("#"), s"fragment must be dropped: $canon")
    }
  }

  test("non-default ports survive canonicalization; default ports fold") {
    val u = Seq(
      (1L, "https://a.example.org:8080/x"), (2L, "https://a.example.org/x"),
      (3L, "https://a.example.org:443/x"), (4L, "http://a.example.org:80/x"),
      (5L, "http://a.example.org:8080/x")).toDF("doc_id", "url")
    val canon = UrlOps.canonicalized(u)
      .orderBy("doc_id").select($"canonical").as[String].collect().toSeq
    assert(canon === Seq(
      "https://a.example.org:8080/x", // distinct origin, port kept
      "https://a.example.org/x",
      "https://a.example.org/x",      // :443 is the https default — folds
      "http://a.example.org/x",       // :80 is the http default — folds
      "http://a.example.org:8080/x")) // non-default under http too
  }

  test("the synthetic gate URLs exercise a preserved :8080 port") {
    val c = UrlOps.canonicalized(UrlOps.withUrls(docs(100)))
      .select($"canonical").as[String].collect()
    assert(c.exists(_.contains(":8080")), "gate must pin port preservation")
    assert(!c.exists(_.contains(":443")), "default port must fold away")
  }

  test("scheme is preserved: http and https spellings stay distinct pages") {
    val u = Seq((1L, "http://a.example.org/x"), (2L, "HTTPS://a.example.org/x"))
      .toDF("doc_id", "url")
    val canon = UrlOps.canonicalized(u)
      .orderBy("doc_id").select($"canonical").as[String].collect().toSeq
    assert(canon === Seq("http://a.example.org/x", "https://a.example.org/x"))
  }

  test("multi-slash trailing paths strip to one canonical spelling") {
    val u = Seq((1L, "https://a.example.org/x//"), (2L, "https://a.example.org/x/"),
      (3L, "https://a.example.org/x")).toDF("doc_id", "url")
    assert(UrlOps.canonicalized(u)
      .select($"canonical").distinct().count() === 1)
  }

  test("a bare URL with no path or query canonicalizes to its root form") {
    val u = Seq((1L, "https://Example.org"), (2L, "https://example.org/"))
      .toDF("doc_id", "url")
    val canon = UrlOps.canonicalized(u)
      .orderBy("doc_id").select($"canonical").as[String].collect().toSeq
    assert(canon === Seq("https://example.org/", "https://example.org/"))
  }

  test("an all-tracking query drops its '?' entirely") {
    val u = Seq((1L, "https://A.example.org:443/x/?utm_source=a&gclid=b#f"))
      .toDF("doc_id", "url")
    val canon = UrlOps.canonicalized(u)
      .select($"canonical").as[String].head()
    assert(canon === "https://a.example.org/x")
  }

  test("canonicalization is idempotent: a canonical URL maps to itself") {
    val canon = UrlOps.canonicalized(UrlOps.withUrls(docs(40)))
      .select($"doc_id", $"canonical")
    val again = UrlOps.canonicalized(canon.withColumnRenamed("canonical", "url"))
      .select($"doc_id", $"canonical".as("canonical2"))
    val joined = canon.join(again, "doc_id")
      .filter($"canonical" =!= $"canonical2")
    assert(joined.isEmpty,
      s"non-fixed points: ${joined.collect().take(3).mkString(", ")}")
  }

  test("dedup keeps the minimum doc_id per canonical group") {
    val d = UrlOps.dedupByCanonical(
      UrlOps.canonicalized(UrlOps.withUrls(docs(10))))
      .select($"n_dups", $"keeper_id").as[(Long, Long)].collect()
    assert(d.length === 5)
    assert(d.forall(_._1 === 2L))
    assert(d.map(_._2).sorted.toSeq === Seq(0L, 2L, 4L, 6L, 8L))
  }
}
