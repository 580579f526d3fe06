package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val triples = Triples.build(spark, sf0001).cache()

  test("SPARQL star query text ≡ DSL result") {
    val viaText = Sparql.run(triples,
      """SELECT ?cust ?cname ?nat WHERE {
        |  ?cust <name> ?cname .
        |  ?cust <mktsegment> "BUILDING" .
        |  ?cust <nation> ?nat .
        |}""".stripMargin)
    val viaDsl = Bgp.solve(triples, Seq(
      TP(V("cust"), C("name"), V("cname")),
      TP(V("cust"), C("mktsegment"), C("BUILDING")),
      TP(V("cust"), C("nation"), V("nat"))))
    assert(viaText.count() > 0)
    assert(viaText.exceptAll(viaDsl).count() === 0)
    assert(viaDsl.exceptAll(viaText).count() === 0)
  }

  test("OPTIONAL keeps unmatched left rows with nulls") {
    val got = Sparql.run(triples,
      """SELECT ?cust ?seg ?ord WHERE {
        |  ?cust <mktsegment> ?seg .
        |  OPTIONAL { ?ord <custkey> ?cust . ?ord <orderstatus> "P" . }
        |}""".stripMargin)
    assert(got.filter(col("ord").isNull).count() > 0)
    assert(got.filter(col("ord").isNotNull).count() > 0)
  }

  test("FILTER equality, inequality and regex") {
    val eq = Sparql.run(triples,
      """SELECT ?c ?s WHERE { ?c <mktsegment> ?s . FILTER (?s = "BUILDING") }""")
    assert(eq.select("s").distinct().as[String].collect().toSeq === Seq("BUILDING"))
    val ne = Sparql.run(triples,
      """SELECT ?c ?s WHERE { ?c <mktsegment> ?s . FILTER (?s != "BUILDING") }""")
    assert(ne.filter($"s" === "BUILDING").count() === 0 && ne.count() > 0)
    val re = Sparql.run(triples,
      """SELECT ?c ?n WHERE { ?c <name> ?n . FILTER regex(?n, "^Customer#00000001") }""")
    assert(re.count() === 10) // Customer#000000010..19
    assert(re.filter(!$"n".startsWith("Customer#00000001")).count() === 0)
  }

  test("PREFIX expansion and SELECT *") {
    val t = Seq(("s1", "http://ex/p", "o1"), ("s2", "http://ex/p", "o2"))
      .toDF("s", "p", "o")
    val got = Sparql.run(t,
      """PREFIX ex: <http://ex/>
        |SELECT * WHERE { ?s ex:p ?o . }""".stripMargin)
    assert(got.columns.toSet === Set("s", "o"))
    assert(got.count() === 2)
  }

  test("variable-disjoint empty OPTIONAL block keeps all required rows") {
    val got = Sparql.run(triples,
      """SELECT ?r ?n WHERE {
        |  ?r <name> ?n .
        |  OPTIONAL { ?x <no_such_predicate> ?y . }
        |}""".stripMargin)
    val required = Sparql.run(triples, "SELECT ?r ?n WHERE { ?r <name> ?n . }")
    assert(got.count() === required.count())
    assert(got.count() > 0)
  }

  test("multi-valued predicates return every binding through the default path") {
    import spark.implicits._
    val t = Seq(("s1", "p", "a"), ("s1", "p", "b"), ("s1", "q", "z"))
      .toDF("s", "p", "o")
    val got = Sparql.run(t, "SELECT ?x WHERE { ?s <p> ?x . ?s <q> ?y . }")
      .as[String].collect().toSet
    assert(got === Set("a", "b")) // star-collapse would lose one binding
  }

  test("out-of-fragment constructs are rejected, not mis-run") {
    intercept[IllegalArgumentException](
      Sparql.parse("SELECT ?x WHERE { }"))
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT ?x WHERE { ?x zz:p ?y . }"""))
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT WHERE { ?x <p> ?y . }"""))
    // trailing clauses outside the fragment must error, never be ignored
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT ?x WHERE { ?x <p> ?y . } GROUP BY ?x"""))
    // a lone braced group is not a union
    intercept[IllegalArgumentException](
      Sparql.parse("""SELECT ?x WHERE { { ?x <p> ?y . } }"""))
  }

  test("UNION null-pads variables unbound in a branch") {
    val got = Sparql.run(triples,
      """SELECT ?s ?n ?seg WHERE {
        |  { ?s <mktsegment> ?seg . ?s <name> ?n . }
        |  UNION
        |  { ?s <orderpriority> "1-URGENT" . ?s <custkey> ?n . }
        |}""".stripMargin)
    assert(got.columns.toSeq === Seq("s", "n", "seg"))
    val cust = got.filter($"seg".isNotNull)
    val ord = got.filter($"seg".isNull)
    assert(cust.count() > 0 && ord.count() > 0)
    assert(ord.filter(!$"s".startsWith("o:")).count() === 0)
    assert(cust.filter(!$"s".startsWith("c:")).count() === 0)
  }

  test("DISTINCT collapses duplicate solutions across UNION branches") {
    val bag = Sparql.run(triples,
      """SELECT ?s WHERE {
        |  { ?s <mktsegment> "BUILDING" . } UNION { ?s <mktsegment> "BUILDING" . }
        |}""".stripMargin)
    val set = Sparql.run(triples,
      """SELECT DISTINCT ?s WHERE {
        |  { ?s <mktsegment> "BUILDING" . } UNION { ?s <mktsegment> "BUILDING" . }
        |}""".stripMargin)
    assert(bag.count() === 2 * set.count())
    assert(set.count() === set.distinct().count())
  }

  test("ORDER BY + LIMIT + OFFSET page deterministically") {
    def page(offset: Int, limit: Int) = Sparql.run(triples,
      s"""SELECT ?c ?n WHERE { ?c <name> ?n . FILTER regex(?c, "^c:") }
         |ORDER BY ?c ?n LIMIT $limit OFFSET $offset""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    val all = Sparql.run(triples,
      """SELECT ?c ?n WHERE { ?c <name> ?n . FILTER regex(?c, "^c:") }
        |ORDER BY ?c ?n""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(page(0, 10) === all.take(10))
    assert(page(10, 5) === all.slice(10, 15))
    // DESC reverses the single-valued, duplicate-free key ordering
    val desc = Sparql.run(triples,
      """SELECT ?c WHERE { ?c <name> ?n . FILTER regex(?c, "^c:") }
        |ORDER BY DESC(?c) LIMIT 3""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(desc === all.distinct.reverse.take(3))
  }

  test("numeric FILTER coerces; lexicographic would differ") {
    val numeric = Sparql.run(triples,
      """SELECT ?c ?nk WHERE {
        |  ?c <nationkey> ?nk . FILTER (?nk >= 10) FILTER (?nk < 20)
        |}""".stripMargin)
    val nks = numeric.select("nk").distinct().as[String].collect().map(_.toInt)
    assert(nks.nonEmpty && nks.forall(v => v >= 10 && v < 20))
    // "2" passes the lexicographic test ("2" >= "10") but not the numeric one
    assert(numeric.filter($"nk" === "2").count() === 0)
    // a non-numeric binding is a type error → row eliminated, not a crash
    val mixed = Sparql.run(triples,
      "SELECT ?c ?s WHERE { ?c <mktsegment> ?s . FILTER (?s > 5) }")
    assert(mixed.count() === 0)
    // a variable named like a SQL keyword/literal must stay a column
    // reference inside the numeric cast, not become the literal `true`
    val kw = Sparql.run(triples,
      "SELECT ?c ?true WHERE { ?c <nationkey> ?true . FILTER (?true >= 20) }")
    assert(kw.count() > 0)
    assert(kw.select("true").distinct().as[String].collect().map(_.toInt).forall(_ >= 20))
  }

  test("ASK returns a 1-row boolean for existence, over strings and ids") {
    val yes = "ASK WHERE { ?c <mktsegment> \"BUILDING\" . }"
    val no = "ASK WHERE { ?c <mktsegment> \"NO-SUCH-SEGMENT\" . }"
    def one(df: org.apache.spark.sql.DataFrame): Boolean = {
      assert(df.columns.toSeq === Seq("ask") && df.count() === 1)
      df.as[Boolean].head()
    }
    assert(one(Sparql.run(triples, yes)))
    assert(!one(Sparql.run(triples, no)))
    val dict = Dictionary.build(spark, triples)
    val enc = Dictionary.encode(triples, dict)
    assert(one(Sparql.runEncoded(enc, dict, yes)))
    assert(!one(Sparql.runEncoded(enc, dict, no)))
    // ASK takes no projection or solution modifiers
    intercept[IllegalArgumentException](
      Sparql.parse("ASK ?x WHERE { ?x <p> ?y . }"))
    intercept[IllegalArgumentException](
      Sparql.parse("ASK WHERE { ?x <p> ?y . } LIMIT 5"))
  }

  test("VALUES joins inline bindings: shared, multi-var, and disjoint forms") {
    val shared = Sparql.run(triples,
      """SELECT ?c ?s WHERE {
        |  ?c <mktsegment> ?s .
        |  VALUES ?s { "BUILDING" "MACHINERY" }
        |}""".stripMargin)
    assert(shared.select("s").distinct().as[String].collect().toSet ===
      Set("BUILDING", "MACHINERY"))
    // multi-var rows restrict to exact combinations: pick one that exists
    // in the data plus one that cannot
    val all = Sparql.run(triples,
      "SELECT ?c ?s ?nk WHERE { ?c <mktsegment> ?s . ?c <nationkey> ?nk . }")
    val (seg0, nk0) = {
      val r = all.select("s", "nk").head()
      (r.getString(0), r.getString(1))
    }
    val multi = Sparql.run(triples,
      s"""SELECT ?c ?s ?nk WHERE {
         |  ?c <mktsegment> ?s . ?c <nationkey> ?nk .
         |  VALUES (?s ?nk) { ("$seg0" "$nk0") ("$seg0" "no-such-key") }
         |}""".stripMargin)
    assert(multi.select("s", "nk").distinct()
      .as[(String, String)].collect().toSet === Set(seg0 -> nk0))
    assert(multi.count() ===
      all.filter($"s" === seg0 && $"nk" === nk0).count())
    // a VALUES var not bound in the pattern cross-products (SPARQL join)
    val disjoint = Sparql.run(triples,
      """SELECT ?c ?tag WHERE {
        |  ?c <mktsegment> "BUILDING" .
        |  VALUES ?tag { "t1" "t2" }
        |}""".stripMargin)
    val base = Sparql.run(triples,
      "SELECT ?c WHERE { ?c <mktsegment> \"BUILDING\" . }")
    assert(disjoint.count() === 2 * base.count())
    intercept[IllegalArgumentException](
      Sparql.parse("SELECT ?c WHERE { ?c <p> ?s . VALUES ?s { ?notconst } }"))
  }

  test("MINUS removes compatible solutions; disjoint MINUS removes nothing") {
    val withOrders = Sparql.run(triples,
      """SELECT ?c WHERE {
        |  ?c <mktsegment> "BUILDING" .
        |  ?o <custkey> ?c . ?o <orderpriority> "1-URGENT" .
        |}""".stripMargin).distinct()
    val all = Sparql.run(triples,
      "SELECT ?c WHERE { ?c <mktsegment> \"BUILDING\" . }")
    val minus = Sparql.run(triples,
      """SELECT ?c WHERE {
        |  ?c <mktsegment> "BUILDING" .
        |  MINUS { ?o <custkey> ?c . ?o <orderpriority> "1-URGENT" . }
        |}""".stripMargin)
    assert(minus.count() === all.count() - withOrders.count())
    assert(minus.intersect(withOrders).count() === 0)
    // a MINUS block sharing no variable is incompatible with everything —
    // SPARQL keeps every solution
    val disjoint = Sparql.run(triples,
      """SELECT ?c WHERE {
        |  ?c <mktsegment> "BUILDING" .
        |  MINUS { ?x <orderpriority> "1-URGENT" . }
        |}""".stripMargin)
    assert(disjoint.count() === all.count())
  }

  test("CONSTRUCT instantiates the template per solution into a deduped graph") {
    val t = Seq(("o1", "custkey", "c1"), ("o2", "custkey", "c1"),
      ("o1", "flag", "x"), ("o2", "flag", "x"))
      .toDF("s", "p", "o")
    val g = Sparql.run(t,
      """CONSTRUCT { ?c <ordered> ?o . ?o <cls> "f" . }
        |WHERE { ?o <custkey> ?c . ?o <flag> "x" . }""".stripMargin)
    assert(g.columns.toSeq === Seq("s", "p", "o"))
    val got = g.as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("c1", "ordered", "o1"), ("c1", "ordered", "o2"),
      ("o1", "cls", "f"), ("o2", "cls", "f")))
    // the constructed graph is itself queryable — the composition that
    // makes CONSTRUCT a graph-transformation operator
    val back = Sparql.run(g, "SELECT ?c WHERE { ?c <ordered> ?o . }")
    assert(back.distinct().as[String].collect().toSeq === Seq("c1"))
    // template variables must be bound in WHERE
    intercept[IllegalArgumentException](
      Sparql.run(t, "CONSTRUCT { ?z <p> ?c . } WHERE { ?o <custkey> ?c . }")
        .count())
  }

  test("SPARQL over the encoded id-store ≡ string-space execution") {
    val dict = Dictionary.build(spark, triples)
    val enc = Dictionary.encode(triples, dict)
    // the full fragment in one query: UNION + OPTIONAL + regex and numeric
    // FILTERs + DISTINCT + ORDER BY
    val text =
      """SELECT DISTINCT ?s ?n ?extra WHERE {
        |  { ?s <name> ?n . FILTER regex(?n, "^Customer#0000000[12]\\d$")
        |    OPTIONAL { ?s <nation> ?extra . } }
        |  UNION
        |  { ?s <nationkey> ?n . FILTER (?n < 3) }
        |}
        |ORDER BY ?s ?n""".stripMargin
    val viaString = Sparql.run(triples, text)
    val viaIds = Sparql.runEncoded(enc, dict, text)
    assert(viaString.count() > 0)
    assert(viaString.exceptAll(viaIds).count() === 0)
    assert(viaIds.exceptAll(viaString).count() === 0)
  }

  test("MINUS-only constants resolve on the encoded path (encoded ≡ string)") {
    val dict = Dictionary.build(spark, triples)
    val enc = Dictionary.encode(triples, dict)
    // custkey / orderpriority / 1-URGENT appear ONLY inside the MINUS block:
    // if the encoded path forgot to resolve MINUS constants, the block would
    // be gated to empty and the result would silently be the full superset
    val text =
      """SELECT ?cust WHERE {
        |  ?cust <mktsegment> "BUILDING" .
        |  MINUS { ?ord <custkey> ?cust . ?ord <orderpriority> "1-URGENT" . }
        |}""".stripMargin
    val viaString = Sparql.run(triples, text)
    val viaIds = Sparql.runEncoded(enc, dict, text)
    val all = Sparql.run(triples,
      "SELECT ?cust WHERE { ?cust <mktsegment> \"BUILDING\" . }")
    assert(viaString.count() > 0)
    assert(viaString.count() < all.count()) // MINUS removed something
    assert(viaIds.count() === viaString.count())
    assert(viaString.exceptAll(viaIds).count() === 0)
    assert(viaIds.exceptAll(viaString).count() === 0)
  }

  test("filters and optionals apply per union branch") {
    val got = Sparql.run(triples,
      """SELECT ?s ?n ?nat WHERE {
        |  { ?s <name> ?n . FILTER regex(?n, "^Customer#00000001\\d$")
        |    OPTIONAL { ?s <nation> ?nat . } }
        |  UNION
        |  { ?s <nationkey> ?n . FILTER (?n = "3") }
        |}""".stripMargin)
    val branch1 = got.filter($"n".startsWith("Customer#"))
    val branch2 = got.filter($"n" === "3")
    assert(branch1.count() === 10 && branch2.count() > 0)
    assert(branch1.filter($"nat".isNull).count() === 0) // OPTIONAL matched
    assert(branch2.filter($"nat".isNotNull).count() === 0) // padded
    assert(got.count() === branch1.count() + branch2.count())
  }
}
