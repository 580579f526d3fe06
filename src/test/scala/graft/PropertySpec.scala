package graft

import graft.functions.MinHashAggregator
import graft.operators.AsOfJoin
import graft.rdf.{Bgp, C, Dictionary, TP, V}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck algebraic laws (SURVEY.md §5.3). Spark-backed properties use
  * a reduced case count — each case is a full local job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  private val term: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('☃', 'é', '_', ' ')))
      .map(_.mkString.take(12))

  test("property: dictionary encode ∘ decode = identity on arbitrary triples") {
    val genTriples = Gen.nonEmptyListOf(Gen.zip(term, term, term)).map(_.take(30))
    check(Prop.forAll(genTriples) { rows =>
      val df = rows.toDF("s", "p", "o")
      val dict = Dictionary.build(spark, df)
      val back = Dictionary.decode(Dictionary.encode(df, dict), dict)
      back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty
    }, cases = 8)
  }

  test("property: star-collapsed solve ≡ join solve on single-valued stars") {
    // subjects with single-valued predicates p0..p2 over a tiny value space
    val genRows = for {
      n <- Gen.choose(3, 12)
      vals <- Gen.listOfN(n * 3, Gen.oneOf("x", "y", "z", "w"))
    } yield (0 until n).flatMap(i =>
      (0 until 3).map(j => (s"s$i", s"p$j", vals(i * 3 + j))))
    check(Prop.forAll(genRows) { rows =>
      val t = rows.toDF("s", "p", "o")
      val pats = Seq(
        TP(V("a"), C("p0"), V("v0")),
        TP(V("a"), C("p1"), C("x")),
        TP(V("a"), C("p2"), V("v2")))
      val viaJoin = Bgp.solve(t, pats)
      val viaStar = Bgp.solveStarCollapsed(t, pats)
        .select(viaJoin.columns.map(col): _*)
      viaJoin.exceptAll(viaStar).isEmpty && viaStar.exceptAll(viaJoin).isEmpty
    }, cases = 8)
  }

  test("property: multi-valued stars — join solve is the exact cross product") {
    // a corpus where (s,p) is deliberately MULTI-valued: each subject gets
    // a random bag of objects per predicate (the RDF norm the collapsed
    // path's precondition excludes)
    val genRows = for {
      n <- Gen.choose(2, 5)
      bags <- Gen.listOfN(n * 2, Gen.listOf(Gen.oneOf("x", "y", "z", "w")).map(_.distinct))
    } yield (0 until n).flatMap(i => Seq(0, 1).flatMap(j =>
      bags(i * 2 + j).map(o => (s"s$i", s"p$j", o))))
    val pats = Seq(TP(V("a"), C("p0"), V("v0")), TP(V("a"), C("p1"), V("v1")))
    check(Prop.forAll(genRows) { rows =>
      rows.isEmpty || {
        val t = rows.toDF("s", "p", "o")
        // SPARQL semantics: every combination of the subject's p0-bindings
        // and p1-bindings — the per-subject cross product
        val expected = rows.groupBy(_._1).toSeq.flatMap { case (s, ts) =>
          for {
            x <- ts.filter(_._2 == "p0").map(_._3)
            y <- ts.filter(_._2 == "p1").map(_._3)
          } yield (s, x, y)
        }.toSet
        val got = Bgp.solve(t, pats)
          .select("a", "v0", "v1").as[(String, String, String)]
          .collect().toSet
        val collapsed = Bgp.solveStarCollapsed(t, pats)
        // the collapsed path's one-row-per-subject aggregate CANNOT widen
        // to a cross product — exactly the documented precondition, and why
        // the join solver is the default everywhere the data isn't known
        // single-valued (Sparql.run, Bgp scaladoc)
        got == expected && collapsed.count() == expected.map(_._1).size.toLong
      }
    }, cases = 8)
  }

  test("property: as-of join ≡ naive latest-at-or-before model") {
    val genData = for {
      left <- Gen.listOfN(15, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
      right <- Gen.listOfN(15, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    } yield (left, right.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    check(Prop.forAll(genData) { case (left, right) =>
      val l = left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("uid", "us", "lid")
      val r = right.toDF("uid", "us", "pick")
      val got = AsOfJoin.latestAtOrBefore(l, r, "uid", "us", "pick", "res")
        .select($"lid", $"res").as[(Long, Option[Long])].collect().toMap
      left.zipWithIndex.forall { case ((k, t), i) =>
        val cands = right.filter(rr => rr._1 == k && rr._2 <= t)
        val want =
          if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._2, c._3))._3)
        got(i.toLong) == want
      }
    }, cases = 10)
  }

  test("property: minhash sketch estimate within ε of true jaccard") {
    val agg = new MinHashAggregator(256)
    val genSets = for {
      shared <- Gen.choose(20, 80)
      extraA <- Gen.choose(0, 40)
      extraB <- Gen.choose(0, 40)
    } yield (shared, extraA, extraB)
    check(Prop.forAll(genSets) { case (shared, ea, eb) =>
      val s = (0 until shared).map(i => s"sh$i")
      val a = s ++ (0 until ea).map(i => s"a$i")
      val b = s ++ (0 until eb).map(i => s"b$i")
      val sa = a.foldLeft(agg.zero)(agg.reduce)
      val sb = b.foldLeft(agg.zero)(agg.reduce)
      val est = MinHashAggregator.estimateJaccard(sa, sb)
      val truth = shared.toDouble / (shared + ea + eb)
      math.abs(est - truth) < 0.15
    }, cases = 30)
  }

  test("property: property-path render → parse round-trips the path AST") {
    import graft.rdf.{Sparql, Path, PEdge, PSeq, PAlt, PPlus, PStar, POpt, PInv, TP, V => RV, C => RC}
    val genIri = Gen.oneOf("p", "q", "r").map(n => s"http://ex/$n")
    def genPath(depth: Int): Gen[Path] =
      if (depth <= 0) genIri.map(PEdge(_))
      else Gen.frequency(
        3 -> genIri.map(PEdge(_)),
        1 -> Gen.zip(genPath(depth - 1), genPath(depth - 1))
          .map { case (a, b) => PSeq(a, b) },
        1 -> Gen.zip(genPath(depth - 1), genPath(depth - 1))
          .map { case (a, b) => PAlt(a, b) },
        1 -> genPath(depth - 1).map(PPlus(_)),
        1 -> genPath(depth - 1).map(PStar(_)),
        1 -> genPath(depth - 1).map(POpt(_)),
        1 -> genPath(depth - 1).map(PInv(_)))
    // fully parenthesized rendering — parsing must reproduce the exact AST
    def render(p: Path): String = p match {
      case PEdge(v) => s"<$v>"
      case PSeq(l, r) => s"(${render(l)}/${render(r)})"
      case PAlt(l, r) => s"(${render(l)}|${render(r)})"
      case PPlus(q) => s"(${render(q)})+"
      case PStar(q) => s"(${render(q)})*"
      case POpt(q) => s"(${render(q)})?"
      case PInv(q) => s"^(${render(q)})"
    }
    check(Prop.forAll(genPath(3)) { path =>
      val q = Sparql.parse(s"SELECT ?a ?b WHERE { ?a ${render(path)} ?b . }")
      path match {
        // a bare predicate collapses to a plain triple pattern
        case PEdge(v) => q.where == Seq(TP(RV("a"), RC(v), RV("b")))
        case _ => q.branches.head.paths == Seq((RV("a"), path, RV("b")))
      }
    }, cases = 60)
  }

  test("property: SPARQL render → parse round-trips the BGP structure") {
    import graft.rdf.{Sparql, Term, TP, V => RV, C => RC}
    val genTerm: Gen[Term] = Gen.oneOf(
      Gen.identifier.map(s => RV("v" + s.take(6))),
      Gen.identifier.map(s => RC("http://ex/" + s.take(8))),
      Gen.alphaNumStr.map(s => RC(s.take(8))))
    val genTp = Gen.zip(
      Gen.identifier.map(s => RV("s" + s.take(4))), genTerm, genTerm)
      .map { case (s, p, o) => TP(s, p, o) }
    def render(t: Term): String = t match {
      case RV(n) => s"?$n"
      case RC(v: String) if v.startsWith("http://") => s"<$v>"
      case RC(v) => "\"" + v + "\""
    }
    check(Prop.forAll(Gen.nonEmptyListOf(genTp).map(_.take(5))) { tps =>
      val vars = tps.flatMap(tp => Seq(tp.s, tp.p, tp.o))
        .collect { case RV(n) => n }.distinct
      val text = s"SELECT ${vars.map("?" + _).mkString(" ")} WHERE {\n" +
        tps.map(tp => s"  ${render(tp.s)} ${render(tp.p)} ${render(tp.o)} .")
          .mkString("\n") + "\n}"
      val q = Sparql.parse(text)
      q.where == tps && q.projection == vars &&
        q.optionals.isEmpty && q.filters.isEmpty
    }, cases = 40)
  }

  test("property: SPARQL round-trip with UNION / DISTINCT / ORDER / LIMIT") {
    import graft.rdf.{Sparql, Term, TP, V => RV, C => RC}
    val genTerm: Gen[Term] = Gen.oneOf(
      Gen.identifier.map(s => RV("v" + s.take(6))),
      Gen.identifier.map(s => RC("http://ex/" + s.take(8))),
      Gen.alphaNumStr.map(s => RC(s.take(8))))
    val genTp = Gen.zip(
      Gen.identifier.map(s => RV("s" + s.take(4))), genTerm, genTerm)
      .map { case (s, p, o) => TP(s, p, o) }
    def render(t: Term): String = t match {
      case RV(n) => s"?$n"
      case RC(v: String) if v.startsWith("http://") => s"<$v>"
      case RC(v) => "\"" + v + "\""
    }
    def renderBlock(tps: Seq[TP]): String =
      tps.map(tp => s"  ${render(tp.s)} ${render(tp.p)} ${render(tp.o)} .")
        .mkString("\n")
    val gen = for {
      b1 <- Gen.nonEmptyListOf(genTp).map(_.take(4))
      b2 <- Gen.nonEmptyListOf(genTp).map(_.take(4))
      distinct <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.choose(1, 99))
      offset <- Gen.option(Gen.choose(1, 99))
    } yield (b1, b2, distinct, limit, offset)
    check(Prop.forAll(gen) { case (b1, b2, distinct, limit, offset) =>
      val vars = (b1 ++ b2).flatMap(tp => Seq(tp.s, tp.p, tp.o))
        .collect { case RV(n) => n }.distinct
      val text =
        s"SELECT ${if (distinct) "DISTINCT " else ""}${vars.map("?" + _).mkString(" ")} WHERE {\n" +
          s"  {\n${renderBlock(b1)}\n  } UNION {\n${renderBlock(b2)}\n  }\n}\n" +
          s"ORDER BY ?${vars.head} DESC(?${vars.last})\n" +
          limit.map(n => s"LIMIT $n\n").getOrElse("") +
          offset.map(n => s"OFFSET $n\n").getOrElse("")
      val q = Sparql.parse(text)
      q.branches.map(_.where) == Seq(b1, b2) &&
        q.distinct == distinct && q.limit == limit && q.offset == offset &&
        q.orderKeys == Seq(Sparql.OrderKey(vars.head, asc = true),
          Sparql.OrderKey(vars.last, asc = false))
    }, cases = 40)
  }

  test("property: NPS member sets and nested unions round-trip through parse") {
    import graft.rdf.{Sparql, TP, V => RV, C => RC, PNps}
    val genIri = Gen.identifier.map(s => "http://ex/" + s.take(8))
    val genMember = Gen.zip(Gen.oneOf(true, false), genIri)
    val gen = for {
      ms <- Gen.nonEmptyListOf(genMember).map(_.take(5))
      inner <- Gen.nonEmptyListOf(Gen.zip(genIri, genIri)).map(_.take(3))
    } yield (ms, inner)
    check(Prop.forAll(gen) { case (ms, inner) =>
      val nps = ms.map { case (inv, iri) =>
        (if (inv) "^" else "") + s"<$iri>" }.mkString("|")
      val branches = inner.map { case (p1, p2) =>
        s"{ ?s <$p1> ?o . } UNION { ?s <$p2> ?o . }" }.mkString(" ")
      val q = Sparql.parse(
        s"SELECT ?s ?o WHERE { ?s !($nps) ?o . $branches }")
      val b = q.branches.head
      val pathOk = b.paths match {
        case Seq((RV("s"), PNps(fwd, invs), RV("o"))) =>
          fwd == ms.collect { case (false, i) => i } &&
            invs == ms.collect { case (true, i) => i }
        case _ => false
      }
      pathOk && b.unions.size == inner.size &&
        b.unions.zip(inner).forall { case (us, (p1, p2)) =>
          us.map(_.where) == Seq(Seq(TP(RV("s"), RC(p1), RV("o"))),
            Seq(TP(RV("s"), RC(p2), RV("o"))))
        }
    }, cases = 40)
  }

  test("property: roundSafe stays within half-step of the input") {
    check(Prop.forAll(Gen.choose(-1e6, 1e6)) { x =>
      val r = Seq(x).toDF("x").select(Det.roundSafe(col("x"), 4)).as[Double].head()
      math.abs(r - x) <= 0.500001e-4
    }, cases = 15)
  }

  test("property: bucketized interval join ≡ naive overlap join, pairs unique") {
    // random same-key interval sets with lengths up to the bucket width;
    // the equi-join-bucketized pairs must equal the naive quadratic
    // overlap join exactly, with every pair emitted exactly once
    val width = 10L
    val genIntervals = for {
      n <- Gen.choose(2, 14)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 2L)
        st <- Gen.choose(0L, 60L)
        len <- Gen.choose(0L, width)
      } yield (k, st, st + len))
    } yield rows.zipWithIndex.map { case ((k, st, en), i) => (k, i.toLong, st, en) }
    check(Prop.forAll(genIntervals) { rows =>
      val iv = rows.toDF("k", "id", "st", "en")
      val got = operators.Joins.intervalOverlapPairs(iv, width)
        .as[(Long, Long, Long)].collect().toSeq
      val naive = for {
        (k1, i1, s1, e1) <- rows
        (k2, i2, s2, e2) <- rows
        if k1 == k2 && i1 < i2 && s1 <= e2 && s2 <= e1
      } yield (k1, i1, i2)
      got.sorted == naive.sorted && got.size == got.distinct.size
    }, cases = 12)
  }
}
