package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtVpSpec extends SparkSpec {
  import spark.implicits._

  private val chain = Seq(
    TP(V("ord"), C("custkey"), V("cust")),
    TP(V("ord"), C("orderpriority"), C("1-URGENT")),
    TP(V("cust"), C("mktsegment"), V("seg")),
    TP(V("cust"), C("name"), V("cname")))

  test("ExtVP solve ≡ the plain join solver on the canonical chain") {
    val triples = Triples.build(spark, sf0001)
    val store = ExtVp.build(triples, threshold = 0.9)
    val viaExt = ExtVp.solve(store, chain)
    val viaBgp = Bgp.solve(triples, chain)
    assert(viaExt.count() > 0)
    assert(viaExt.exceptAll(viaBgp).count() === 0)
    assert(viaBgp.exceptAll(viaExt).count() === 0)
    store.vp.values.foreach(_.unpersist())
  }

  test("reductions are genuine subsets with recorded selectivities") {
    val triples = Triples.build(spark, sf0001)
    val store = ExtVp.build(triples, threshold = 0.9)
    // custkey's OBJECTS are customers; only SOME customers own orders, so
    // the mktsegment-by-custkey SO reduction must be strictly smaller
    // than full VP[mktsegment] unless every customer ordered
    assert(store.sel.nonEmpty, "no reduction survived the threshold")
    store.red.foreach { case ((p, _, _) , df) =>
      val full = store.vp(p).count()
      val cnt = df.count()
      assert(cnt <= full && cnt > 0)
    }
    store.sel.foreach { case (k, s) =>
      assert(s > 0.0 && s <= 0.9, s"$k selectivity $s outside (0, 0.9]")
    }
    // the definitional check: SS[custkey|orderpriority] = orders with BOTH
    val ss = store.red.get(("custkey", "orderpriority", "SS"))
    ss.foreach { df =>
      val manual = triples.filter($"p" === "custkey").select("s", "o")
        .join(triples.filter($"p" === "orderpriority").select("s").distinct(),
          Seq("s"), "left_semi")
      assert(df.exceptAll(manual).count() === 0)
      assert(manual.exceptAll(df).count() === 0)
    }
    store.vp.values.foreach(_.unpersist())
  }

  test("build enumerates CO-OCCURRING pairs, not #preds² (wide vocabulary)") {
    // two disjoint predicate clusters: subjects and objects never cross
    // clusters, so cross-cluster pairs must not even be ENUMERATED — the
    // open-vocabulary scale property (work ∝ real connectivity, never
    // #preds²·3)
    val nPred = 20
    val rows = (0 until nPred).flatMap { i =>
      val cluster = if (i < nPred / 2) "a" else "b"
      (0 until 3).map(j => (s"$cluster:s$j", s"p$i", s"$cluster:o$j"))
    }
    val triples = rows.toDF("s", "p", "o")
    val stats = ExtVp.pairStats(triples)
    assert(stats.nonEmpty)
    stats.keys.foreach { case (p, q, _) =>
      val cp = p.stripPrefix("p").toInt < nPred / 2
      val cq = q.stripPrefix("p").toInt < nPred / 2
      assert(cp === cq, s"cross-cluster pair enumerated: ($p, $q)")
    }
    // objects never appear as subjects here, so only SS pairs exist:
    // 2 clusters × 10×9 ordered pairs — FAR below the 20·19·3 sweep
    assert(stats.size === 2 * 10 * 9)
    assert(stats.size < nPred * (nPred - 1) * 3)
    // exactness: the stat is the semi-join reduction count it stands for
    assert(stats(("p0", "p1", "SS")) === ((3L, 3L)))
    // the fan-out cap bounds reductions per (predicate, kind)
    val capped = ExtVp.build(triples, threshold = 1.0, maxPartners = 3)
    val perPK = capped.sel.keys.groupBy { case (p, _, k) => (p, k) }
      .view.mapValues(_.size)
    assert(perPK.values.forall(_ <= 3), perPK.toMap.toString)
    assert(capped.sel.nonEmpty)
    // capped solve still answers correctly (uncovered patterns fall back
    // to their VP table)
    val pats = Seq(TP(V("x"), C("p0"), V("o0")), TP(V("x"), C("p5"), V("o5")))
    val viaExt = ExtVp.solve(capped, pats)
    val viaBgp = Bgp.solve(triples, pats)
    assert(viaExt.exceptAll(viaBgp).count() === 0 &&
      viaBgp.exceptAll(viaExt).count() === 0)
  }

  test("variable predicates reject loudly; unknown predicates match nothing") {
    val triples = Seq(("a", "p", "b")).toDF("s", "p", "o")
    val store = ExtVp.build(triples)
    intercept[IllegalArgumentException](
      ExtVp.solve(store, Seq(TP(V("s"), V("p"), V("o")))))
    assert(ExtVp.solve(store, Seq(TP(V("s"), C("nope"), V("o"))))
      .count() === 0)
    store.vp.values.foreach(_.unpersist())
  }

  test("full SPARQL through the ExtVP store matches the plain engine") {
    val triples = Triples.build(spark, sf0001)
    val st = ExtVp.forDataset(spark, sf0001)
    val text =
      """SELECT ?ord ?cust ?cname WHERE {
        |  ?ord <custkey> ?cust .
        |  ?ord <orderpriority> "1-URGENT" .
        |  OPTIONAL { ?cust <mktsegment> ?seg . FILTER (?seg = "BUILDING") }
        |  ?cust <name> ?cname .
        |  FILTER regex(?cname, "[05]$")
        |}
        |ORDER BY ?ord ?cust""".stripMargin
    val viaExt = Sparql.run(triples, text, extVp = Some(st))
    val plain = Sparql.run(triples, text)
    assert(viaExt.count() > 0)
    assert(viaExt.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(viaExt).count() === 0)
    // a variable-predicate query falls back (no rejection, same answer)
    val varP = "SELECT ?p WHERE { <c:1> ?p ?o . } ORDER BY ?p"
    assert(Sparql.run(triples, varP, extVp = Some(st))
      .exceptAll(Sparql.run(triples, varP)).count() === 0)
  }

  test("maintain: churned store ≡ rebuilt store on contents and solves") {
    val t0 = graft.Materialize(Triples.build(spark, sf0001))
    val store = ExtVp.build(t0, threshold = 0.9)
    // churn: a new urgent order for a fresh customer (new chain rows), a
    // deleted order (its custkey/priority rows leave), a new PREDICATE
    val someOrd = t0.filter($"p" === "orderpriority" && $"o" === "1-URGENT")
      .select("s").as[String].head()
    val adds = Seq(
      ("o:new1", "custkey", "c:new1"), ("o:new1", "orderpriority", "1-URGENT"),
      ("c:new1", "mktsegment", "BUILDING"), ("c:new1", "name", "Customer#new1"),
      ("c:new1", "vip", "yes")).toDF("s", "p", "o")
    val dels = graft.Materialize(t0.filter($"s" === someOrd))
    val t1 = graft.Materialize(
      t0.join(dels, Seq("s", "p", "o"), "left_anti").unionByName(adds))
    val maintained = ExtVp.maintain(store, adds, dels)
    // VP tables: maintained ≡ recomputed slices (incl. the new predicate)
    for (p <- Seq("custkey", "orderpriority", "mktsegment", "vip")) {
      val want = t1.filter($"p" === p).select("s", "o")
      val got = maintained.vp(p)
      assert(got.exceptAll(want).count() === 0 &&
        want.exceptAll(got).count() === 0, s"VP[$p] diverged")
    }
    // every kept reduction ≡ the definitional semi-join over t1
    maintained.red.foreach { case ((p, q, kind), got) =>
      val (lk, rk) = kind match {
        case "SS" => ("s", "s"); case "SO" => ("s", "o"); case _ => ("o", "s")
      }
      val want = t1.filter($"p" === p).select("s", "o")
        .join(t1.filter($"p" === q).select(col(rk).as(lk)).distinct(),
          Seq(lk), "left_semi")
      assert(got.exceptAll(want).count() === 0 &&
        want.exceptAll(got).count() === 0, s"red[$p|$q,$kind] diverged")
    }
    // and the solve surface agrees with the plain engine over t1
    val viaExt = ExtVp.solve(maintained, chain)
    val viaBgp = Bgp.solve(t1, chain)
    assert(viaExt.count() > 0)
    assert(viaExt.exceptAll(viaBgp).count() === 0 &&
      viaBgp.exceptAll(viaExt).count() === 0)
    // untouched predicates keep their very frames (no recompute churn)
    assert(maintained.vp("nationkey") eq store.vp("nationkey"))
    Seq(t0, t1, dels).foreach(graft.Materialize.release)
  }

  test("the persisted store round-trips and answers identically") {
    val st = ExtVp.forDataset(spark, sf0001)
    val viaDisk = ExtVp.solve(st, chain)
    val viaBgp = Bgp.solve(Triples.build(spark, sf0001), chain)
    assert(viaDisk.exceptAll(viaBgp).count() === 0)
    assert(viaBgp.exceptAll(viaDisk).count() === 0)
    // the plan scans the REDUCTION parquet, not the full triples table
    val plan = viaDisk.queryExecution.executedPlan.toString()
    assert(plan.contains("graft_extvp"), plan.take(2000))
    assert(plan.contains("/red/"), "no reduction directory in the scan")
  }
}
