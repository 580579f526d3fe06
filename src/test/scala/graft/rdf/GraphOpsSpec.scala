package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RDFS entailment + graph analytics (rdf.Rdfs, rdf.GraphOps). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (String, String)*) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("kcore peels a chain node-by-node — the multi-round cascade") {
    // triangle {a,b,c} with a pendant chain c—d—e—f: the 2-core is the
    // triangle, and the chain must peel from the END inward (f, then e,
    // then d — three rounds), proving the fixpoint loop actually iterates
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("d", "e"), ("e", "f"))
    val core = GraphOps.kcore(edges, k = 2)
      .as[(String, Long)].collect().toMap
    assert(core === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kcore of a graph already at the fixpoint is the graph itself") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"))
    val core = GraphOps.kcore(edges, k = 2)
      .as[(String, Long)].collect().toMap
    assert(core === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kcore above the degeneracy peels to empty") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"))
    assert(GraphOps.kcore(edges, k = 3).isEmpty)
  }

  test("commonNeighbors counts shared middles and excludes hubs") {
    val edges = Seq(("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"),
      ("a", "h"), ("b", "h"), ("c", "h")).toDF("src", "dst")
    val out = GraphOps.commonNeighbors(edges, maxDegree = 2, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    // h (degree 3) and a/b (degree 3) are over the cap as MIDDLES: only
    // x and y qualify, so (a,b) counts 2 and nothing else pairs at all
    assert(out === Seq(("a", "b", 2L)))
    // with the cap lifted, the hub contributes its pairs and (a,b)
    // gains the h path
    val unc = GraphOps.commonNeighbors(edges, maxDegree = 10, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(unc.head === (("a", "b", 3L)))
    assert(unc.contains(("a", "c", 1L)) && unc.contains(("b", "c", 1L)))
  }
  import spark.implicits._

  test("RDFS entailment: domain/range types lift through both closures") {
    val schema = Rdfs.Schema(
      subClassOf = Seq("Cat" -> "Animal", "Animal" -> "Thing"),
      subPropertyOf = Seq("owns" -> "has"),
      domain = Seq("owns" -> "Person"),
      range = Seq("owns" -> "Cat"))
    val triples = Seq(("alice", "owns", "tom")).toDF("s", "p", "o")
    val got = Rdfs.entail(triples, schema)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("alice", "owns", "tom"),          // base
      ("alice", "has", "tom"),           // rdfs7
      ("alice", "type", "Person"),       // rdfs2
      ("tom", "type", "Cat"),            // rdfs3
      ("tom", "type", "Animal"),         // rdfs9
      ("tom", "type", "Thing")))         // rdfs9 through rdfs11
  }

  test("RDFS counting-IVM: maintain ≡ recompute under adds and deletes") {
    val schema = Rdfs.Schema(
      subClassOf = Seq("Cat" -> "Animal"),
      subPropertyOf = Seq("owns" -> "has"),
      domain = Seq("owns" -> "Person"),
      range = Seq("owns" -> "Cat"))
    // two owners of tom: (tom type Cat) has support 2 — deleting ONE
    // derivation must NOT retract it (the over-deletion trap counting
    // avoids); deleting both must
    val base = Seq(("alice", "owns", "tom"), ("bob", "owns", "tom"))
      .toDF("s", "p", "o")
    var counts = graft.Materialize(Rdfs.supportCounts(base, schema))
    assert(counts.filter($"s" === "tom" && $"p" === "type" && $"o" === "Cat")
      .select("n").as[Long].head() === 2L)
    val dels1 = Seq(("bob", "owns", "tom")).toDF("s", "p", "o")
    val adds1 = Seq(("carol", "owns", "mia")).toDF("s", "p", "o")
    counts = Rdfs.maintainCounts(counts, adds1, dels1, schema)
    val truth1 = Rdfs.supportCounts(
      base.exceptAll(dels1).unionByName(adds1), schema)
    assert(counts.exceptAll(truth1).count() === 0)
    assert(truth1.exceptAll(counts).count() === 0)
    assert(counts.filter($"s" === "tom" && $"p" === "type" && $"o" === "Cat")
      .select("n").as[Long].head() === 1L, "support 2→1 must not retract")
    // now delete alice's triple too: every tom entailment retracts
    counts = Rdfs.maintainCounts(counts,
      dels1.limit(0), Seq(("alice", "owns", "tom")).toDF("s", "p", "o"),
      schema)
    assert(counts.filter($"s" === "tom").count() === 0)
    // and the entailed VIEW equals a from-scratch entail
    val viewNow = counts.select("s", "p", "o")
    val entailNow = Rdfs.entail(adds1, schema)
    assert(viewNow.exceptAll(entailNow).count() === 0)
    assert(entailNow.exceptAll(viewNow).count() === 0)
  }

  test("RDFS schema churn maintained by a predicate-pruned rescan") {
    val oldS = Rdfs.Schema(
      subClassOf = Seq("Cat" -> "Animal"),
      subPropertyOf = Seq("owns" -> "has"),
      domain = Seq("owns" -> "Owner"),
      range = Seq("owns" -> "Cat"))
    // evolution: a new subclass edge (lifts owns' range), a new
    // subproperty with its own range
    val newS = Rdfs.Schema(
      subClassOf = Seq("Cat" -> "Animal", "Animal" -> "Being"),
      subPropertyOf = Seq("owns" -> "has", "feeds" -> "has"),
      domain = Seq("owns" -> "Owner"),
      range = Seq("owns" -> "Cat", "feeds" -> "Animal"))
    // only the predicates whose EMISSIONS move are affected — 'color'
    // never rescans, 'has' is schema-touched but emission-stable
    assert(Rdfs.changedPreds(oldS, newS) === Set("owns", "feeds"))
    val data = Seq(("alice", "owns", "tom"), ("bob", "feeds", "rex"),
      ("x", "color", "red")).toDF("s", "p", "o")
    val base = graft.Materialize(Rdfs.supportCounts(data, oldS))
    val fwd = Rdfs.maintainSchema(base, data, oldS, newS)
    val fwdTruth = Rdfs.supportCounts(data, newS)
    assert(fwd.exceptAll(fwdTruth).count() === 0)
    assert(fwdTruth.exceptAll(fwd).count() === 0)
    // retraction direction: the ontology edit rolls back exactly
    val back = Rdfs.maintainSchema(graft.Materialize(fwd), data, newS, oldS)
    val backTruth = Rdfs.supportCounts(data, oldS)
    assert(back.exceptAll(backTruth).count() === 0)
    assert(backTruth.exceptAll(back).count() === 0)
    // identical schemas: a no-op, the same frame back
    assert(Rdfs.maintainSchema(base, data, oldS, oldS) eq base)
  }

  test("RDFS entailment: domain of a SUPERproperty applies to the sub") {
    // (s sub o) entails (s super o) by rdfs7, whose domain then types s
    // by rdfs2 — the composition the folded maps must not miss
    val schema = Rdfs.Schema(
      subClassOf = Nil,
      subPropertyOf = Seq("capital" -> "cityIn"),
      domain = Seq("cityIn" -> "City"),
      range = Seq("cityIn" -> "Country"))
    val triples = Seq(("paris", "capital", "france")).toDF("s", "p", "o")
    val got = Rdfs.entail(triples, schema)
      .as[(String, String, String)].collect().toSet
    assert(got.contains(("paris", "type", "City")))
    assert(got.contains(("france", "type", "Country")))
    assert(got.contains(("paris", "cityIn", "france")))
  }

  test("entailment output never duplicates (idempotent union)") {
    val t = Triples.build(spark, sf0001)
    val e = Rdfs.entail(t, Rdfs.tpchSchema)
    assert(e.count() === e.distinct().count())
    // base triples survive entailment unchanged
    assert(t.exceptAll(e.select(col("s"), col("p"), col("o"))).isEmpty)
  }

  test("integer PageRank matches a hand-computed fixpoint on a tiny DAG") {
    // a -> c, b -> c, c -> d: after enough rounds,
    //   a = b = 150000 (no in-edges)
    //   c = 150000 + 85*(150000/1 + 150000/1)/100 = 405000
    //   d = 150000 + 85*(405000/1)/100 = 494250
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = GraphOps.pageRankMicro(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "a" -> 150000L, "b" -> 150000L, "c" -> 405000L, "d" -> 494250L))
  }

  test("integer PageRank floors exactly like long division") {
    // out-degree 3 from a: each neighbor gets 1000000 div 3 = 333333;
    // b = 150000 + 85*333333 div 100 = 150000 + 283333 = 433333
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("src", "dst")
    val got = GraphOps.pageRankMicro(edges, iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got("b") === 433333L)
    assert(got("a") === 150000L)
  }

  test("q_rdfs_infer over sf0.001: types inferred without any type triples") {
    val df = GraphOps.queries("q_rdfs_infer")(spark, sf0001)
    val types = df.filter(col("p") === "type")
      .select(col("o")).distinct().as[String].collect().toSet
    // every class in the ontology is inhabited at sf0.001
    assert(types === Set("Customer", "Agent", "Resource", "Nation", "Region",
      "Place", "Order", "Activity"))
    // spot-check: a customer node is an Agent and a Resource
    val c1 = df.filter(col("s") === "c:1" && col("p") === "type")
      .select(col("o")).as[String].collect().toSet
    assert(Set("Customer", "Agent", "Resource").subsetOf(c1))
  }

  test("BFS distances match a hand-computed graph with a shortcut") {
    // diamond + tail, undirected: a-b, a-c, b-d, c-d, d-e, plus the
    // shortcut a-e: e is at distance 1 via the shortcut, NOT 3 via d —
    // the min-distance semantics BFS must get right on cyclic graphs
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("a", "e"), ("x", "y")).toDF("src", "dst")
    val got = GraphOps.bfs(edges, "a", maxDepth = 8)
      .as[(String, Int)].collect().toMap
    assert(got === Map("a" -> 0, "b" -> 1, "c" -> 1, "e" -> 1, "d" -> 2))
    // x/y are a separate component: absent, not infinite
    assert(!got.contains("x"))
  }

  test("q_graph_bfs: structural distances over the entity graph") {
    val df = GraphOps.queries("q_graph_bfs")(spark, sf0001)
    val dist = df.as[(String, Int)].collect().toMap
    assert(dist("r:0") === 0)
    // the entity tree fixes distance by node kind within the component
    dist.foreach { case (node, d) =>
      node.charAt(0) match {
        case 'r' => assert(d === 0)
        case 'n' => assert(d === 1)
        case 'c' => assert(d === 2)
        case 'o' => assert(d === 3)
      }
    }
    // only region 0's component is reached — other regions absent
    assert(dist.keysIterator.count(_.startsWith("r:")) === 1)
  }

  test("q_graph_cc labels every node with its component's min id") {
    val df = GraphOps.queries("q_graph_cc")(spark, sf0001)
    val labels = df.as[(String, String)].collect().toMap
    // every region's chain collapses to one component; the graph has as
    // many components as regions (all referenced at this SF)
    val nRegions = labels.keysIterator.count(_.startsWith("r:"))
    assert(labels.values.toSet.size === nRegions)
    // the label really is the component-wide minimum: no member sorts
    // below its own label, and each label labels itself
    assert(labels.forall { case (n, l) => l <= n })
    assert(labels.values.toSet.forall(l => labels(l) === l))
    // chain coherence: an order, its customer, the customer's nation and
    // region all agree on the component
    val triples = Triples.build(spark, sf0001)
      .as[(String, String, String)].collect()
    val custOf = triples.collect { case (s, "custkey", o) => s -> o }.toMap
    val natOf = triples.collect { case (s, "nation", o) => s -> o }.toMap
    val regOf = triples.collect { case (s, "region", o) => s -> o }.toMap
    val (o1, c1c) = custOf.head
    assert(labels(o1) === labels(c1c))
    assert(labels(c1c) === labels(natOf(c1c)))
    assert(labels(natOf(c1c)) === labels(regOf(natOf(c1c))))
  }

  test("triangles: degree-ordered orientation counts each closure once") {
    // K4 on {a,b,c,d} has 4 triangles, every node in 3; an appended
    // pendant edge (d,e) closes nothing; a self-loop and a duplicate
    // edge must not inflate counts
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)
    val edges = (k4 ++ Seq(("d", "e"), ("e", "e"), ("a", "b")))
      .toDF("src", "dst")
    val got = GraphOps.triangles(edges, topK = 10)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L)))
    // a wheel: hub h connected to a 4-cycle rim — triangles only where
    // the rim closes with the hub (4 of them, hub in all)
    val rim = Seq(("r1", "r2"), ("r2", "r3"), ("r3", "r4"), ("r4", "r1"))
    val wheel = (rim ++ rim.flatMap(e => Seq(e)) ++
      Seq("r1", "r2", "r3", "r4").map(r => ("h", r))).toDF("src", "dst")
    val got2 = GraphOps.triangles(wheel, topK = 10)
      .as[(String, Long)].collect().toSet
    assert(got2 === Set(("h", 4L), ("r1", 2L), ("r2", 2L),
      ("r3", 2L), ("r4", 2L)))
  }

  test("sssp: relaxation improves a distance in a later round; K bounds " +
      "the edge count") {
    // a -1- b -1- c -1- d, plus a direct heavy edge a -10- d: round 1
    // settles d at 10, round 3 must IMPROVE it to 3
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("a", "d", 10L), ("a", "b", 5L)) // parallel edge keeps min
      .toDF("src", "dst", "w")
    def run(k: Int) = GraphOps.sssp(edges, "a", rounds = k)
      .as[(String, Long)].collect().toMap
    assert(run(1) === Map("a" -> 0L, "b" -> 1L, "d" -> 10L))
    assert(run(3) === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    // undirected: the reverse direction relaxes too
    assert(GraphOps.sssp(edges, "d", rounds = 3)
      .as[(String, Long)].collect().toMap ===
      Map("d" -> 0L, "c" -> 1L, "b" -> 2L, "a" -> 3L))
  }

  test("triangles adversarial skew: a 20k-spoke star hub contributes " +
      "zero wedges at its own end and finishes promptly") {
    // every spoke has degree 1 < hub degree, so orientation points all
    // edges spoke->hub and NO node has oriented out-degree >= 2: the
    // wedge join is EMPTY — the O(sqrt m) out-degree bound in action,
    // where an unoriented formulation would enumerate C(20k, 2) = 2*10^8
    // hub wedges
    val spokes = spark.range(20000)
      .selectExpr("concat('n', id) AS src", "'hub' AS dst")
    val t0 = System.nanoTime()
    val got = GraphOps.triangles(spokes, topK = 5).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.isEmpty)
    assert(secs < 60.0, s"star graph took ${secs}s — wedge blowup?")
  }
}
