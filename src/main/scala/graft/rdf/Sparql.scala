package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SPARQL front-end for the engine-supported fragment: SELECT over basic
  * graph patterns with OPTIONAL blocks and simple FILTERs.
  *
  * The reference delegates SPARQL parsing to Jena ARQ and answers the BGP
  * algebra (SURVEY.md §3.3); this is a self-contained recursive-descent
  * parser for exactly the fragment the engine executes, lowering to the
  * [[Bgp]] DSL (star-collapsed execution). Supported:
  *
  * {{{
  *   PREFIX ex: <http://example.org/>
  *   SELECT ?a ?b | SELECT *
  *   WHERE {
  *     ?a <pred> ?b .
  *     ?a ex:p "literal" .
  *     OPTIONAL { ?a <p2> ?c . }
  *     FILTER (?b = "x")   FILTER (?b != ?c)   FILTER regex(?b, "^ab")
  *   }
  * }}}
  *
  * Out of fragment (rejected, not silently mis-run): UNION, GROUP BY,
  * subqueries, property paths, blank nodes, numeric literals with
  * datatypes. SPARQL bag semantics on this fragment coincide with the SQL
  * bag semantics of the lowered plan.
  */
object Sparql {

  sealed trait FilterExpr
  final case class Cmp(left: Term, op: String, right: Term) extends FilterExpr
  final case class Regex(v: String, pattern: String) extends FilterExpr

  final case class Query(projection: Seq[String], where: Seq[TP],
      optionals: Seq[Seq[TP]], filters: Seq[FilterExpr])

  /** Parse and execute against a triples DataFrame(s,p,o).
    *
    * Executes via the join solver, which is correct for multi-valued
    * predicates (the RDF norm: one subject, many objects per predicate).
    * Pass `collapseStars = true` only when the data is known single-valued
    * per (subject, predicate) — property-table-shaped corpora — to get the
    * one-shuffle-per-star plan (see [[Bgp.solveStarCollapsed]]).
    */
  def run(triples: DataFrame, text: String,
      collapseStars: Boolean = false): DataFrame = {
    val q = parse(text)
    var df =
      if (collapseStars) Bgp.solveStarCollapsed(triples, q.where)
      else Bgp.solve(triples, q.where)
    q.optionals.foreach(o => df = Bgp.optional(df, triples, o))
    q.filters.foreach {
      case Cmp(l, op, r) =>
        val (lc, rc) = (termCol(df, l), termCol(df, r))
        df = df.filter(if (op == "=") lc === rc else lc =!= rc)
      case Regex(v, p) => df = df.filter(col(v).rlike(p))
    }
    if (q.projection == Seq("*")) df
    else df.select(q.projection.map(col): _*)
  }

  private def termCol(df: DataFrame, t: Term) = t match {
    case V(n) => col(n)
    case C(v) => lit(v)
  }

  // ----------------------------- parsing -------------------------------

  private val tokenRe =
    ("""\?[A-Za-z_]\w*|<[^>]*>|"(?:[^"\\]|\\.)*"|[A-Za-z_][\w-]*:[\w-]*|""" +
      """[A-Za-z]+|!=|=|[{}().,*]""").r

  def parse(text: String): Query = {
    val toks = tokenRe.findAllIn(text).toList
    val p = new P(toks)
    val prefixes = Iterator.continually(()).takeWhile(_ => p.peekKw("PREFIX")).map { _ =>
      p.expectKw("PREFIX")
      val name = p.next() // "ex:" parses as prefixed-name token "ex:"
      val iri = p.nextIri()
      name.stripSuffix(":") -> iri
    }.toMap
    p.expectKw("SELECT")
    val proj =
      if (p.peek() == "*") { p.next(); Seq("*") }
      else Iterator.continually(()).takeWhile(_ => p.peek().startsWith("?"))
        .map(_ => p.next().drop(1)).toSeq
    require(proj.nonEmpty, "SELECT needs variables or *")
    p.expectKw("WHERE"); p.expect("{")
    val where = scala.collection.mutable.ArrayBuffer.empty[TP]
    val optionals = scala.collection.mutable.ArrayBuffer.empty[Seq[TP]]
    val filters = scala.collection.mutable.ArrayBuffer.empty[FilterExpr]
    while (p.peek() != "}") {
      if (p.peekKw("OPTIONAL")) {
        p.expectKw("OPTIONAL"); p.expect("{")
        val block = scala.collection.mutable.ArrayBuffer.empty[TP]
        while (p.peek() != "}") { block += triplePattern(p, prefixes); p.maybe(".") }
        p.expect("}")
        optionals += block.toSeq
      } else if (p.peekKw("FILTER")) {
        p.expectKw("FILTER")
        filters += filterExpr(p, prefixes)
      } else {
        where += triplePattern(p, prefixes)
        p.maybe(".")
      }
    }
    p.expect("}")
    require(where.nonEmpty, "empty WHERE block")
    Query(proj, where.toSeq, optionals.toSeq, filters.toSeq)
  }

  private def triplePattern(p: P, prefixes: Map[String, String]): TP =
    TP(term(p, prefixes), term(p, prefixes), term(p, prefixes))

  private def term(p: P, prefixes: Map[String, String]): Term = {
    val t = p.next()
    if (t.startsWith("?")) V(t.drop(1))
    else if (t.startsWith("<")) C(t.stripPrefix("<").stripSuffix(">"))
    else if (t.startsWith("\"")) C(unquote(t))
    else if (t.contains(":")) {
      val Array(pre, local) = t.split(":", 2)
      val base = prefixes.getOrElse(pre,
        throw new IllegalArgumentException(s"unknown prefix '$pre:' in '$t'"))
      C(base + local)
    } else throw new IllegalArgumentException(s"unsupported term: $t")
  }

  private def filterExpr(p: P, prefixes: Map[String, String]): FilterExpr =
    if (p.peekKw("regex")) {
      p.expectKw("regex"); p.expect("(")
      val v = p.next()
      require(v.startsWith("?"), s"regex needs a variable, got $v")
      p.maybe(",")
      val pat = unquote(p.next())
      p.expect(")")
      Regex(v.drop(1), pat)
    } else {
      p.expect("(")
      val l = term(p, prefixes)
      val op = p.next()
      require(op == "=" || op == "!=", s"unsupported operator $op")
      val r = term(p, prefixes)
      p.expect(")")
      Cmp(l, op, r)
    }

  private def unquote(t: String): String =
    t.stripPrefix("\"").stripSuffix("\"")
      .replace("\\\"", "\"").replace("\\\\", "\\")

  private final class P(var toks: List[String]) {
    def peek(): String = toks.headOption.getOrElse(
      throw new IllegalArgumentException("unexpected end of query"))
    def next(): String = { val t = peek(); toks = toks.tail; t }
    def peekKw(kw: String): Boolean = toks.headOption.exists(_.equalsIgnoreCase(kw))
    def expectKw(kw: String): Unit = {
      val t = next()
      require(t.equalsIgnoreCase(kw), s"expected $kw, got $t")
    }
    def expect(s: String): Unit = {
      val t = next()
      require(t == s, s"expected '$s', got '$t'")
    }
    def maybe(s: String): Unit = if (toks.headOption.contains(s)) { toks = toks.tail }
    def nextIri(): String = {
      val t = next()
      require(t.startsWith("<"), s"expected IRI, got $t")
      t.stripPrefix("<").stripSuffix(">")
    }
  }
}
