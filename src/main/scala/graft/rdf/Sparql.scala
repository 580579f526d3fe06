package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL front-end for the engine-supported fragment: SELECT, ASK and
  * CONSTRUCT over basic graph patterns with OPTIONAL / MINUS blocks,
  * FILTERs, VALUES inline bindings, UNION, and the solution modifiers
  * DISTINCT / ORDER BY / LIMIT / OFFSET.
  *
  * The reference delegates SPARQL parsing to Jena ARQ and answers the BGP
  * algebra (SURVEY.md §3.3); this is a self-contained recursive-descent
  * parser for exactly the fragment the engine executes, lowering to the
  * [[Bgp]] DSL. Supported:
  *
  * {{{
  *   PREFIX ex: <http://example.org/>
  *   SELECT [DISTINCT] ?a ?b | SELECT *
  *   WHERE {
  *     ?a <pred> ?b .
  *     ?a ex:p "literal" .
  *     OPTIONAL { ?a <p2> ?c . }
  *     FILTER (?b = "x")   FILTER (?b != ?c)   FILTER regex(?b, "^ab")
  *     FILTER (?n >= 10)   FILTER (?n < 19.5)      # numeric coercion
  *   }
  *   -- or a union of groups:
  *   WHERE { { ?a <p> ?b . } UNION { ?a <q> ?b . OPTIONAL {...} } }
  *   ORDER BY ?a DESC(?b)  LIMIT 100  OFFSET 10
  * }}}
  *
  * Semantics notes:
  *  - UNION is SPARQL bag union of solution mappings; variables unbound in
  *    a branch are null-padded (lowered to `unionByName` with
  *    `allowMissingColumns = true`, the exact same padding rule).
  *  - numeric FILTER comparisons coerce via `try_cast(double)`: a binding
  *    that is not a number compares unknown → row dropped, matching
  *    SPARQL's type-error-eliminates-row rule (and DuckDB's TRY_CAST).
  *  - ORDER BY sorts ascending nulls-first / descending nulls-last;
  *    OFFSET applies before LIMIT (SPARQL 18.2.5 modifier order).
  *
  * Out of fragment (rejected, not silently mis-run): GROUP BY, subqueries,
  * property paths, blank nodes, datatyped literals. Trailing tokens after
  * the solution modifiers are an error, so an unsupported clause can never
  * be silently ignored. SPARQL bag semantics on this fragment coincide
  * with the SQL bag semantics of the lowered plan.
  */
object Sparql {

  sealed trait FilterExpr
  final case class Cmp(left: Term, op: String, right: Term) extends FilterExpr
  final case class Regex(v: String, pattern: String) extends FilterExpr

  /** One group graph pattern: a BGP plus its VALUES tables, OPTIONALs,
    * MINUSes and FILTERs (applied in that order within the block). Each
    * VALUES entry is (variable names, rows of constants). */
  final case class Block(where: Seq[TP], optionals: Seq[Seq[TP]],
      filters: Seq[FilterExpr], minuses: Seq[Seq[TP]] = Nil,
      values: Seq[(Seq[String], Seq[Seq[String]])] = Nil)

  final case class OrderKey(v: String, asc: Boolean)

  final case class Query(projection: Seq[String], branches: Seq[Block],
      distinct: Boolean, orderKeys: Seq[OrderKey],
      limit: Option[Int], offset: Option[Int], ask: Boolean = false,
      construct: Option[Seq[TP]] = None) {
    // single-branch accessors (the pre-UNION shape most callers inspect);
    // guarded so a union query can never silently expose only its first
    // branch to plan analysis — inspect `branches` for those
    private def only: Block = {
      require(branches.size == 1,
        s"query has ${branches.size} UNION branches — use `branches`")
      branches.head
    }
    def where: Seq[TP] = only.where
    def optionals: Seq[Seq[TP]] = only.optionals
    def filters: Seq[FilterExpr] = only.filters
  }

  /** Parse and execute against a triples DataFrame(s,p,o).
    *
    * Executes via the join solver, which is correct for multi-valued
    * predicates (the RDF norm: one subject, many objects per predicate).
    * Pass `collapseStars = true` only when the data is known single-valued
    * per (subject, predicate) — property-table-shaped corpora — to get the
    * one-shuffle-per-star plan (see [[Bgp.solveStarCollapsed]]).
    */
  def run(triples: DataFrame, text: String,
      collapseStars: Boolean = false): DataFrame =
    execute(parse(text), bgp =>
      if (collapseStars) Bgp.solveStarCollapsed(triples, bgp)
      else Bgp.solve(triples, bgp))

  /** Parse and execute against the dictionary-encoded id-triple store —
    * the complete reference pipeline: text → BGP algebra → constants
    * encoded to ids → the whole join tree over longs → bindings decoded at
    * emission ([[EncodedBgp]]). OPTIONAL blocks are likewise solved in id
    * space and left-joined after decode; FILTERs (string/regex/numeric
    * semantics) apply to the decoded bindings, where they mean the same
    * thing as in [[run]].
    */
  def runEncoded(enc: DataFrame, dict: DataFrame, text: String,
      collapseStars: Boolean = false): DataFrame = {
    val q = parse(text)
    // ONE dictionary-lookup job for the whole query — every UNION branch,
    // OPTIONAL and MINUS block shares the resolved constant map. MINUS must
    // be in the batch: a MINUS-only constant absent from the map would make
    // solveResolved see allResolved=false and gate the MINUS block to empty,
    // silently returning a superset (nothing subtracted).
    val allPats = q.branches.flatMap(b =>
      b.where ++ b.optionals.flatten ++ b.minuses.flatten)
    val idOf = EncodedBgp.resolveConstants(dict, allPats)
    execute(q, bgp => EncodedBgp.solveResolved(enc, dict, bgp, idOf, collapseStars))
  }

  /** Lower a parsed query given a BGP solver that returns string-space
    * bindings; everything above the BGP (OPTIONAL, FILTER, UNION, solution
    * modifiers) is solver-independent.
    */
  private def execute(q: Query, solveBgp: Seq[TP] => DataFrame): DataFrame = {
    val solved = q.branches.map { b =>
      var df = solveBgp(b.where)
      // VALUES = join with the inline solution table (restricts shared
      // vars, cross-products disjoint ones — SPARQL join semantics)
      b.values.foreach { case (vars, rows) =>
        val spark = df.sparkSession
        val schema = org.apache.spark.sql.types.StructType(vars.map(v =>
          org.apache.spark.sql.types.StructField(v,
            org.apache.spark.sql.types.StringType, nullable = false)))
        val vdf = spark.createDataFrame(
          java.util.Arrays.asList(rows.map(r =>
            org.apache.spark.sql.Row(r: _*)): _*), schema)
        df = Bgp.joinSolved(df, vdf)
      }
      b.optionals.foreach(o => df = Bgp.optionalSolved(df, solveBgp(o)))
      b.minuses.foreach(m => df = Bgp.minusSolved(df, solveBgp(m)))
      b.filters.foreach(f => df = df.filter(filterCol(f)))
      df
    }
    var df = solved.reduce(_.unionByName(_, allowMissingColumns = true))
    // ASK = "does any solution exist": limit(1) stops the scan at the
    // first match, the aggregate makes it a 1-row boolean frame
    if (q.ask) return df.limit(1).agg((count(lit(1)) > 0).as("ask"))
    // CONSTRUCT = instantiate each template pattern once per solution and
    // union; a graph is a SET of triples, hence the distinct
    q.construct.foreach { template =>
      val bound = df.columns.toSet
      val tVars = template.flatMap(tp => Seq(tp.s, tp.p, tp.o))
        .collect { case V(n) => n }
      require(tVars.forall(bound), s"CONSTRUCT template uses unbound " +
        s"variables: ${tVars.filterNot(bound).mkString(", ")}")
      def t2c(t: Term): Column = t match {
        case V(n) => col(n)
        case C(v) => lit(v)
      }
      return template.map(tp => df.select(
          t2c(tp.s).cast("string").as("s"), t2c(tp.p).cast("string").as("p"),
          t2c(tp.o).cast("string").as("o")))
        .reduce(_.unionByName(_)).distinct()
    }
    if (q.projection != Seq("*")) df = df.select(q.projection.map(col): _*)
    if (q.distinct) df = df.distinct()
    if (q.orderKeys.nonEmpty)
      df = df.orderBy(q.orderKeys.map(k =>
        if (k.asc) asc_nulls_first(k.v) else desc_nulls_last(k.v)): _*)
    q.offset.foreach(n => df = df.offset(n))
    q.limit.foreach(n => df = df.limit(n))
    df
  }

  private def filterCol(f: FilterExpr): Column = f match {
    case Regex(v, p) => col(v).rlike(p)
    case Cmp(l, op, r) =>
      // a numeric constant on either side switches the comparison to
      // numeric semantics over both sides; try_cast (not cast) so that a
      // non-numeric binding is a SPARQL type error → row eliminated, even
      // under ANSI mode
      val numeric = Seq(l, r).exists {
        case C(_: BigDecimal) => true
        case _ => false
      }
      def side(t: Term): Column = t match {
        // backticks: a variable named like a SQL keyword/literal (?true,
        // ?order) must stay a column reference inside the expr text
        case V(n) => if (numeric) expr(s"try_cast(`$n` AS double)") else col(n)
        case C(v: BigDecimal) => lit(v.toDouble)
        case C(v) => lit(v)
      }
      val (lc, rc) = (side(l), side(r))
      op match {
        case "=" => lc === rc
        case "!=" => lc =!= rc
        case "<" => lc < rc
        case ">" => lc > rc
        case "<=" => lc <= rc
        case ">=" => lc >= rc
      }
  }

  // ----------------------------- parsing -------------------------------

  // IRI bodies exclude whitespace (as in SPARQL) — essential so that a
  // bare '<' comparison operator can never swallow text up to some later
  // '>' in the query.
  private val tokenRe =
    ("""\?[A-Za-z_]\w*|<[^>\s]*>|"(?:[^"\\]|\\.)*"|[A-Za-z_][\w-]*:[\w-]*|""" +
      """[A-Za-z]+|-?\d+(?:\.\d+)?|<=|>=|!=|=|[{}().,*]|<|>""").r

  def parse(text: String): Query = {
    val toks = tokenRe.findAllIn(text).toList
    val p = new P(toks)
    val prefixes = Iterator.continually(()).takeWhile(_ => p.peekKw("PREFIX")).map { _ =>
      p.expectKw("PREFIX")
      val name = p.next() // "ex:" parses as prefixed-name token "ex:"
      val iri = p.nextIri()
      name.stripSuffix(":") -> iri
    }.toMap
    val ask = p.peekKw("ASK")
    val construct =
      if (p.peekKw("CONSTRUCT")) {
        p.expectKw("CONSTRUCT"); p.expect("{")
        val template = scala.collection.mutable.ArrayBuffer.empty[TP]
        while (p.peek() != "}") { template += triplePattern(p, prefixes); p.maybe(".") }
        p.expect("}")
        require(template.nonEmpty, "empty CONSTRUCT template")
        Some(template.toSeq)
      } else None
    val (distinct, proj) =
      if (ask) { p.expectKw("ASK"); (false, Seq("*")) }
      else if (construct.isDefined) (false, Seq("*"))
      else {
        p.expectKw("SELECT")
        val d = if (p.peekKw("DISTINCT")) { p.next(); true } else false
        val pr =
          if (p.peek() == "*") { p.next(); Seq("*") }
          else Iterator.continually(()).takeWhile(_ => p.peek().startsWith("?"))
            .map(_ => p.next().drop(1)).toSeq
        require(pr.nonEmpty, "SELECT needs variables or *")
        (d, pr)
      }
    p.expectKw("WHERE"); p.expect("{")
    val branches =
      if (p.peek() == "{") {
        // { group } UNION { group } [ UNION { group } ]*
        val bs = scala.collection.mutable.ArrayBuffer(group(p, prefixes))
        while (p.peekKw("UNION")) { p.expectKw("UNION"); bs += group(p, prefixes) }
        require(bs.size >= 2, "a braced group must be a UNION branch")
        p.expect("}")
        bs.toSeq
      } else {
        val b = blockBody(p, prefixes)
        p.expect("}")
        Seq(b)
      }
    val orderKeys = scala.collection.mutable.ArrayBuffer.empty[OrderKey]
    if (p.peekKw("ORDER")) {
      p.expectKw("ORDER"); p.expectKw("BY")
      while (p.hasNext &&
          (p.peek().startsWith("?") || p.peekKw("ASC") || p.peekKw("DESC"))) {
        if (p.peekKw("ASC") || p.peekKw("DESC")) {
          val asc = p.next().equalsIgnoreCase("ASC")
          p.expect("(")
          val v = p.next()
          require(v.startsWith("?"), s"ORDER BY needs a variable, got $v")
          p.expect(")")
          orderKeys += OrderKey(v.drop(1), asc)
        } else orderKeys += OrderKey(p.next().drop(1), asc = true)
      }
      require(orderKeys.nonEmpty, "empty ORDER BY")
    }
    // LIMIT and OFFSET may appear in either order (SPARQL LimitOffsetClauses)
    var limit, offset = Option.empty[Int]
    while (p.hasNext && (p.peekKw("LIMIT") || p.peekKw("OFFSET"))) {
      val kw = p.next()
      val n = p.nextInt()
      if (kw.equalsIgnoreCase("LIMIT")) limit = Some(n) else offset = Some(n)
    }
    require(!p.hasNext, s"unsupported trailing clause: ${p.rest.take(5).mkString(" ")}")
    require(!(ask || construct.isDefined) ||
        (orderKeys.isEmpty && limit.isEmpty && offset.isEmpty),
      "ASK/CONSTRUCT take no solution modifiers in this fragment")
    Query(proj, branches, distinct, orderKeys.toSeq, limit, offset, ask, construct)
  }

  /** `{ ... }` union branch. */
  private def group(p: P, prefixes: Map[String, String]): Block = {
    p.expect("{")
    val b = blockBody(p, prefixes)
    p.expect("}")
    b
  }

  /** Triples / OPTIONAL / MINUS / FILTER members up to (not consuming)
    * `}`. */
  private def blockBody(p: P, prefixes: Map[String, String]): Block = {
    val where = scala.collection.mutable.ArrayBuffer.empty[TP]
    val optionals = scala.collection.mutable.ArrayBuffer.empty[Seq[TP]]
    val minuses = scala.collection.mutable.ArrayBuffer.empty[Seq[TP]]
    val filters = scala.collection.mutable.ArrayBuffer.empty[FilterExpr]
    def bracedPatterns(): Seq[TP] = {
      p.expect("{")
      val block = scala.collection.mutable.ArrayBuffer.empty[TP]
      while (p.peek() != "}") { block += triplePattern(p, prefixes); p.maybe(".") }
      p.expect("}")
      block.toSeq
    }
    val values =
      scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[Seq[String]])]
    def constant(): String = term(p, prefixes) match {
      case C(v) => v.toString
      case V(n) => throw new IllegalArgumentException(
        s"VALUES rows take constants, got ?$n")
    }
    while (p.peek() != "}") {
      if (p.peekKw("OPTIONAL")) {
        p.expectKw("OPTIONAL")
        optionals += bracedPatterns()
      } else if (p.peekKw("MINUS")) {
        p.expectKw("MINUS")
        minuses += bracedPatterns()
      } else if (p.peekKw("FILTER")) {
        p.expectKw("FILTER")
        filters += filterExpr(p, prefixes)
      } else if (p.peekKw("VALUES")) {
        // VALUES ?x { "a" "b" }  |  VALUES (?x ?y) { ("a" "b") ("c" "d") }
        p.expectKw("VALUES")
        val vars =
          if (p.peek() == "(") {
            p.expect("(")
            val vs = scala.collection.mutable.ArrayBuffer.empty[String]
            while (p.peek() != ")") {
              val v = p.next()
              require(v.startsWith("?"), s"VALUES needs variables, got $v")
              vs += v.drop(1)
            }
            p.expect(")")
            vs.toSeq
          } else {
            val v = p.next()
            require(v.startsWith("?"), s"VALUES needs a variable, got $v")
            Seq(v.drop(1))
          }
        require(vars.nonEmpty, "VALUES needs at least one variable")
        p.expect("{")
        val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        while (p.peek() != "}") {
          rows += (if (vars.size == 1) Seq(constant())
          else {
            p.expect("(")
            val r = vars.map(_ => constant())
            p.expect(")")
            r
          })
        }
        p.expect("}")
        require(rows.nonEmpty, "empty VALUES table")
        values += vars -> rows.toSeq
      } else {
        where += triplePattern(p, prefixes)
        p.maybe(".")
      }
    }
    require(where.nonEmpty, "empty WHERE block")
    Block(where.toSeq, optionals.toSeq, filters.toSeq, minuses.toSeq,
      values.toSeq)
  }

  private def triplePattern(p: P, prefixes: Map[String, String]): TP =
    TP(term(p, prefixes), term(p, prefixes), term(p, prefixes))

  private val numRe = """-?\d+(?:\.\d+)?""".r

  private def term(p: P, prefixes: Map[String, String]): Term = {
    val t = p.next()
    if (t.startsWith("?")) V(t.drop(1))
    else if (t.startsWith("<")) C(t.stripPrefix("<").stripSuffix(">"))
    else if (t.startsWith("\"")) C(unquote(t))
    // a bare number in a *pattern* matches the term's lexical form (the
    // triples table stores strings); numeric semantics live in FILTER
    else if (numRe.matches(t)) C(t)
    else if (t.contains(":")) {
      val Array(pre, local) = t.split(":", 2)
      val base = prefixes.getOrElse(pre,
        throw new IllegalArgumentException(s"unknown prefix '$pre:' in '$t'"))
      C(base + local)
    } else throw new IllegalArgumentException(s"unsupported term: $t")
  }

  /** FILTER operand: like [[term]] but numbers become typed constants. */
  private def filterTerm(p: P, prefixes: Map[String, String]): Term = {
    val t = p.peek()
    if (numRe.matches(t)) { p.next(); C(BigDecimal(t)) }
    else term(p, prefixes)
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
      val l = filterTerm(p, prefixes)
      val op = p.next()
      require(Set("=", "!=", "<", ">", "<=", ">=")(op), s"unsupported operator $op")
      val r = filterTerm(p, prefixes)
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
    def hasNext: Boolean = toks.nonEmpty
    def rest: List[String] = toks
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
    def nextInt(): Int = {
      val t = next()
      require(t.matches("""\d+"""), s"expected a count, got $t")
      t.toInt
    }
    def nextIri(): String = {
      val t = next()
      require(t.startsWith("<"), s"expected IRI, got $t")
      t.stripPrefix("<").stripSuffix(">")
    }
  }
}
