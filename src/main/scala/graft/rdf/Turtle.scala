package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turtle (W3C Turtle 1.1) reader — the dominant RDF serialization in the
  * wild, next to the line-oriented [[NTriples]]/[[NQuads]] readers.
  *
  * Supported grammar subset (the Turtle every mainstream exporter emits):
  * `@prefix` / SPARQL-style `PREFIX` directives, prefixed names, `a`,
  * IRIs, predicate-object (`;`) and object (`,`) lists, labelled blank
  * nodes and `[ ... ]` blank node property lists (as subject or object),
  * literals with `@lang` tags and `^^` datatypes, short and long
  * (`"""..."""`) double-quoted strings with ECHAR/UCHAR escapes
  * ([[NtEscapes]]), single-quoted variants, bare numeric / boolean
  * abbreviations, RDF collections `( ... )` (desugared to their
  * rdf:first/rdf:rest/rdf:nil chains with document-scoped blank nodes),
  * and `@base` / SPARQL-style `BASE` with RFC 3986 relative-IRI
  * resolution ([[resolveIri]] — manual §5.2 merge, since `java.net.URI`
  * rejects the non-ASCII characters IRIs allow). A relative IRI in a
  * document that never set a base is rejected loudly with the offset.
  *
  * Distribution model: Turtle is a STATEFUL format — prefix directives
  * scope the rest of the document and statements span lines — so unlike
  * N-Triples it cannot be split inside a file. The reader parallelizes
  * per FILE (`wholetext` scan → flatMap parse), the standard ingest shape
  * for Turtle corpora: a 100 TB drop arrives as many documents, and each
  * task parses one. Single huge .ttl files should be converted to
  * N-Triples ([[NTriples.write]]) for splittable re-reads — that IS this
  * engine's load path (read once → persist columnar).
  *
  * Output matches [[NTriples.parseTyped]]'s plain-lexical convention —
  * `(s, p, o, o_is_iri)` with IRIs expanded and literal lexical forms
  * decoded — plus `o_lang` / `o_datatype` columns keeping the full
  * literal fidelity that the line regex of the N-Triples reader drops.
  * Blank node labels are rewritten `_:b<docHash>_<n>` so labels from
  * different documents can never collide when corpora are unioned
  * (Turtle blank node scope is the document).
  */
object Turtle {

  final case class Row(s: String, p: String, o: String, o_is_iri: Boolean,
      o_lang: String, o_datatype: String)

  /** (s, p, o) plain-lexical triples — the layout the dictionary/BGP
    * layer consumes. */
  def read(spark: SparkSession, path: String): DataFrame =
    readTyped(spark, path).select("s", "p", "o")

  /** Full-fidelity read: (s, p, o, o_is_iri, o_lang, o_datatype). */
  def readTyped(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, doc) => parseDoc(doc, docTag(file, doc)) }
      .toDF()
  }

  /** Parse one Turtle document (driver- or executor-side Scala). */
  def parseDoc(doc: String, bnodeTag: String = "d"): Seq[Row] =
    new Parser(doc, bnodeTag).parse()

  /** Render `o` as a [[Terms]] term string, restoring `@lang`/`^^dt`
    * markup — feeds the SPARQL term-introspection built-ins. */
  def termStrings(typed: DataFrame): DataFrame =
    typed.select(col("s"), col("p"),
      when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
        .when(col("o").startsWith("_:"), col("o"))
        .when(col("o_lang") =!= "",
          concat(lit("\""), col("o"), lit("\"@"), col("o_lang")))
        .when(col("o_datatype") =!= "",
          concat(lit("\""), col("o"), lit("\"^^<"), col("o_datatype"), lit(">")))
        .otherwise(concat(lit("\""), col("o"), lit("\""))).as("o"))

  /** Turtle sink: subject-grouped statements exercising the `;`
    * predicate-object and `,` object list syntax, deterministically
    * sorted. Input is (s, p, o, o_is_iri) — [[NTriples.parseTyped]]'s
    * layout. Two aggregations (per-(s,p), then per-s) — a sink cost, paid
    * once at export. */
  def write(typed: DataFrame, path: String): Unit = {
    graft.functions.GraftFunctions.register(typed.sparkSession)
    val obj = when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
      .otherwise(concat(lit("\""), expr("nt_escape(o)"), lit("\"")))
    typed
      .groupBy(col("s"), col("p"))
      .agg(concat_ws(" , ", array_sort(collect_list(obj))).as("objs"))
      .groupBy(col("s"))
      .agg(concat_ws(" ; ", array_sort(collect_list(
        concat(lit("<"), col("p"), lit("> "), col("objs"))))).as("body"))
      .select(concat(lit("<"), col("s"), lit("> "), col("body"), lit(" ."))
        .as("value"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
  }

  private[rdf] def docTag(file: String, doc: String): String =
    graft.sources.AtomicStore.key(file, doc.length.toString).take(8)

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*$"

  /** RFC 3986 §5.2 reference resolution over raw strings. `java.net.URI`
    * rejects the non-ASCII characters IRIs allow (RFC 3987 widens the
    * char classes but keeps §5.2's resolution verbatim), so the merge is
    * done manually. `base` must be absolute. */
  private[rdf] def resolveIri(base: String, ref: String): String = {
    // (scheme, hasAuthority, authority, path, query-with-?, frag-with-#)
    def split(u: String): (String, Boolean, String, String, String, String) = {
      var s = u
      var frag = ""
      val hi = s.indexOf('#')
      if (hi >= 0) { frag = s.substring(hi); s = s.substring(0, hi) }
      var query = ""
      val qi = s.indexOf('?')
      if (qi >= 0) { query = s.substring(qi); s = s.substring(0, qi) }
      var scheme = ""
      val ci = s.indexOf(':')
      if (ci > 0 && s.substring(0, ci).matches("[A-Za-z][A-Za-z0-9+.-]*")) {
        scheme = s.substring(0, ci); s = s.substring(ci + 1)
      }
      var hasAuth = false
      var auth = ""
      if (s.startsWith("//")) {
        hasAuth = true
        val end = s.indexOf('/', 2) match { case -1 => s.length; case k => k }
        auth = s.substring(2, end); s = s.substring(end)
      }
      (scheme, hasAuth, auth, s, query, frag)
    }
    // §5.2.4 remove_dot_segments, the literal buffer algorithm
    def removeDots(p0: String): String = {
      var in = p0
      val out = new StringBuilder
      def dropLastSeg(): Unit = {
        val k = out.lastIndexOf("/")
        out.setLength(if (k >= 0) k else 0)
      }
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSeg() }
        else if (in == "/..") { in = "/"; dropLastSeg() }
        else if (in == "." || in == "..") in = ""
        else {
          val start = if (in.startsWith("/")) 1 else 0
          val next = in.indexOf('/', start)
          if (next == -1) { out.append(in); in = "" }
          else { out.append(in.substring(0, next)); in = in.substring(next) }
        }
      }
      out.toString
    }
    val (bs, bHasAuth, ba, bp, bq, _) = split(base)
    require(bs.nonEmpty, s"base IRI '$base' has no scheme — not absolute")
    val (rs, rHasAuth, ra, rp, rq, rf) = split(ref)
    val (s, hasAuth, a, pth, q) =
      if (rs.nonEmpty) (rs, rHasAuth, ra, removeDots(rp), rq)
      else if (rHasAuth) (bs, true, ra, removeDots(rp), rq)
      else if (rp.isEmpty) (bs, bHasAuth, ba, bp, if (rq.nonEmpty) rq else bq)
      else if (rp.startsWith("/")) (bs, bHasAuth, ba, removeDots(rp), rq)
      else {
        val merged =
          if (bHasAuth && bp.isEmpty) "/" + rp
          else bp.lastIndexOf('/') match {
            case -1 => rp
            case k => bp.substring(0, k + 1) + rp
          }
        (bs, bHasAuth, ba, removeDots(merged), rq)
      }
    val sb = new StringBuilder
    if (s.nonEmpty) sb.append(s).append(':')
    if (hasAuth) sb.append("//").append(a)
    sb.append(pth).append(q).append(rf)
    sb.toString
  }

  // ------------------------- the parser itself -------------------------

  /** Package-visible so [[Trig]] reuses the whole Turtle grammar — TriG
    * 1.1 is Turtle plus graph blocks, so the TriG entry point lives here
    * as [[Parser.parseTrig]] and shares every production below. */
  private[rdf] final class Parser(doc: String, tag: String) {
    private var i = 0
    private val prefixes = scala.collection.mutable.Map.empty[String, String]
    private var base: String = null // @base / BASE scope: rest of document
    private var bn = 0
    private val out = scala.collection.mutable.ArrayBuffer.empty[Row]

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Turtle: $msg at offset $i: '" +
        doc.slice(i, math.min(i + 24, doc.length)).takeWhile(_ != '\n') + "'")

    private def ws(): Unit = {
      var go = true
      while (go) {
        while (i < doc.length && doc.charAt(i).isWhitespace) i += 1
        if (i < doc.length && doc.charAt(i) == '#') {
          while (i < doc.length && doc.charAt(i) != '\n') i += 1
        } else go = false
      }
    }

    private def eof: Boolean = { ws(); i >= doc.length }
    private def peekCh: Char = doc.charAt(i)
    private def expect(c: Char): Unit = {
      ws()
      if (i >= doc.length || doc.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def matchWord(w: String): Boolean = {
      ws()
      // the boundary must exclude ':' and '_' too: `a:x` is a prefixed
      // name using prefix "a", NOT the `a` keyword (likewise `true:x`)
      if (doc.regionMatches(true, i, w, 0, w.length) &&
          (i + w.length >= doc.length || {
            val c = doc.charAt(i + w.length)
            // reject the full PN_CHARS set: `a-b:x` / `a·x` are prefixed
            // names whose prefix merely STARTS with the keyword letters
            !Character.isLetterOrDigit(c) && c != ':' && c != '_' &&
              c != '-' && c != 0x00B7.toChar &&
              !(c >= 0x0300.toChar && c <= 0x036F.toChar) &&
              !(c >= 0x203F.toChar && c <= 0x2040.toChar)
          })) {
        i += w.length; true
      } else false
    }

    def parse(): Seq[Row] = {
      while (!eof) {
        if (doc.charAt(i) == '@' || matchesSparqlPrefix()) directive()
        else statement()
      }
      out.toSeq
    }

    // ------------------------- TriG additions -------------------------

    private val qout =
      scala.collection.mutable.ArrayBuffer.empty[(Row, String)]
    private var qmark = 0
    /** Tag every row emitted since the last drain with graph `g`. */
    private def drain(g: String): Unit = {
      while (qmark < out.length) { qout += ((out(qmark), g)); qmark += 1 }
    }

    /** TriG 1.1 document: Turtle statements (default graph) interleaved
      * with `[GRAPH] label { ... }` / `{ ... }` graph blocks. */
    private[rdf] def parseTrig(): Seq[(Row, String)] = {
      while (!eof) {
        if (doc.charAt(i) == '@' || matchesSparqlPrefix()) directive()
        else if (peekCh == '{') { i += 1; graphBody(Quads.DefaultGraph) }
        else if (matchWord("GRAPH")) {
          val g = graphLabel(); expect('{'); graphBody(g)
        } else {
          // labelOrSubject: a node followed by '{' labels a graph block;
          // anything else continues as a default-graph Turtle statement
          val before = out.length
          val node = subject()
          ws()
          if (i < doc.length && peekCh == '{') {
            if (out.length != before)
              fail("a non-empty blank node property list cannot label a graph")
            i += 1
            graphBody(node)
          } else {
            predicateObjectList(node)
            expect('.')
            drain(Quads.DefaultGraph)
          }
        }
      }
      qout.toSeq
    }

    private def graphLabel(): String = {
      ws()
      peekCh match {
        case '<' => iriRef()
        case '_' => blankLabel()
        case '[' =>
          expect('['); ws(); expect(']'); freshBnode() // ANON label
        case _ => prefixedName()
      }
    }

    /** Statements until '}', each tagged with the block's graph; the
      * final '.' before '}' is optional (TriG triplesBlock). */
    private def graphBody(g: String): Unit = {
      ws()
      while (i < doc.length && doc.charAt(i) != '}') {
        val subj = subject()
        predicateObjectList(subj)
        ws()
        if (i < doc.length && doc.charAt(i) == '.') i += 1
        else if (i >= doc.length || doc.charAt(i) != '}')
          fail("expected '.' or '}'")
        ws()
      }
      expect('}')
      drain(g)
    }

    private def matchesSparqlPrefix(): Boolean = {
      def word(w: String): Boolean =
        doc.regionMatches(true, i, w, 0, w.length) && {
          val after = i + w.length
          after >= doc.length || (!Character.isLetterOrDigit(doc.charAt(after))
            && doc.charAt(after) != ':' && doc.charAt(after) != '_')
        }
      word("PREFIX") || word("BASE")
    }

    private def directive(): Unit = {
      val atForm = doc.charAt(i) == '@'
      if (atForm) i += 1
      if (matchWord("prefix")) {
        ws()
        val name = pnameNs()
        ws()
        val iri = iriRef()
        prefixes(name) = iri
        if (atForm) expect('.')
      } else if (matchWord("base")) {
        ws()
        // iriRef() resolves a RELATIVE @base against the current base
        // (legal: later directives re-base relative to earlier ones)
        base = iriRef()
        if (atForm) expect('.')
      } else fail("unsupported directive")
    }

    /** `pname:` → the prefix name (may be empty). */
    private def pnameNs(): String = {
      val start = i
      while (i < doc.length && doc.charAt(i) != ':' &&
        !doc.charAt(i).isWhitespace) i += 1
      if (i >= doc.length || doc.charAt(i) != ':') fail("expected 'name:'")
      val name = doc.substring(start, i)
      i += 1
      name
    }

    private def iriRef(): String = {
      ws()
      if (i >= doc.length || doc.charAt(i) != '<') fail("expected <iri>")
      val end = doc.indexOf('>', i + 1)
      if (end < 0) fail("unterminated IRI")
      val body = doc.substring(i + 1, end)
      if (body.exists(_.isWhitespace)) fail("whitespace in IRI")
      i = end + 1
      val iri = NtEscapes.unescape(body)
      // no @base in scope → the ref is kept VERBATIM: the engine-wide
      // plain-lexical convention (its own Turtle exports write bare
      // `<name>` predicates), and exactly the pre-@base behavior. Once a
      // base is set, relative refs resolve per RFC 3986.
      if (base == null || iri.matches(SchemeRe)) iri
      else resolveIri(base, iri)
    }

    private def statement(): Unit = {
      val subj = subject()
      predicateObjectList(subj)
      expect('.')
    }

    private def subject(): String = {
      ws()
      peekCh match {
        case '<' => iriRef()
        case '[' => bnodePropertyList()
        case '_' => blankLabel()
        case '(' => collection()
        case _ => prefixedName()
      }
    }

    private def blankLabel(): String = {
      if (!doc.regionMatches(i, "_:", 0, 2)) fail("expected blank node")
      i += 2
      val start = i
      while (i < doc.length && (doc.charAt(i).isLetterOrDigit ||
        doc.charAt(i) == '_' || doc.charAt(i) == '-')) i += 1
      if (i == start) fail("empty blank node label")
      // document-scoped label → corpus-unique label (the l_/g_ split keeps
      // a literal label "g1" from colliding with a generated node)
      s"_:b${tag}_l_${doc.substring(start, i)}"
    }

    private def freshBnode(): String = { bn += 1; s"_:b${tag}_g$bn" }

    private def prefixedName(): String = {
      val start = i
      while (i < doc.length && doc.charAt(i) != ':' &&
        (doc.charAt(i).isLetterOrDigit || doc.charAt(i) == '_' ||
          doc.charAt(i) == '-' || doc.charAt(i) == '.')) i += 1
      if (i >= doc.length || doc.charAt(i) != ':') fail("expected prefixed name")
      val pre = doc.substring(start, i)
      i += 1
      val lstart = i
      while (i < doc.length && (doc.charAt(i).isLetterOrDigit ||
        doc.charAt(i) == '_' || doc.charAt(i) == '-' ||
        (doc.charAt(i) == '.' && i + 1 < doc.length &&
          doc.charAt(i + 1).isLetterOrDigit))) i += 1
      val local = doc.substring(lstart, i)
      val base = prefixes.getOrElse(pre, fail(s"unknown prefix '$pre:'"))
      base + local
    }

    private def verb(): String = {
      ws()
      if (matchWord("a")) "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
      else if (peekCh == '<') iriRef()
      else prefixedName()
    }

    private def predicateObjectList(subj: String): Unit = {
      var more = true
      while (more) {
        val p = verb()
        objectList(subj, p)
        ws()
        more = i < doc.length && doc.charAt(i) == ';' && {
          // consecutive ';;' (empty po-list entries) are legal Turtle
          while (i < doc.length && doc.charAt(i) == ';') { i += 1; ws() }
          // trailing ';' before '.' or ']' is legal
          i < doc.length && doc.charAt(i) != '.' && doc.charAt(i) != ']'
        }
      }
    }

    private def objectList(subj: String, p: String): Unit = {
      obj(subj, p)
      ws()
      while (i < doc.length && doc.charAt(i) == ',') {
        i += 1
        obj(subj, p)
        ws()
      }
    }

    private def obj(subj: String, p: String): Unit = {
      ws()
      peekCh match {
        case '<' => out += Row(subj, p, iriRef(), o_is_iri = true, "", "")
        case '[' =>
          out += Row(subj, p, { val b = bnodePropertyList(); b },
            o_is_iri = false, "", "")
        case '_' => out += Row(subj, p, blankLabel(), o_is_iri = false, "", "")
        case '(' =>
          val head = collection()
          out += Row(subj, p, head, o_is_iri = !head.startsWith("_:"), "", "")
        case '"' | '\'' => out += literal(subj, p)
        case c if c.isDigit || c == '-' || c == '+' ||
          // leading-dot decimals (".5") are legal Turtle
          (c == '.' && i + 1 < doc.length && doc.charAt(i + 1).isDigit) =>
          out += numericRow(subj, p)
        case _ =>
          if (matchWord("true")) out += Row(subj, p, "true", o_is_iri = false,
            "", s"${Terms.XsdString.dropRight(6)}boolean")
          else if (matchWord("false")) out += Row(subj, p, "false",
            o_is_iri = false, "", s"${Terms.XsdString.dropRight(6)}boolean")
          else out += Row(subj, p, prefixedName(), o_is_iri = true, "", "")
      }
    }

    private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    /** `( e1 e2 … )` — an RDF collection, desugared to the
      * rdf:first/rdf:rest chain of fresh document-scoped blank nodes
      * (Turtle 1.1 §2.8); returns the head cell, or rdf:nil for `()`.
      * Elements recurse through [[obj]], so nested collections, blank
      * node property lists and every literal form are legal members. */
    private def collection(): String = {
      expect('(')
      var head: String = null
      var tail: String = null
      ws()
      while (i < doc.length && doc.charAt(i) != ')') {
        val cell = freshBnode()
        if (head == null) head = cell
        else out += Row(tail, RdfNs + "rest", cell, o_is_iri = false, "", "")
        obj(cell, RdfNs + "first")
        tail = cell
        ws()
      }
      expect(')')
      if (head == null) RdfNs + "nil"
      else {
        out += Row(tail, RdfNs + "rest", RdfNs + "nil",
          o_is_iri = true, "", "")
        head
      }
    }

    /** `[ po-list ]` — a fresh blank node carrying its own properties. */
    private def bnodePropertyList(): String = {
      expect('[')
      val node = freshBnode()
      ws()
      if (doc.charAt(i) != ']') predicateObjectList(node)
      expect(']')
      node
    }

    private val xsd = "http://www.w3.org/2001/XMLSchema#"

    private def numericRow(subj: String, p: String): Row = {
      val start = i
      if (doc.charAt(i) == '-' || doc.charAt(i) == '+') i += 1
      var dots = 0; var exp = false
      while (i < doc.length && (doc.charAt(i).isDigit ||
        (doc.charAt(i) == '.' && i + 1 < doc.length &&
          doc.charAt(i + 1).isDigit && { dots += 1; true }) ||
        ((doc.charAt(i) == 'e' || doc.charAt(i) == 'E') && { exp = true; true }) ||
        (exp && (doc.charAt(i) == '-' || doc.charAt(i) == '+')))) i += 1
      val lex = doc.substring(start, i)
      // validate the WHOLE lexical form — the permissive scan above would
      // otherwise silently accept "1.2.3" or "1e5-2" as a plausible number
      val dt =
        if (lex.matches("[+-]?[0-9]+")) s"${xsd}integer"
        else if (lex.matches("[+-]?[0-9]*\\.[0-9]+")) s"${xsd}decimal"
        else if (lex.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)[eE][+-]?[0-9]+"))
          s"${xsd}double"
        else fail(s"malformed numeric literal '$lex'")
      Row(subj, p, lex, o_is_iri = false, "", dt)
    }

    private def literal(subj: String, p: String): Row = {
      val lex = stringBody()
      ws()
      if (i < doc.length && doc.charAt(i) == '@') {
        i += 1
        val start = i
        while (i < doc.length && (doc.charAt(i).isLetterOrDigit ||
          doc.charAt(i) == '-')) i += 1
        if (i == start) fail("empty language tag")
        Row(subj, p, lex, o_is_iri = false, doc.substring(start, i), "")
      } else if (doc.regionMatches(i, "^^", 0, 2)) {
        i += 2
        ws()
        val dt = if (peekCh == '<') iriRef() else prefixedName()
        Row(subj, p, lex, o_is_iri = false, "", dt)
      } else Row(subj, p, lex, o_is_iri = false, "", "")
    }

    private def stringBody(): String = {
      val q = peekCh // '"' or '\''
      val long = doc.regionMatches(i, s"$q$q$q", 0, 3)
      if (long) {
        i += 3
        // scan for the first UNESCAPED triple-quote: a naive indexOf would
        // treat the quote of a trailing \" escape as the delimiter's first
        // char and corrupt the content (e.g. """a\"""")
        val start = i
        var end = -1
        var j = i
        while (end < 0 && j <= doc.length - 3) {
          if (doc.charAt(j) == q && doc.charAt(j + 1) == q &&
              doc.charAt(j + 2) == q) {
            // STRING_LITERAL_LONG_QUOTE: content may END in up to two
            // unescaped quotes (e.g. """a"""" is the string a"), so when
            // the quote run extends past 3, the LAST three quotes are the
            // delimiter and the leading ones belong to the content
            var k = j + 3
            while (k < doc.length && doc.charAt(k) == q) k += 1
            end = k - 3
          }
          else if (doc.charAt(j) == '\\') j += 2 // skip the escaped char
          else j += 1
        }
        if (end < 0) fail("unterminated long string")
        val body = doc.substring(start, end)
        i = end + 3
        NtEscapes.unescape(body)
      } else {
        i += 1
        val sb = new java.lang.StringBuilder()
        while (i < doc.length && doc.charAt(i) != q) {
          if (doc.charAt(i) == '\\' && i + 1 < doc.length) {
            sb.append(doc.charAt(i)).append(doc.charAt(i + 1)); i += 2
          } else if (doc.charAt(i) == '\n') fail("newline in short string")
          else { sb.append(doc.charAt(i)); i += 1 }
        }
        if (i >= doc.length) fail("unterminated string")
        i += 1
        NtEscapes.unescape(sb.toString)
      }
    }
  }
}
