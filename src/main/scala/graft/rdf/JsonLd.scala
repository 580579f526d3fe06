package graft.rdf

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** JSON-LD reader/writer for the FLAT document subset — the shape the
  * `flatten` API operation and most exporters produce, and the most
  * common drop format after Turtle/N-Triples:
  *
  *  - a document is a node object, an array of node objects, or
  *    `{"@context": ..., "@graph": [node objects]}`; node objects
  *    carrying `@graph` name a graph (JSON-LD 1.1 named graphs — see
  *    [[parseQuadsDoc]]/[[readQuads]], the [[Trig]]-equivalent quads
  *    surface);
  *  - `@context` maps prefixes to IRIs and terms to full IRIs (string
  *    definitions only — no reverse/container/scoped contexts);
  *    `"@vocab"` expands bare keys;
  *  - a node object carries `@id` (absent ⇒ fresh blank node), `@type`
  *    (string or array ⇒ rdf:type triples), and property keys whose
  *    values are strings/numbers/booleans (literals), `{"@id": iri}`
  *    references, `{"@value": v, "@language"|"@type": t}` value objects,
  *    arrays of any of these, or embedded node objects (emitted
  *    recursively, linked by their `@id`/blank node).
  *
  * One deliberate relaxation, documented: keys and `@id`s that expand to
  * neither a context term, a known prefix, nor an absolute IRI are kept
  * verbatim instead of being dropped (strict JSON-LD discards non-IRI
  * keys). This engine's plain-lexical EAV convention uses bare words as
  * predicates, and silently dropping data is the one thing an ingest
  * reader must never do.
  *
  * Distribution model: like Turtle, a JSON-LD document is STATEFUL (one
  * JSON value, context scoping) and cannot be split inside a file. The
  * reader parallelizes per FILE (`wholetext` scan → flatMap parse) — a
  * 100 TB drop arrives as many documents and each task parses one; the
  * load path is read once → persist columnar. The writer emits one
  * `[node object, ...]` document per partition, so export scales with the
  * partition count and every part file is itself a valid JSON-LD
  * document.
  *
  * Output matches [[Turtle.readTyped]]'s layout —
  * `(s, p, o, o_is_iri, o_lang, o_datatype)` — so the two front-ends are
  * interchangeable upstream of the dictionary/BGP layer.
  */
object JsonLd {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  private val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"

  /** (s, p, o) plain-lexical triples — the layout the dictionary/BGP
    * layer consumes. Named-graph documents read as the UNION of their
    * graphs (an ingest reader never drops data); use [[readQuads]] to
    * keep the graph axis. */
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

  /** (s, p, o, g) plain-lexical quads — the named-graph surface matching
    * [[Trig.read]]: node objects carrying `@graph` put their contained
    * nodes in the graph their `@id` names. */
  def readQuads(spark: SparkSession, path: String): DataFrame =
    readQuadsTyped(spark, path).select("s", "p", "o", "g")

  /** Full-fidelity quads read: (s, p, o, o_is_iri, o_lang, o_datatype, g)
    * — [[Trig.readTyped]]'s layout, so the two quad front-ends are
    * interchangeable upstream of the dataset layer. */
  def readQuadsTyped(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, doc) => parseQuadsDoc(doc, docTag(file, doc)) }
      .toDF()
  }

  private def docTag(file: String, doc: String): String =
    graft.sources.AtomicStore.key(file, doc.length.toString).take(8)

  /** Parse one JSON-LD document to TRIPLES — [[parseQuadsDoc]] with the
    * graph axis dropped (union of graphs, see [[read]]). */
  def parseDoc(doc: String, bnodeTag: String = "d"): Seq[Turtle.Row] =
    parseQuadsDoc(doc, bnodeTag).map(q =>
      Turtle.Row(q.s, q.p, q.o, q.o_is_iri, q.o_lang, q.o_datatype))

  /** Parse one JSON-LD document to QUADS (driver- or executor-side).
    * Graph model (JSON-LD 1.1 §"named graphs"):
    *  - a top-level `{"@context":…, "@graph":[…]}` WITHOUT `@id` is the
    *    default-graph container;
    *  - a node object WITH `@graph` names a graph: its contained nodes'
    *    triples land in the graph its `@id` names (fresh blank node when
    *    absent), while the node's OTHER properties stay triples about
    *    that name in the ENCLOSING graph;
    *  - everything else lands in the enclosing graph (default at root).
    */
  def parseQuadsDoc(doc: String, bnodeTag: String = "d"): Seq[Trig.QRow] = {
    val root = new ObjectMapper().readTree(doc)
    require(root != null, "JSON-LD: empty document")

    // ---- context: prefix/term map + @vocab --------------------------
    val ctx = Option(root.get("@context")).map { c =>
      require(c.isObject, "JSON-LD: @context must be an object in this " +
        "subset (no remote contexts — offline engine)")
      c.properties().asScala.map(e => e.getKey -> {
        require(e.getValue.isTextual,
          s"JSON-LD: @context entry '${e.getKey}' must be a string IRI")
        e.getValue.asText
      }).toMap
    }.getOrElse(Map.empty[String, String])
    val vocab = ctx.getOrElse("@vocab", "")

    def isAbsolute(t: String): Boolean = {
      val c = t.indexOf(':')
      c > 0 && t.substring(0, c).forall(ch => ch.isLetterOrDigit ||
        ch == '+' || ch == '-' || ch == '.')
    }
    /** Term → context term, prefix expansion, @vocab, or (relaxation)
      * verbatim. Context terms may themselves be prefixed — one more
      * expansion pass resolves `"name": "ex:name"` definitions. */
    def expand(t: String): String = {
      def once(x: String): String = ctx.get(x) match {
        case Some(iri) if x != iri => iri
        case _ =>
          val c = x.indexOf(':')
          if (c > 0 && ctx.contains(x.substring(0, c)))
            ctx(x.substring(0, c)) + x.substring(c + 1)
          else x
      }
      val e1 = once(t)
      val e2 = if (e1 != t) once(e1) else e1
      if (e2 != t || isAbsolute(e2) || vocab.isEmpty) e2 else vocab + e2
    }

    // ---- node emission ----------------------------------------------
    val out = scala.collection.mutable.ArrayBuffer.empty[Trig.QRow]
    var bn = 0
    def freshBnode(): String = { bn += 1; s"_:b${bnodeTag}_$bn" }

    def graphNodes(v: JsonNode): Seq[JsonNode] =
      if (v.isArray) v.elements().asScala.toSeq
      else Seq(v) // a single node object is a legal @graph value

    def emitNode(n: JsonNode, g: String): String = {
      require(n.isObject, s"JSON-LD: node object expected, got $n")
      val s = Option(n.get("@id")).map { id =>
        require(id.isTextual, s"JSON-LD: @id must be a string, got $id")
        val v = id.asText
        if (v.startsWith("_:")) v else expand(v)
      }.getOrElse(freshBnode())
      n.properties().asScala.foreach { e =>
        e.getKey match {
          case "@id" | "@context" => ()
          case "@graph" =>
            // this node NAMES a graph: contained nodes' triples go there;
            // the node's other properties stay in the enclosing graph
            graphNodes(e.getValue).foreach(emitNode(_, s))
          case "@type" =>
            val ts = if (e.getValue.isArray)
              e.getValue.elements().asScala.toSeq else Seq(e.getValue)
            ts.foreach { t =>
              require(t.isTextual, s"JSON-LD: @type must name IRIs, got $t")
              out += Trig.QRow(s, RdfType, expand(t.asText),
                o_is_iri = true, o_lang = "", o_datatype = "", g = g)
            }
          case k if k.startsWith("@") =>
            throw new IllegalArgumentException(
              s"JSON-LD: keyword '$k' is outside the flat subset")
          case k => emitValue(s, expand(k), e.getValue, g)
        }
      }
      s
    }

    def emitValue(s: String, p: String, v: JsonNode, g: String): Unit =
      v match {
      case a: ArrayNode => a.elements().asScala.foreach(emitValue(s, p, _, g))
      case o: ObjectNode if o.has("@value") =>
        val value = o.get("@value")
        require(value.isValueNode, s"JSON-LD: @value must be scalar, got $value")
        val lang = Option(o.get("@language")).map(_.asText).getOrElse("")
        val dt = Option(o.get("@type")).map(t => expand(t.asText)).getOrElse("")
        require(lang.isEmpty || dt.isEmpty,
          "JSON-LD: @language and @type are mutually exclusive")
        val extra = o.fieldNames().asScala.toSet --
          Set("@value", "@language", "@type")
        require(extra.isEmpty,
          s"JSON-LD: unsupported value-object keys: ${extra.mkString(", ")}")
        out += Trig.QRow(s, p, value.asText(), o_is_iri = false,
          o_lang = lang, o_datatype = dt, g = g)
      case o: ObjectNode if o.size() == 1 && o.has("@id") =>
        val ref = o.get("@id").asText
        val iri = if (ref.startsWith("_:")) ref else expand(ref)
        out += Trig.QRow(s, p, iri, o_is_iri = !iri.startsWith("_:"),
          o_lang = "", o_datatype = "", g = g)
      case o: ObjectNode => // embedded node object: link, then recurse
        val child = emitNode(o, g)
        out += Trig.QRow(s, p, child,
          o_is_iri = !child.startsWith("_:"), o_lang = "", o_datatype = "",
          g = g)
      case _ if v.isTextual =>
        out += Trig.QRow(s, p, v.asText, o_is_iri = false,
          o_lang = "", o_datatype = "", g = g)
      case _ if v.isBoolean =>
        out += Trig.QRow(s, p, v.asText, o_is_iri = false,
          o_lang = "", o_datatype = XsdBoolean, g = g)
      case _ if v.isIntegralNumber =>
        out += Trig.QRow(s, p, v.asText, o_is_iri = false,
          o_lang = "", o_datatype = XsdInteger, g = g)
      case _ if v.isNumber =>
        out += Trig.QRow(s, p, v.asText, o_is_iri = false,
          o_lang = "", o_datatype = XsdDouble, g = g)
      case _ if v.isNull => () // null property values carry no triple
      case _ => throw new IllegalArgumentException(
        s"JSON-LD: unsupported value: $v")
    }

    val nodes: Seq[JsonNode] =
      if (root.isArray) root.elements().asScala.toSeq
      else if (root.has("@graph") && !root.has("@id")) {
        // default-graph CONTAINER (no @id — a root with one is a named
        // graph object and goes through emitNode like any other node)
        graphNodes(root.get("@graph"))
      } else Seq(root)
    nodes.foreach(emitNode(_, Quads.DefaultGraph))
    out.toSeq
  }

  /** JSON-LD sink: one `[node object, ...]` document per partition, each
    * node subject-grouped with its properties, IRIs as `{"@id": ...}`,
    * lang/typed literals as value objects — so [[readTyped]] is the
    * identity on the typed triple set. One aggregation (per-subject), a
    * sink cost paid once at export. */
  def write(typed: DataFrame, path: String): Unit = {
    import typed.sparkSession.implicits._
    typed
      .groupBy(col("s"))
      .agg(sort_array(collect_list(struct(
        col("p"), col("o"), col("o_is_iri"),
        coalesce(col("o_lang"), lit("")).as("o_lang"),
        coalesce(col("o_datatype"), lit("")).as("o_datatype")))).as("props"))
      .as[(String, Seq[(String, String, Boolean, String, String)])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val mapper = new ObjectMapper()
          val arr = mapper.createArrayNode()
          it.foreach { case (s, props) => arr.add(nodeOf(mapper, s, props)) }
          Iterator.single(mapper.writeValueAsString(arr))
        }
      }
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Quads sink matching [[Trig.write]]'s surface: default-graph subjects
    * as top-level node objects, each named graph as ONE
    * `{"@id": g, "@graph": [node objects]}` graph object per partition —
    * every part file is a valid JSON-LD document and [[readQuadsTyped]]
    * is the identity on the typed quad set. Input is
    * (s, p, o, o_is_iri, o_lang, o_datatype, g); one (g, s) aggregation,
    * paid once at export. */
  def writeQuads(typed: DataFrame, path: String): Unit = {
    import typed.sparkSession.implicits._
    typed
      .groupBy(col("g"), col("s"))
      .agg(sort_array(collect_list(struct(
        col("p"), col("o"), col("o_is_iri"),
        coalesce(col("o_lang"), lit("")).as("o_lang"),
        coalesce(col("o_datatype"), lit("")).as("o_datatype")))).as("props"))
      .as[(String, String, Seq[(String, String, Boolean, String, String)])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val mapper = new ObjectMapper()
          val top = mapper.createArrayNode()
          val graphs =
            scala.collection.mutable.LinkedHashMap.empty[String, ArrayNode]
          it.foreach { case (g, s, props) =>
            val node = nodeOf(mapper, s, props)
            if (g == Quads.DefaultGraph) top.add(node): Unit
            else graphs.getOrElseUpdate(g, mapper.createArrayNode())
              .add(node): Unit
          }
          graphs.foreach { case (g, nodes) =>
            val go = mapper.createObjectNode()
            go.put("@id", g): Unit
            go.set[JsonNode]("@graph", nodes): Unit
            top.add(go): Unit
          }
          Iterator.single(mapper.writeValueAsString(top))
        }
      }
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** One subject-grouped node object — IRIs as `{"@id": ...}`, lang/typed
    * literals as value objects (the shape both readers invert). */
  private def nodeOf(mapper: ObjectMapper, s: String,
      props: Seq[(String, String, Boolean, String, String)]): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("@id", s): Unit
    props.foreach { case (p, o, isIri, lang, dt) =>
      val v: JsonNode =
        if (isIri || o.startsWith("_:")) {
          val ref = mapper.createObjectNode(); ref.put("@id", o): Unit; ref
        } else if (lang.nonEmpty) {
          val vo = mapper.createObjectNode()
          vo.put("@value", o): Unit; vo.put("@language", lang): Unit; vo
        } else if (dt.nonEmpty) {
          val vo = mapper.createObjectNode()
          vo.put("@value", o): Unit; vo.put("@type", dt): Unit; vo
        } else mapper.getNodeFactory.textNode(o)
      node.withArray[ArrayNode](p).add(v): Unit
    }
    node
  }
}
