package graft.rdf

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.{Element, Node}

import scala.jdk.CollectionConverters._

/** RDF/XML reader/writer for the striped-syntax subset every mainstream
  * exporter emits — the last of the big-three drop formats next to
  * Turtle ([[Turtle]]) and JSON-LD ([[JsonLd]]):
  *
  *  - `rdf:RDF` root; node elements `rdf:Description` or TYPED
  *    (`<ex:Person ...>` ⇒ an rdf:type triple), identified by
  *    `rdf:about` (IRI) or `rdf:nodeID` (blank node; absent ⇒ fresh
  *    blank node);
  *  - property elements with `rdf:resource` / `rdf:nodeID` objects, text
  *    literals with `rdf:datatype` or `xml:lang` (inherited from the
  *    node element per XML scoping), NESTED node elements (recursed,
  *    linked by their subject), and property ATTRIBUTES
  *    (`<rdf:Description rdf:about="x" ex:name="Alice"/>`).
  *
  * Out of subset, rejected loudly: `rdf:parseType` (Literal/Collection/
  * Resource), `rdf:ID`/`xml:base` relative resolution, reification, and
  * container elements (`rdf:Seq/Bag/Alt`) — each names its construct in
  * the error. DTDs and external entities are disabled outright (XXE).
  *
  * Predicates and types are full `namespaceURI + localName` IRIs — the
  * one representational difference from the engine's bare-word EAV
  * convention, inherent to RDF/XML (element names MUST be namespaced
  * QNames). [[write]] therefore exports bare predicates under the
  * `graft:` namespace and the round-trip query strips it back off.
  *
  * Distribution model: like Turtle and JSON-LD, one document is one XML
  * value — the reader parallelizes per FILE (`wholetext` → flatMap DOM
  * parse), the writer emits one `<rdf:RDF>` document per partition.
  * Output layout matches [[Turtle.readTyped]].
  */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  /** (s, p, o) plain-lexical triples. */
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

  private def docTag(file: String, doc: String): String =
    graft.sources.AtomicStore.key(file, doc.length.toString).take(8)

  /** Parse one RDF/XML document (driver- or executor-side Scala). */
  def parseDoc(doc: String, bnodeTag: String = "d"): Seq[Turtle.Row] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // XXE hardening: no DTDs, no external entities, ever
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    val dom = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(doc.getBytes("UTF-8")))
    val root = dom.getDocumentElement
    require(root.getNamespaceURI == RdfNs && root.getLocalName == "RDF",
      s"RDF/XML: root must be rdf:RDF, got <${root.getTagName}>")

    val out = scala.collection.mutable.ArrayBuffer.empty[Turtle.Row]
    var bn = 0
    def freshBnode(): String = { bn += 1; s"_:b${bnodeTag}_$bn" }
    def childElems(e: Element): Seq[Element] = {
      val ns = e.getChildNodes
      (0 until ns.getLength).map(ns.item).collect {
        case el: Element => el
      }
    }
    def textOf(e: Element): String = {
      val ns = e.getChildNodes
      (0 until ns.getLength).map(ns.item).map {
        case t if t.getNodeType == Node.TEXT_NODE ||
          t.getNodeType == Node.CDATA_SECTION_NODE => t.getNodeValue
        case _ => ""
      }.mkString
    }
    def rdfAttr(e: Element, local: String): Option[String] =
      Option(e.getAttributeNodeNS(RdfNs, local)).map(_.getValue)
    def langOf(e: Element, inherited: String): String =
      Option(e.getAttributeNodeNS(XmlNs, "lang")).map(_.getValue)
        .getOrElse(inherited)

    def nodeElement(e: Element, inheritedLang: String): String = {
      rdfAttr(e, "ID").foreach(_ => throw new IllegalArgumentException(
        "RDF/XML: rdf:ID needs xml:base resolution — outside this subset; " +
          "use rdf:about"))
      val s = rdfAttr(e, "about")
        .orElse(rdfAttr(e, "nodeID").map("_:" + _))
        .getOrElse(freshBnode())
      val lang = langOf(e, inheritedLang)
      // typed node element: the element name IS an rdf:type IRI
      if (!(e.getNamespaceURI == RdfNs && e.getLocalName == "Description")) {
        Seq("Seq", "Bag", "Alt", "Statement").foreach(c =>
          require(!(e.getNamespaceURI == RdfNs && e.getLocalName == c),
            s"RDF/XML: rdf:$c containers/reification are outside this subset"))
        out += Turtle.Row(s, RdfNs + "type",
          e.getNamespaceURI + e.getLocalName,
          o_is_iri = true, o_lang = "", o_datatype = "")
      }
      // property ATTRIBUTES: any non-rdf, non-xmlns, non-xml attribute is
      // a literal triple
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item).foreach { a =>
        val ns = Option(a.getNamespaceURI).getOrElse("")
        if (ns != RdfNs && ns != XmlNs &&
          ns != "http://www.w3.org/2000/xmlns/" && a.getLocalName != "xmlns")
          out += Turtle.Row(s, ns + a.getLocalName, a.getNodeValue,
            o_is_iri = false, o_lang = lang, o_datatype = "")
      }
      childElems(e).foreach(propertyElement(s, _, lang))
      s
    }

    def propertyElement(s: String, e: Element, inheritedLang: String): Unit = {
      require(e.getNamespaceURI != null,
        s"RDF/XML: property element <${e.getTagName}> has no namespace — " +
          "predicates must be namespaced QNames")
      val p = e.getNamespaceURI + e.getLocalName
      rdfAttr(e, "parseType").foreach(pt => throw new IllegalArgumentException(
        s"RDF/XML: rdf:parseType=\"$pt\" is outside this subset"))
      val lang = langOf(e, inheritedLang)
      (rdfAttr(e, "resource"), rdfAttr(e, "nodeID"), childElems(e)) match {
        case (Some(iri), _, _) =>
          out += Turtle.Row(s, p, iri, o_is_iri = true,
            o_lang = "", o_datatype = "")
        case (_, Some(id), _) =>
          out += Turtle.Row(s, p, "_:" + id, o_is_iri = false,
            o_lang = "", o_datatype = "")
        case (_, _, kids) if kids.nonEmpty =>
          require(kids.size == 1,
            s"RDF/XML: property <${e.getTagName}> has ${kids.size} child " +
              "node elements — one object per property element")
          val child = nodeElement(kids.head, lang)
          out += Turtle.Row(s, p, child,
            o_is_iri = !child.startsWith("_:"), o_lang = "", o_datatype = "")
        case _ =>
          val dt = rdfAttr(e, "datatype").getOrElse("")
          out += Turtle.Row(s, p, textOf(e), o_is_iri = false,
            o_lang = if (dt.isEmpty) lang else "", o_datatype = dt)
      }
    }

    childElems(root).foreach(nodeElement(_, ""))
    out.toSeq
  }

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /** RDF/XML sink: one `<rdf:RDF>` document per partition, one
    * `rdf:Description` per subject. Bare (non-IRI) predicates are
    * exported under `xmlns:g="graft:"` — RDF/XML cannot express an
    * un-namespaced property element — so a plain-EAV round-trip reads
    * back with the `graft:` prefix on predicates (strip it to recover
    * the input; `q_rdfxml_scan` oracles exactly that loop). Predicates
    * that are already full IRIs are split at the last `#`/`/` into
    * namespace + local name. */
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
          val sb = new StringBuilder
          val nss = scala.collection.mutable.LinkedHashMap.empty[String, String]
          def prefixFor(ns: String): String =
            nss.getOrElseUpdate(ns, s"n${nss.size}")
          val body = new StringBuilder
          it.foreach { case (s, props) =>
            body ++= s"""  <rdf:Description rdf:about="${esc(s)}">\n"""
            props.foreach { case (p, o, isIri, lang, dt) =>
              val cut = math.max(p.lastIndexOf('#'), p.lastIndexOf('/')) + 1
              val (ns, local) =
                if (cut > 0 && cut < p.length) (p.substring(0, cut), p.substring(cut))
                else ("graft:", p)
              val q = s"${prefixFor(ns)}:$local"
              body ++= (
                if (isIri) s"""    <$q rdf:resource="${esc(o)}"/>\n"""
                else {
                  val a =
                    if (lang.nonEmpty) s""" xml:lang="${esc(lang)}""""
                    else if (dt.nonEmpty) s""" rdf:datatype="${esc(dt)}""""
                    else ""
                  s"    <$q$a>${esc(o)}</$q>\n"
                })
            }
            body ++= "  </rdf:Description>\n"
          }
          sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
          sb ++= """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#""""
          nss.foreach { case (ns, pre) => sb ++= s"""\n    xmlns:$pre="${esc(ns)}"""" }
          sb ++= ">\n" ++= body ++= "</rdf:RDF>"
          Iterator.single(sb.toString)
        }
      }
      .write.mode(SaveMode.Overwrite).text(path)
  }
}
