package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RDF term introspection over TERM-STRING columns — the N-Triples
  * surface syntax used as a self-describing in-cell encoding:
  *
  *   - IRIs render as `<iri>`
  *   - blank nodes as `_:label`
  *   - literals as `"lexical"`, `"lexical"@tag` or `"lexical"^^<datatype>`
  *
  * The engine's default stores hold PLAIN LEXICAL terms (the matching
  * representation [[Triples.build]] produces); these functions degrade
  * gracefully there: a bare value (no leading `<`, `"` or `_:`) is
  * treated as a plain literal — `LANG` = `""`, `DATATYPE` = xsd:string —
  * which is exactly SPARQL's verdict on an untagged literal. Exact
  * node-kind introspection (isIRI vs isLiteral) needs the term-string
  * encoding; [[strlang]]/[[strdt]]/[[iri]] construct it and are the
  * SPARQL STRLANG/STRDT/IRI built-ins.
  *
  * Everything here is `org.apache.spark.sql.functions` composition
  * (whole-stage-codegen'd); no UDFs. Payloads are stored raw (the
  * convention does not ECHAR-escape inner quotes — [[NtEscapes]] handles
  * serialization boundaries).
  */
object Terms {

  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val RdfLangString =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  private val langRe = "@([A-Za-z][A-Za-z0-9-]*)$"
  private val dtRe = "\\^\\^<([^>]*)>$"

  def isIri(c: Column): Column = c.startsWith("<")
  def isBlank(c: Column): Column = c.startsWith("_:")
  /** Quoted term-string literal OR bare plain-lexical value. */
  def isLiteral(c: Column): Column = !isIri(c) && !isBlank(c)

  /** The lexical form: IRI body for `<iri>`, unannotated payload for
    * quoted literals, the value itself for plain-lexical cells — the
    * SPARQL `STR` built-in.
    *
    * The quoted-literal branch slices between the opening and LAST quote
    * with position arithmetic instead of a regex: Catalyst's
    * CollapseProject happily duplicates an un-aliased subexpression into
    * every consumer, so in a query binding several accessors of one term
    * this runs once per accessor per row — substring ops make that cheap
    * where the former greedy-backtracking regex dominated the whole
    * query's runtime. Semantics are identical, including the degenerate
    * no-closing-quote case (→ `""`, as the old regex's no-match did). */
  def lexical(c: Column): Column = {
    // 1-based position of the last '"'; 1 (the opening quote itself) or
    // 0 when no closing quote exists
    val lastQ = length(c) - instr(reverse(c), "\"") + 1
    when(c.startsWith("<") && c.endsWith(">"), c.substr(lit(2), length(c) - 2))
      .when(c.startsWith("\""),
        when(lastQ >= 2, c.substr(lit(2), lastQ - 2)).otherwise(lit("")))
      .otherwise(c)
  }

  /** SPARQL `LANG`: the language tag of a tagged literal, `""` for an
    * untagged one, error (null → row elimination) for IRIs and blanks.
    * Only QUOTED term strings can carry a tag (the same guard
    * [[datatype]]'s langString branch applies): a bare plain-lexical cell
    * whose payload happens to end in `@word` — an email, a handle — is a
    * plain literal with `LANG = ""`, not a tagged one. */
  def lang(c: Column): Column =
    when(isIri(c) || isBlank(c), lit(null).cast("string"))
      .when(c.startsWith("\""), regexp_extract(c, langRe, 1))
      .otherwise(lit(""))

  /** SPARQL `DATATYPE`: the datatype IRI — rdf:langString for tagged
    * literals, xsd:string for plain ones, error for IRIs and blanks. */
  def datatype(c: Column): Column =
    when(isIri(c) || isBlank(c), lit(null).cast("string"))
      // quoted-only, like [[lang]]: a bare payload ending in ^^<x> is a
      // plain literal, not a typed term string
      .when(c.startsWith("\"") && c.rlike(dtRe), regexp_extract(c, dtRe, 1))
      .when(c.startsWith("\"") && c.rlike(langRe), lit(RdfLangString))
      .otherwise(lit(XsdString))

  /** SPARQL `isNumeric`: a literal with a numeric XSD datatype whose
    * lexical form is a valid number. Plain literals are xsd:string →
    * false, per spec. */
  def isNumeric(c: Column): Column = {
    val dt = datatype(c)
    val numericDt = Seq("integer", "int", "long", "short", "byte", "decimal",
      "double", "float", "nonNegativeInteger", "negativeInteger",
      "positiveInteger", "nonPositiveInteger", "unsignedLong", "unsignedInt",
      "unsignedShort", "unsignedByte")
      .map(n => dt === s"http://www.w3.org/2001/XMLSchema#$n")
      .reduce(_ || _)
    coalesce(numericDt && lexical(c).try_cast("double").isNotNull,
      lit(false))
  }

  // sort keys evaluate per ROW of the sorted relation, so cost
  // discipline matters: kind is prefix checks only; the numeric-typed
  // regex hides behind a CaseWhen (codegen short-circuits per row), so
  // a bare plain-lexical cell — the engine's default — never runs it.
  // isNumeric's 16-way datatype comparison would re-run its extraction
  // regex per branch per row (measured 15× on a window-sorted store).
  private val NumericTermRe = "^\"[^\"]*\"\\^\\^<http://www\\.w3\\.org/" +
    "2001/XMLSchema#(integer|int|long|short|byte|decimal|double|float|" +
    "nonNegativeInteger|negativeInteger|positiveInteger|" +
    "nonPositiveInteger|unsignedLong|unsignedInt|unsignedShort|" +
    "unsignedByte)>$"

  /** The numeric VALUE of a quoted numeric-typed term string, null for
    * everything else (bare cells, IRIs, non-numeric literals) — the
    * probe behind both the 15.1 sort key and 17.4.1.1 value equality.
    * Guarded so the regex never runs on a bare plain-lexical cell. */
  private[rdf] def numericValue(c: Column): Column =
    when(c.startsWith("\"") && c.endsWith(">"),
      when(c.rlike(NumericTermRe), lexical(c).try_cast("double")))

  private val IntegerTermRe = "^\"[^\"]*\"\\^\\^<http://www\\.w3\\.org/" +
    "2001/XMLSchema#(integer|int|long|short|byte|" +
    "nonNegativeInteger|negativeInteger|positiveInteger|" +
    "nonPositiveInteger|unsignedLong|unsignedInt|unsignedShort|" +
    "unsignedByte)>$"

  /** Exact integer VALUE of an integer-family typed term, null for
    * everything else — decimal(38,0) so two distinct integers beyond
    * double's 2^53 exact range (e.g. 9007199254740993 vs …992) still
    * compare UNEQUAL under 17.4.1.1 value equality, where the double
    * probe collapses them. Used only by '='/'!=' dispatch; orderings
    * keep the double probe (an ORDER BY tie between such twins falls
    * through to the full-term column, which already breaks it). Same
    * prefix guard: plain-lexical stores never run the regex. */
  private[rdf] def integerValue(c: Column): Column =
    when(c.startsWith("\"") && c.endsWith(">"),
      when(c.rlike(IntegerTermRe), lexical(c).try_cast("decimal(38,0)")))

  private def orderNumCol(c: Column): Column = numericValue(c)

  /** The SPARQL 15.1 ORDER BY total order for a term column, as FLAT
    * sort orders: unbound < blank nodes < IRIs < literals (normative),
    * NUMERIC literal values comparing by VALUE (the `<` operator
    * extended), the spec's implementation-defined freedom resolved
    * deterministically (numerics before non-numerics, then lexical form,
    * then full term string — so lang/datatype variants of one lexical
    * form still order totally and stably).
    *
    * Key shape: THREE sort columns — `(kindChar ++ lexical, numericValue,
    * fullTerm)` — not four. Fusing the kind bucket (one fixed-width char:
    * '0' blank < '1' IRI < '2' numeric < '3' other literal) into the
    * lexical string is what restores the sorter's 8-byte prefix
    * comparison: with a leading int column every comparison fell through
    * to full multi-column row compares, which tripled-to-9×'d real sorted
    * queries at sf0.1 (round-9 regression). Numeric literals collapse the
    * fused column to the constant "2" so their value column decides first;
    * their old lexical-form tie level is dropped because for equal values
    * it provably agrees with the full-term compare (full = '"'++lexical++
    * '"…', and at a prefix divergence the '"' byte 0x22 is below every
    * numeric-lexical byte: digits, '.', '+', '-', 'e'). Bare-term stores
    * degrade to ("3"++c, 0.0, c) — prefix-resolved like the raw-string
    * sort they had. Unbound rows null every field so the null block sorts
    * as one unit; nulls_first/last per direction give the spec's ASC
    * placement and DESC = reversed sequence. */
  def orderKeyCols(c: Column, asc: Boolean): Seq[Column] = {
    val num = orderNumCol(c)
    val kindChar = when(isBlank(c), "0").when(isIri(c), "1").otherwise("3")
    val fused =
      when(num.isNotNull, lit("2")).otherwise(concat(kindChar, lexical(c)))
    // every field must null out for an unbound row (fused/c would not),
    // so the null block sorts as one unit under either direction
    val fields = Seq(fused, coalesce(num, lit(0.0)), c)
      .map(f => when(c.isNull, lit(null)).otherwise(f))
    fields.map(f => if (asc) f.asc_nulls_first else f.desc_nulls_last)
  }

  /** SPARQL `LANGMATCHES(tag, range)`: RFC 4647 basic filtering — `"*"`
    * matches any non-empty tag; otherwise case-insensitive equality or a
    * subtag-boundary prefix (`"en"` matches `en`, `en-US`). */
  def langMatches(tag: Column, range: Column): Column =
    when(range === "*", tag =!= "")
      .otherwise(lower(tag) === lower(range) ||
        lower(tag).startsWith(concat(lower(range), lit("-"))))

  /** SPARQL `STRLANG(lexical, tag)` → a tagged term-string literal. */
  def strlang(lex: Column, tag: Column): Column =
    concat(lit("\""), lex, lit("\"@"), tag)

  /** SPARQL `STRDT(lexical, datatypeIri)` → a typed term-string literal. */
  def strdt(lex: Column, dt: Column): Column =
    concat(lit("\""), lex, lit("\"^^<"), dt, lit(">"))

  /** SPARQL `IRI(x)` → a term-string IRI (absolute IRIs only — there is
    * no base resolution in this fragment). */
  def iri(c: Column): Column = concat(lit("<"), lexical(c), lit(">"))

  /** SPARQL `BNODE(x)`: a blank node whose label is a deterministic
    * digest of the argument — same argument, same node, across any
    * partitioning (the reproducible choice the spec's freshness rule
    * permits within a solution). */
  def bnode(c: Column): Column = concat(lit("_:b"), md5(lexical(c)))

  // ------------------------- date/time accessors -------------------------

  /** xsd:dateTime lexical form (XSD 1.1 §3.3.7): date, 'T', time with
    * mandatory seconds and optional fraction, optional Z/±HH:MM zone.
    * Accessors parse the LEXICAL form directly — no timestamp casting, so
    * the session timezone can never shift a field, and the same regex
    * evaluates identically in the DuckDB oracle. */
  private val dateTimeRe =
    "^(-?\\d{4,})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):" +
      "(\\d{2}(?:\\.\\d+)?)(Z|[+-]\\d{2}:\\d{2})?$"

  /** Mandatory field `group` of a dateTime literal's lexical form, as the
    * raw match: `""` when the form is not a valid xsd:dateTime (the
    * numeric accessors' cast turns that into the SPARQL error null).
    *
    * Performance shape, learned the hard way:
    *  - NO validity `when` around the extract: whole-stage codegen's
    *    common-subexpression elimination skips anything inside CaseWhen
    *    branches, so a guard forces every accessor to re-derive the
    *    lexical form — unguarded, the shared `lexical(c)` subtree is
    *    CSE'd once per row across all accessors in a projection.
    *  - NO positional-substr "optimization" of the fields: every substr
    *    argument re-embeds the lexical subtree and the nesting multiplies
    *    it combinatorially (profiled 4× slower at depth 2, 20× at the tz
    *    field); the anchored regex touches the string once with a cached
    *    compiled pattern. */
  private def dtField(c: Column, group: Int): Column = {
    val f = regexp_extract(lexical(c), dateTimeRe, group)
    // no-match "" → null HERE (not via cast: ANSI mode throws on '');
    // matched groups are always clean digit strings, so the cast is safe
    when(f === "", lit(null).cast("string")).otherwise(f)
  }

  /** SPARQL `YEAR`..`SECONDS` (17.4.5): numeric fields of an xsd:dateTime
    * literal. Doubles, per the module's numeric-built-in convention;
    * SECONDS keeps the fraction (xsd:decimal semantics). */
  def year(c: Column): Column = dtField(c, 1).cast("double")
  def month(c: Column): Column = dtField(c, 2).cast("double")
  def day(c: Column): Column = dtField(c, 3).cast("double")
  def hours(c: Column): Column = dtField(c, 4).cast("double")
  def minutes(c: Column): Column = dtField(c, 5).cast("double")
  def seconds(c: Column): Column = dtField(c, 6).cast("double")

  /** SPARQL `TZ`: the timezone designator as a string — `"Z"`, `"+05:00"`,
    * or `""` when the literal carries no zone; null (error) for a
    * non-dateTime. The one accessor that must keep the validity guard:
    * `""` is a VALID result here (zone absent), so a failed match can't
    * double as the error signal the way it does for the numeric fields. */
  def tz(c: Column): Column = {
    val lex = lexical(c)
    when(lex.rlike(dateTimeRe), regexp_extract(lex, dateTimeRe, 7))
      .otherwise(lit(null).cast("string"))
  }

  /** SPARQL `TIMEZONE` (17.4.5.8): the timezone as an
    * xsd:dayTimeDuration lexical form — `Z`/`±00:00` → `PT0S`,
    * `-05:00` → `-PT5H`, `+05:30` → `PT5H30M`; null (error) when the
    * literal carries no zone or is not a dateTime — unlike [[tz]],
    * zone-absent is an ERROR here, so the empty-match case maps to
    * null, not `""`. */
  def timezone(c: Column): Column = {
    val z = tz(c)
    val h = substring(z, 2, 2).cast("int")
    val m = substring(z, 5, 2).cast("int")
    val sign = when(z.startsWith("-"), lit("-")).otherwise(lit(""))
    val body = concat(
      when(h > 0, concat(h.cast("string"), lit("H"))).otherwise(lit("")),
      when(m > 0, concat(m.cast("string"), lit("M"))).otherwise(lit("")))
    when(z === "Z", lit("PT0S"))
      .when(z.rlike("^[+-]\\d{2}:\\d{2}$"),
        when(h === 0 && m === 0, lit("PT0S"))
          .otherwise(concat(sign, lit("PT"), body)))
      .otherwise(lit(null).cast("string"))
  }

  /** SPARQL `ENCODE_FOR_URI` (17.4.3.10): percent-encode everything
    * outside RFC 3986's unreserved set (ALPHA / DIGIT / `-._~`), UTF-8
    * bytes in uppercase hex. Built on `url_encode` (form encoding), then
    * aligned: space is `%20` not `+`, `*` IS encoded, `~` is NOT. */
  def encodeForUri(c: Column): Column = {
    val form = url_encode(lexical(c))
    regexp_replace(
      regexp_replace(
        regexp_replace(form, "\\+", "%20"),
        "\\*", "%2A"),
      "%7E", "~")
  }
}
