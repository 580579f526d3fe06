package graft.rdf

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-Triples string-escape codec (W3C N-Triples 1.1 grammar, ECHAR +
  * UCHAR productions): `\t \b \n \r \f \" \' \\` plus `\u00XX`-style
  * 4-hex and `\U0010FFFF`-style 8-hex unicode escapes.
  *
  * Exposed as native Catalyst expressions ([[NtUnescape]], [[NtEscape]])
  * whose codegen is a single static call — they stay inside whole-stage
  * codegen (no UDF wrapping/boxing) and the scan→parse pipeline remains one
  * fused stage.
  */
object NtEscapes {

  /** Decode ECHAR/UCHAR escapes. Malformed escapes (`\q`, truncated or
    * non-hex `\u`) throw rather than passing through: a literal that parses
    * but decodes wrong would silently corrupt the dictionary at load time.
    * Callers route such lines to the corrupt channel instead (the line
    * regex only admits well-formed ECHAR/UCHAR sequences).
    */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s // fast path: no escapes at all
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { out.append(c); i += 1 }
      else {
        if (i + 1 >= s.length)
          throw new IllegalArgumentException(s"dangling backslash in N-Triples literal: $s")
        s.charAt(i + 1) match {
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '"' => out.append('"'); i += 2
          case '\'' => out.append('\''); i += 2
          case '\\' => out.append('\\'); i += 2
          case 'u' =>
            out.append(hex(s, i + 2, 4).toChar); i += 6
          case 'U' =>
            out.appendCodePoint(hex(s, i + 2, 8)); i += 10
          case other =>
            throw new IllegalArgumentException(
              s"invalid N-Triples escape '\\$other' in: $s")
        }
      }
    }
    out.toString
  }

  private def hex(s: String, from: Int, len: Int): Int = {
    if (from + len > s.length)
      throw new IllegalArgumentException(s"truncated unicode escape in: $s")
    var v = 0
    var i = from
    while (i < from + len) {
      val d = Character.digit(s.charAt(i), 16)
      if (d < 0)
        throw new IllegalArgumentException(s"non-hex unicode escape in: $s")
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** Encode for emission: the mandatory ECHARs (quote, backslash, newline,
    * carriage return) plus tab for readability. Other unicode is emitted
    * raw — N-Triples 1.1 is UTF-8, so `\ u`-escaping everything non-ASCII
    * is legal but unnecessary (and bloats output ~6×).
    */
  def escape(s: String): String = {
    val out = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => out.append("\\\\")
        case '"' => out.append("\\\"")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case c => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  // UTF8String bridges for codegen (called from generated Java).
  def unescapeU(s: UTF8String): UTF8String = UTF8String.fromString(unescape(s.toString))
  def escapeU(s: UTF8String): UTF8String = UTF8String.fromString(escape(s.toString))
}

/** Codegen'd `\uXXXX`/ECHAR decode — see [[NtEscapes.unescape]]. */
case class NtUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nt_unescape"
  override def nullSafeEval(v: Any): Any =
    NtEscapes.unescapeU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.rdf.NtEscapes.unescapeU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd ECHAR encode — see [[NtEscapes.escape]]. */
case class NtEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nt_escape"
  override def nullSafeEval(v: Any): Any =
    NtEscapes.escapeU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.rdf.NtEscapes.escapeU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
