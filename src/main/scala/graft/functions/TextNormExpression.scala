package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass ASCII text normalization — the codegen'd equivalent of the
  * corpus-normalization regex chain
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))`
  * used by the dedup keys (qt04's fingerprint, qd17's blocking).
  *
  * Why it exists (SURVEY §7.3: custom expressions only where built-ins
  * can't go fast): Java's backtracking regex engine measured ~15 ms/doc on
  * the Zipf 1000× tier — the ENTIRE cost of qd17 was the two regex passes,
  * ~200 s where DuckDB's RE2 took ~3 s. One byte-wise scan does the same
  * job in O(len) with no allocation beyond the output buffer.
  *
  * Semantics contract (pinned by a spec against the regex chain over real
  * corpus text): ASCII A–Z lowered; a–z/0–9 kept; ASCII whitespace
  * (space/\t/\n/\x0B/\f/\r) runs collapse to one space; everything else —
  * including every byte ≥ 0x80, i.e. all non-ASCII codepoints, which the
  * regex chain also deletes — is dropped; leading/trailing space trimmed.
  * (Known non-ASCII divergences — both directions are spec-pinned in
  * TextNormSpec: (a) codepoints whose Unicode lowercase DECOMPOSES into an
  * ASCII letter + combining mark, e.g. İ → i̇, keep the ASCII letter under
  * the regex chain but are dropped here; (b) codepoints whose SIMPLE
  * lowercase mapping is itself an ASCII letter, e.g. U+212A KELVIN SIGN
  * → 'k', likewise survive `lower()` into [a-z] under the regex chain but
  * are dropped here. The corpus contract is ASCII; the oracle regex and
  * this expression agree there. A multilingual corpus should use the
  * Unicode face, [[graft.ext.TextAnalysis.unicodeNormalize]] — gated as
  * qt18_unicode_normalize, which preserves \p{L}\p{N} while case-folding.)
  */
case class AsciiNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiNormalize =
    copy(child = newChild)
}

object TextNorm {

  /** See [[AsciiNormalize]] for the contract. Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      var c = bytes(i) & 0xFF
      if (c >= 'A' && c <= 'Z') c += 32
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c.toByte; o += 1
      } else if (c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
                 c == '\f' || c == '\r') {
        pendingSpace = true
      }
      // else dropped: punctuation/control, and every byte >= 0x80 (UTF-8
      // lead AND continuation bytes — whole non-ASCII codepoints vanish,
      // matching the regex chain's per-codepoint delete)
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Column form. */
  def asciiNormalize(c: Column): Column =
    ColumnBridge.toColumn(AsciiNormalize(ColumnBridge.toExpression(c)))
}
