package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused token → md5 → SimHash: given a token array, computes the
  * `bits`-bit SimHash signature in one JVM pass — replacing two interpreted
  * higher-order folds (a per-token 48-lane bitsum `aggregate(zip_with(...))`
  * and the final bit-pack fold), which were the heaviest interpreted
  * expressions left in the dedup path.
  *
  * Exact equivalence with the expression pipeline it replaces (and the
  * DuckDB oracle in graft.ext.Dedup): token hash = first 15 md5 hex digits
  * as a 60-bit integer (== big-endian first 8 digest bytes >>> 4); lane j
  * gains +1 if bit j of the hash is set, else −1; signature bit j is set
  * iff lane j's sum is > 0. All integer arithmetic, engine-independent.
  *
  * CodegenFallback is deliberate (same call as ShingleMinHashSig): md5
  * needs JVM MessageDigest and the per-row overhead is trivial next to the
  * fused loop.
  */
case class TokenSimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits > 0 && bits <= 60)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_simhash"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sums = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i).toString
      md.reset()
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = v >>> 4 // first 15 hex digits of md5 as a 60-bit integer
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) res |= 1L << j
      j += 1
    }
    res
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSimHashExpr =
    copy(child = newChild)
}

object TokenSimHash {
  def simhash(toks: Column, bits: Int): Column =
    ColumnBridge.toColumn(TokenSimHashExpr(ColumnBridge.toExpression(toks), bits))
}
