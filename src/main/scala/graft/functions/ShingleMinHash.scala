package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused shingle → md5 → MinHash signature: given a token array, computes
  * the full k-permutation MinHash signature of its 3-word shingles in one
  * pass, without materializing shingle strings/hash arrays as Catalyst
  * values. Replaces three interpreted higher-order transforms
  * (shingling, md5 hashing, per-permutation mins) with one tight JVM loop.
  *
  * Exact equivalence with the expression pipeline it replaces (and the
  * DuckDB oracle): shingle text = `concat_ws(' ', 3 tokens)`; base hash =
  * first 15 md5 hex digits as a 60-bit integer (== big-endian first 8
  * digest bytes >>> 4) mod p; sig_i = min over shingles of (a_i·h+b_i) mod p.
  * Shingle dedup is skipped — duplicates cannot change a min.
  *
  * CodegenFallback is deliberate: the per-row call overhead is trivial next
  * to the fused loop, and md5 needs JVM MessageDigest anyway.
  */
case class ShingleMinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with CodegenFallback {

  require(as.size == bs.size && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_minhash_sig"

  private val k = as.size

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    if (n >= 3) {
      val md = MessageDigest.getInstance("MD5")
      val words = Array.tabulate(n)(i => toks.getUTF8String(i).toString)
      var i = 0
      while (i <= n - 3) {
        val s = words(i) + " " + words(i + 1) + " " + words(i + 2)
        md.reset()
        val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        val h = (v >>> 4) % p // first 15 hex digits of md5, mod p
        var j = 0
        while (j < k) {
          val x = (as(j) * h + bs(j)) % p
          if (x < mins(j)) mins(j) = x
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHashSig =
    copy(child = newChild)
}

object ShingleMinHash {
  def shingleMinhashSig(toks: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.toColumn(ShingleMinHashSig(ColumnBridge.toExpression(toks), as, bs, p))
}
