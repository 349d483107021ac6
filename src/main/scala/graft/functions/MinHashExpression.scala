package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: given an `array<bigint>` of shingle base
  * hashes, computes `sig[i] = min over h of (a(i)·h + b(i)) mod p` for all
  * `numHashes` permutations in ONE pass over the input array — replacing
  * `numHashes` separate interpreted `array_min(transform(...))` higher-order
  * lambdas (32× fewer array traversals, and codegen'd).
  *
  * Identical arithmetic to the HOF formulation and the DuckDB oracle mirror
  * (see graft.ext.Dedup): pure 64-bit integer ops, engine-independent.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  require(as.size == bs.size && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val k = as.size

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $in.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashExpression {
  def minhashSig(hashes: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(hashes), as, bs, p))
}
