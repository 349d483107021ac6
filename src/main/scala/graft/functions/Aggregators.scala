package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (SURVEY §2.9: the reference's only custom
  * aggregation is Flink's fold — in Spark the idiomatic equivalent is
  * `Aggregator[IN, BUF, OUT]`, registered via `functions.udaf`).
  *
  * WeightedMean keeps exact integer cents in the buffer (long arithmetic,
  * order-independent) and divides once at finish — deterministic across
  * engines, so the oracle can mirror it as decimal-sum / decimal-sum.
  */
object Aggregators {

  /** (value, weight) → Σ(v·w)/Σ(w), accumulated in exact integer cents. */
  object WeightedMeanCents extends Aggregator[(Double, Double), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) = {
      val centsV = math.round(a._1 * 100)
      val centsW = math.round(a._2 * 100)
      (b._1 + centsV * centsW, b._2 + centsW)
    }
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / 100.0 / b._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
