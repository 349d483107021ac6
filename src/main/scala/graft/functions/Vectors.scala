package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * higher-order functions (codegen-friendly, no UDFs — SURVEY §7.3).
  *
  * Determinism contract: dot products fold left-to-right in index order in
  * double precision, so any engine mirroring the expression (e.g. the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))`) produces bit-identical
  * IEEE doubles — enabling exact hash comparison on similarity outputs.
  */
object Vectors {

  /** Sequential double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed as dot/(norm·norm) — one deterministic
    * division of deterministic operands. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd variants via the native [[FloatDot]] expression — identical
    * IEEE results to [[dot]]/[[cosine]] (same index-order double fold), for
    * `array<float>` inputs on the hot path. */
  def fastDot(a: Column, b: Column): Column = FloatVectorExpressions.floatDot(a, b)
  def fastNorm(a: Column): Column = sqrt(fastDot(a, a))
  def fastCosine(a: Column, b: Column): Column =
    fastDot(a, b) / (fastNorm(a) * fastNorm(b))

  /** Codegen'd cosine of an `array<float>` embedding against an
    * `array<double>` vector (refined centroid means) — the k-means
    * reassignment hot loop. Identical IEEE results to [[cosine]] on the
    * same operands. */
  def fastCosineFD(e: Column, m: Column): Column =
    FloatVectorExpressions.floatDoubleDot(e, m) /
      (fastNorm(e) * sqrt(FloatVectorExpressions.doubleDot(m, m)))

  /** Codegen'd dot of an `array<float>` column against an `array<double>`
    * constant (hyperplane literals) — same index-order double fold. */
  def fastDotFD(e: Column, m: Column): Column =
    FloatVectorExpressions.floatDoubleDot(e, m)

  /** The DuckDB mirror of [[dot]] for oracle SQL construction. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
}
