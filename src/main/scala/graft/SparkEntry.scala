package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in module registries (graft.operators.*, graft.ysb,
  * graft.streaming, graft.ext.*) and are aggregated by [[Registry]].
  */
object SparkEntry {
  /** Flagship: the YSB pipeline (filter → project → broadcast join →
    * event-time tumbling windowed count) on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("qysb02_events").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Dir-aware variant used by [[Verify]]: gates that record run values
    * into their oracle (qst27) emit the strong form only for the dir they
    * actually ran against, the weak form otherwise. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    Registry.all.flatMap(q => q.oracleAt(sfDir).map(sql => q.name -> sql)).toMap
}
