package graft

import org.apache.spark.sql.functions._

/** Every registered query must run at sf0.001 and produce a sane frame;
  * the driver contract (unique names, aliased oracle columns) is enforced
  * structurally here.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size)
  }

  test("headline subset is non-empty") {
    assert(Registry.all.count(_.headline) >= 8)
  }

  // every query executes and yields a well-formed result
  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      // q06_anti_join can legitimately be empty; everything else must emit
      if (q.name != "q06_anti_join") assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
