package graft

/** Contract checks for the driver interface: every registry entry builds,
  * returns rows at sf0.001, and has unique, snake_case column names (the
  * driver's hash compare sorts columns by name — duplicates would break it).
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} builds and returns rows at sf0.001") {
      val df = q.build(spark, sfDir)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns: ${cols.mkString(",")}")
      assert(df.count() > 0)
    }
  }
}
