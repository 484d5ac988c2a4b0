package graft

import java.nio.file.Files

import graft.plans.{GraftCreateTableCommand, GraftTables}
import graft.sources.FileCow

/** End-to-end leg of the round-trip property (VERDICT r11 #5): randomized
  * REAL tables — random schemas (types, NOT NULL flags), random
  * TBLPROPERTIES whose values carry quotes/backslashes/parens/unicode
  * (including CHECK-constraint-shaped predicates) — created through SQL,
  * exported with SHOW CREATE, and the exported DDL re-PARSED: the parsed
  * command's schema, properties, and root must equal the stored table's
  * exactly. [[SqlRoundTripProperties]] hammers the lexer pair at the
  * string layer (1200+ cases); this drives the same inverse through the
  * full statement surface on live tables. */
class SqlRoundTripSpec extends SparkSpec {

  private val types = Vector("BIGINT", "STRING", "DOUBLE", "DECIMAL(10,2)",
    "DATE", "TIMESTAMP", "ARRAY<STRING>", "INT")

  private val hazards = Vector("'", "\\", "(", ")", ",", "=", "\n", "--",
    "/*", "*/", "it's", "a > 0 AND (b < 'x''y')", "regex \\d+\\.\\d+",
    "ü数据🙂", "plain",
    // clause keywords INSIDE property values must never be mistaken for
    // the clauses themselves (the splice-order hazard)
    "LOCATION '/fake/x'", "USING graft-cow", "STATS (k)")

  test("30 random tables: SHOW CREATE re-parses to the stored schema/props/root") {
    val rnd = new scala.util.Random(20260815L)
    def nasty(): String =
      (0 until (1 + rnd.nextInt(5))).map(_ => hazards(rnd.nextInt(hazards.length)))
        .mkString(" ")
    (1 to 30).foreach { case i =>
      val name = s"rt_$i"
      val root = Files.createTempDirectory(s"graft-rt-$i").resolve("t").toString
      GraftTables.registerCow(name, root)
      try {
        // c0 stays BIGINT so stats eligibility always holds
        val nCols = 2 + rnd.nextInt(4)
        val cols = (0 until nCols).map { c =>
          val t = if (c == 0) "BIGINT" else types(rnd.nextInt(types.length))
          val nn = if (rnd.nextBoolean()) " NOT NULL" else ""
          s"c$c $t$nn"
        }.mkString(",\n  ")
        val props = (0 until rnd.nextInt(4)).map { p =>
          val k = if (p == 0) "graft.constraints.chk" else s"k$p"
          s"'${graft.plans.GraftSqlLex.q(k)}' = '${graft.plans.GraftSqlLex.q(nasty())}'"
        }.mkString(", ")
        val propsDdl = if (props.isEmpty) "" else s" TBLPROPERTIES ($props)"
        spark.sql(s"CREATE TABLE $name (\n  $cols\n)$propsDdl")
        val stored = FileCow.schemaOf(root, 1L)
        val storedProps = FileCow.tableProps(root, 1L)
        val ddl = spark.sql(s"SHOW CREATE TABLE $name").collect().head.getString(0)
        // the export must RE-PARSE — through the real session parser — to
        // exactly the stored artifacts (parse is pure; nothing executes)
        val cmd = spark.sessionState.sqlParser.parsePlan(ddl) match {
          case c: GraftCreateTableCommand => c
          case other => fail(s"table $i: $ddl re-parsed to $other")
        }
        assert(cmd.root == root, s"table $i root")
        def key(s: org.apache.spark.sql.types.StructType) =
          s.fields.toSeq.map(f => (f.name, f.dataType, f.nullable))
        assert(key(cmd.declaredSchema) == key(stored),
          s"table $i schema: ${cmd.declaredSchema.simpleString} vs ${stored.simpleString}\n$ddl")
        assert(cmd.props == storedProps,
          s"table $i props: ${cmd.props} vs $storedProps\n$ddl")
        // and the STATS comment round-trips as the declared prune columns
        assert(cmd.statsCols == FileCow.statsColsOf(spark, root, 1L),
          s"table $i stats: ${cmd.statsCols}\n$ddl")
      } finally GraftTables.unregister(name)
    }
  }
}
