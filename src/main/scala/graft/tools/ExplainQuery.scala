package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: `dev/jrun.sh graft.tools.ExplainQuery <name> [<name>…]`
  * prints each registered query's formatted physical plan at sf0.001 —
  * the loop for checking WholeStageCodegen spans, pushed filters, and
  * shuffle counts before a query ships. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <queryName> [<queryName>…]")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    }
    spark.stop()
  }
}
