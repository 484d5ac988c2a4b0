package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.functions.BpeTokenizer

/** Regenerates [[graft.functions.BpeMerges]] from the reference corpus:
  * `dev/jrun.sh graft.tools.TrainBpe /root/testdata/sf0.01` prints the
  * Scala source to paste (the pinned-artifact discipline — the shipped
  * vocabulary is a constant, never silently retrained). */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rules = BpeTokenizer.train(spark, Tables.documents(spark, sfDir))
    println("object BpeMerges {")
    println("  val pinned: Vector[(String, String)] = Vector(")
    rules.grouped(4).foreach { g =>
      println("    " + g.map { case (a, b) => s"""("$a", "$b")""" }.mkString(", ") + ",")
    }
    println("  )")
    println("}")
    spark.stop()
  }
}
