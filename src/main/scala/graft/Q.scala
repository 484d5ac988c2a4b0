package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named Spark query plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB as a correctness oracle.
  * Column names must match exactly between the two — the driver sorts columns
  * by name and hashes values.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
