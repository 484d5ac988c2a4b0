package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level cost breakdown of dd14_multi_signal — the suite's most
  * expensive query — answering VERDICT r6 item 7: is the next win band
  * tuning, CC round fusion, or is the cost inherent?
  *
  * Times the four stages the query actually runs, each forced to full
  * materialization in dependency order so a stage's number is its own cost,
  * not its inputs': shingle pass → LSH edge gen → containment edge gen →
  * connected components → signal/size rollup. Results to stdout as one
  * JSON line; recorded in docs/OPERATORS.md.
  */
object ProfileDd14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val runs = (1 to reps).map { _ =>
      val (tSh, sh) = timed {
        val x = Dedup.docShingles(spark, sfDir).localCheckpoint(); x.count(); x
      }
      val (tLsh, lshE) = timed {
        val x = Dedup.lshPairsFrom(sh)
          .select(col("id_a"), col("id_b"), lit("lsh").as("sig")).localCheckpoint()
        x.count(); x
      }
      val (tCon, conE) = timed {
        val x = Dedup.containmentPairs(sh)
          .select(col("id_a"), col("id_b"), lit("containment").as("sig")).localCheckpoint()
        x.count(); x
      }
      val edges = lshE.unionByName(conE).localCheckpoint()
      val (tCc, labels) = timed {
        val x = Dedup.connectedComponents(edges.select("id_a", "id_b")).localCheckpoint()
        x.count(); x
      }
      val (tRoll, _) = timed {
        val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        val sigs = edges
          .join(labels.select(col("doc_id").as("id_a"), col("cluster_id")), "id_a")
          .groupBy("cluster_id")
          .agg(array_join(array_sort(array_distinct(collect_list(col("sig")))), "+")
            .as("signals"))
        labels.join(sizes, "cluster_id").join(sigs, "cluster_id").count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      Map("shingles" -> tSh, "lsh_edges" -> tLsh, "containment_edges" -> tCon,
        "connected_components" -> tCc, "rollup" -> tRoll)
    }
    val med = runs.head.keys.map { k =>
      val xs = runs.map(_(k)).sorted
      k -> xs(xs.length / 2)
    }.toMap
    val total = med.values.sum
    val parts = med.toSeq.sortBy(-_._2)
      .map { case (k, v) => s""""$k": ${f"$v%.3f"}""" }.mkString(", ")
    println(s"""{"sf": "$sfDir", "reps": $reps, $parts, "total": ${f"$total%.3f"}}""")
    spark.stop()
  }
}
