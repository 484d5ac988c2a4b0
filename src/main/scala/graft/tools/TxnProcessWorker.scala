package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{FileCow, GraftTransactions}

/** A FOREIGN-PROCESS transaction participant (round 16) — the worker half
  * of the multi-process cross-table txn spec: joins an already-open
  * transaction by its marker path ([[GraftTransactions.join]]), lands one
  * append on `root` gated behind the coordinator's marker, and exits.
  *
  * This is the reference's real pipeline shape — bp_etl.sh launches
  * main_orchestrator.py stages as separate OS processes — with the
  * atomicity the reference only has by convention: the stage's output
  * flips visible with the COORDINATOR's one conditional-put decision,
  * never on its own.
  *
  * Args: `<markerBase> <tableRoot> <k> [fail]` — `fail` throws AFTER the
  * gated append lands, proving a participant failure aborts the whole
  * transaction (its own landed commit included). Exit 0 = joined body
  * completed; nonzero = body threw (and the txn is aborted).
  */
object TxnProcessWorker {

  def main(args: Array[String]): Unit = {
    val marker = args(0)
    val root = args(1)
    val k = args(2).toLong
    val fail = args.length > 3 && args(3) == "fail"
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-txn-worker")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      import spark.implicits._
      GraftTransactions.join(spark, marker) {
        FileCow.append(spark, root,
          Seq((k, s"worker-$k", 1L)).toDF("k", "val", "u"))
        if (fail) sys.error("participant-induced failure (spec)")
      }
      ()
    } finally spark.stop()
  }
}
