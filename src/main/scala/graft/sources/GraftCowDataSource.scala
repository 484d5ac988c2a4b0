package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** The IDIOMATIC DataFrame API surface for cow tables — the shape a Delta
  * user reaches for before any SQL:
  *
  * {{{
  *   spark.read.format("graft-cow").option("root", root).load()
  *   spark.read.format("graft-cow").option("root", root)
  *     .option("versionAsOf", 3).load()                    // time travel
  *   df.write.format("graft-cow").option("root", root)
  *     .mode("append").save()                              // FileCow.append
  *   df.write.format("graft-cow").option("root", root)
  *     .mode("overwrite").save()                           // one replace commit
  * }}}
  *
  * Reads hand Spark the SAME manifest-pruned [[org.apache.spark.sql
  * .execution.datasources.HadoopFsRelation]] the SQL path plans through
  * (pushed filters prune files; no second code path to drift). Writes map
  * SaveMode onto the commit vocabulary: `Append` → [[FileCow.append]]
  * (bootstrap-creates on first write, like the first INSERT),
  * `Overwrite` → [[FileCow.overwrite]], `ErrorIfExists` → [[FileCow
  * .create]], `Ignore` → create-if-absent. `statsCols` (comma list)
  * overrides the default stats set ([[FileCow.statsEligible]]); the
  * creating write is range-partitioned on the lead stats column so DML
  * pruning bites from version 1.
  */
class GraftCowDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-cow"

  /** `df.writeStream.format("graft-cow")` — the F20 exactly-once append
    * sink behind the idiomatic spelling: each micro-batch is one append
    * commit stamped (appId, batchId) INSIDE the CAS (no marker window; a
    * replayed batch cannot duplicate). Options: `root` (required), `appId`
    * (required — the txn identity; keep it stable across restarts),
    * `statsCols` (comma list for the creating batch; default = every
    * stats-eligible column), `filesHint`. Append output mode only — keyed
    * upserts are [[graft.streaming.CowUpsertSink]]'s latest-wins contract,
    * which needs an ordering the generic sink cannot guess. */
  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-cow sink: append output mode only, got $outputMode")
    require(partitionColumns.isEmpty, "graft-cow sink: partitionBy unsupported " +
      "(layout is range-partitioning on the lead stats column)")
    val r = root(params)
    val appId = params.getOrElse("appId",
      sys.error("graft-cow sink: 'appId' option is required (the txn identity)"))
    val filesHint = params.get("filesHint").map(_.toInt).getOrElse(4)
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val stats = params.get("statsCols")
          .map(_.split(",").map(_.trim).toSeq)
          .getOrElse(FileCow.statsEligible(data.schema))
        // the streaming frame cannot be written directly — re-plan its rows
        // as a batch frame the same way foreachBatch does
        val batch = org.apache.spark.sql.GraftBridge.asBatch(data)
        graft.streaming.CowAppendSink.commitBatch(
          batch, r, appId, batchId, stats, filesHint)
      }
      override def toString: String = s"GraftCowAppendSink[$r]"
    }
  }

  private def root(params: Map[String, String]): String =
    params.getOrElse("root", sys.error("graft-cow: 'root' option is required"))

  private def resolveVersion(root: String, params: Map[String, String]): Long =
    params.get("versionAsOf").map(_.toLong)
      .orElse(params.get("timestampAsOf").map(ts =>
        FileCow.versionAtTimestamp(root, parseTs(ts))))
      .getOrElse(FileCow.currentVersion(root))

  private def parseTs(s: String): Long =
    if (s.forall(_.isDigit)) s.toLong
    else java.sql.Timestamp.valueOf(s).getTime

  override def createRelation(ctx: SQLContext,
      params: Map[String, String]): BaseRelation = {
    val r = root(params)
    require(FileCow.currentVersion(r) > 0L,
      s"graft-cow: no published version under $r")
    FileCow.relationFor(ctx.sparkSession, r, resolveVersion(r, params))
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      params: Map[String, String], df: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val r = root(params)
    val exists = FileCow.currentVersion(r) > 0L
    def stats: Seq[String] = params.get("statsCols")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(FileCow.statsEligible(df.schema))
    def create(): Unit = {
      val s = stats
      require(s.nonEmpty, "graft-cow: no stats-eligible column to create with")
      FileCow.create(spark, r, FileCow.rangedByLead(df, s), statsCols = s)
      ()
    }
    mode match {
      case SaveMode.Append => if (exists) FileCow.append(spark, r, df) else create()
      case SaveMode.Overwrite => if (exists) FileCow.overwrite(spark, r, df) else create()
      case SaveMode.ErrorIfExists =>
        require(!exists, s"graft-cow: table already exists at $r (mode ErrorIfExists)")
        create()
      case SaveMode.Ignore => if (!exists) create()
    }
    FileCow.relationFor(spark, r, FileCow.currentVersion(r))
  }
}
