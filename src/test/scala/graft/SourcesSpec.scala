package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.sources.Sources

/** G2/G3: typed round-trips and partition-pruned fact reads. */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("G2 csv round-trip preserves schema and values") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val back = Sources.csvRoundTrip(spark, orders, tmp("csv"))
    assert(back.schema == orders.schema)
    val a = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("G2 json round-trip preserves schema and values") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val back = Sources.jsonRoundTrip(spark, cust, tmp("json"))
    assert(back.schema == cust.schema)
    val a = cust.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("G3 partitioned fact write prunes partitions on the month key") {
    val path = tmp("fact")
    val orders = Tables.orders(spark, sfDir)
    Sources.writeFactPartitioned(orders, "o_orderdate", path)

    val month = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(min("m")).head.getString(0)
    val pruned = Sources.readFact(spark, path)
      .filter(col("part_month") === month)
    // Count matches the unpartitioned filter...
    val expected = orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === month).count()
    assert(expected > 0 && pruned.count() == expected)

    // ...and the scan plans only the one matching partition directory.
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Some(f)
    }.flatten
    assert(scan.isDefined, "expected a FileSourceScanExec")
    assert(scan.get.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.get.selectedPartitions.partitionCount}")
  }

  test("G6 schema-evolution read: drifted landing meets the typed contract") {
    import org.apache.spark.sql.types._
    val dir = tmp("evolve")
    val s = spark
    import s.implicits._
    // Era 1: two columns. Era 2: the source grew a `channel` column.
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount")
      .write.mode("overwrite").parquet(s"$dir/era=1")
    Seq((3L, 30.0, "web"), (4L, 40.0, "store")).toDF("k", "amount", "channel")
      .write.mode("overwrite").parquet(s"$dir/era=2")

    val contract = StructType(Seq(
      StructField("k", LongType),
      StructField("amount", DoubleType),
      StructField("channel", StringType),
      StructField("region", StringType))) // contracted but landed nowhere yet
    val out = Sources.readFactEvolved(spark, dir, contract)
    assert(out.schema.fieldNames.toSeq == Seq("k", "amount", "channel", "region"))
    val rows = out.orderBy("k")
      .collect().map(r => (r.getLong(0), r.isNullAt(2), r.isNullAt(3))).toSeq
    // Old-era rows surface NULL channel; the never-landed column is all-NULL.
    assert(rows == Seq((1L, true, true), (2L, true, true),
      (3L, false, true), (4L, false, true)))
    // A type conflict must fail loudly, not cast silently.
    val bad = StructType(Seq(StructField("k", LongType),
      StructField("amount", StringType)))
    intercept[IllegalArgumentException] {
      Sources.readFactEvolved(spark, dir, bad)
    }
  }

  test("G5 compaction collapses per-partition file counts, conserving rows") {
    val landing = tmp("landing")
    val compacted = tmp("compacted")
    val orders = Tables.orders(spark, sfDir)
    // Simulate a many-increment landing: 8 writer tasks per month directory.
    orders.withColumn("part_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("part_month")
      .parquet(landing)

    def filesPerMonth(dir: String): Map[String, Int] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("part_month="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    assert(filesPerMonth(landing).values.max > 1, "landing must be fragmented")

    Sources.compactFact(spark, landing, compacted, maxRecordsPerFile = 1000000L)
    assert(filesPerMonth(compacted).values.max == 1,
      s"every month should compact to one file: ${filesPerMonth(compacted)}")
    val a = Sources.readFact(spark, landing)
    val b = Sources.readFact(spark, compacted)
    assert(a.schema == b.schema)
    assert(b.count() == orders.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("G13 compaction planner scopes the rewrite to fragmented partitions only") {
    val landing = tmp("plan-landing")
    val orders = Tables.orders(spark, sfDir)
      .withColumn("part_month", date_format(col("o_orderdate"), "yyyy-MM"))
    // fragment every month 8 ways, then rewrite ONE month to a single file
    orders.repartition(8)
      .write.mode("overwrite").partitionBy("part_month").parquet(landing)
    val oneMonth = orders.select("part_month").orderBy("part_month").head().getString(0)
    orders.filter(col("part_month") === oneMonth).coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$landing/part_month=$oneMonth")
    val plan = Sources.compactionPlan(spark, landing, maxFiles = 4, minAvgBytes = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(4)))
    val byPart = plan.map(p => p._1 -> p._3).toMap
    assert(byPart(s"part_month=$oneMonth") == "leave",
      "the already-compacted month must be left alone")
    // every action matches the rule it claims (minAvgBytes=1 never fires
    // on real parquet, so the rule reduces to the file-count test)
    plan.foreach { case (part, nFiles, action) =>
      assert(action == (if (nFiles > 4) "compact" else "leave"),
        s"$part: n_files=$nFiles but action=$action")
    }
    // and the fragmented landing gives the planner real work
    assert(plan.count(_._3 == "compact") > plan.length / 2,
      s"most months must be flagged on an 8-way fragmented landing")
  }

  test("G7 dynamic partition overwrite replaces only the increment's partitions") {
    val path = tmp("dynfact")
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    Sources.writeFactPartitioned(orders, "o_orderdate", path)
    val before = spark.read.parquet(path)
    val untouchedBefore = before.filter(!col("part_month").startsWith("1997-03"))
      .collect().map(_.toSeq).toSet

    // the nightly increment: March 1997 re-lands with corrected prices
    val increment = orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1997-03")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    assert(increment.count() > 0, "test month must exist in the data")
    Sources.overwriteIncrement(increment, "o_orderdate", path)

    val after = spark.read.parquet(path)
    // total row count unchanged: replaced month has the same rows, others kept
    assert(after.count() == orders.count())
    // every untouched partition is value-identical
    assert(after.filter(!col("part_month").startsWith("1997-03"))
      .collect().map(_.toSeq).toSet == untouchedBefore)
    // the touched month carries the increment's values, not the originals
    val marchPrices = after.filter(col("part_month") === "1997-03")
    assert(marchPrices.count() == increment.count())
    assert(marchPrices.join(orders.withColumnRenamed("o_totalprice", "orig"),
      Seq("o_orderkey")).filter(col("o_totalprice") =!= col("orig") * 2).isEmpty)

    // idempotence: re-landing the same increment changes nothing
    // (materialize first — the second rewrite replaces the files the
    // existing `after` plan's listing points at)
    val afterRows = after.collect().map(_.toSeq).toSet
    Sources.overwriteIncrement(increment, "o_orderdate", path)
    val again = spark.read.parquet(path)
    assert(again.count() == orders.count())
    assert(again.collect().map(_.toSeq).toSet == afterRows)
  }

  test("G9 zoned write: manifest admits a strict file subset and the pruned read is exact") {
    val path = tmp("zoned")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    Sources.writeFactZoned(li, "l_orderkey", path, nZones = 8)

    val total = Sources.zonedFiles(spark, path, Long.MinValue, Long.MaxValue).size
    assert(total >= 8) // one file per zone at least

    // a narrow key range must plan to a strict subset of the files
    val keys = li.agg(min("l_orderkey"), max("l_orderkey")).head
    val (lo, hi) = (keys.getLong(0), keys.getLong(0) + (keys.getLong(1) - keys.getLong(0)) / 10)
    val admitted = Sources.zonedFiles(spark, path, lo, hi)
    assert(admitted.nonEmpty && admitted.size < total)

    // ...and return exactly the rows of the full-scan filter
    val got = Sources.readFactZoned(spark, path, "l_orderkey", lo, hi)
    val want = li.filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // planner-integrated skipping (r8): the SCAN's own file listing — the
    // range predicate pushed as dataFilters through ZoneMapFileIndex — must
    // open exactly the manifest-admitted subset, no pre-collected path list.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = got.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val opened = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).flatMap(_.files).length
    assert(opened == admitted.size,
      s"scan opened $opened files, manifest admits ${admitted.size}")
  }

  test("G9 zoned read of an empty key range returns zero rows with the table schema") {
    val path = tmp("zoned-empty")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Sources.writeFactZoned(li, "l_orderkey", path, nZones = 4)
    val none = Sources.readFactZoned(spark, path, "l_orderkey", -100L, -1L)
    assert(none.isEmpty)
    assert(none.columns.toSet == Set("l_orderkey", "l_quantity"))
  }

  test("G10 quarantine routes malformed and incomplete lines, conserving every byte") {
    import java.nio.file.{Files => JFiles, Paths}
    import org.apache.spark.sql.types._
    val dir = tmp("quarantine")
    val lines = Seq(
      """{"id": 1, "name": "alpha", "qty": 10}""",      // clean
      """{"id": 2, "name": "beta"}""",                  // valid JSON, qty missing -> clean (not required)
      """{"id": 3, "qty": 5}""",                        // name missing -> quarantine (required)
      """{"id": 4, "name": "gamma", "qty": """,        // truncated -> malformed
      """not json at all""",                            // malformed
      "   ",                                            // blank -> malformed, not missing_required
      """{"id": 6, "name": "zeta", "qty": 7}""")        // clean
    JFiles.write(Paths.get(dir, "landing.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("qty", LongType)))
    val (clean, quarantine) = Sources.readJsonQuarantined(spark, dir, schema, Seq("id", "name"))
    assert(clean.schema.fieldNames.toSeq == Seq("id", "name", "qty"))
    assert(clean.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 6L))
    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(q.size + clean.count() == lines.size)
    // rejected lines survive byte-exact, with the gate that rejected them
    assert(q.map(_._1).toSet == Set(lines(2), lines(3), lines(4), lines(5)))
    assert(q.toMap.apply(lines(2)) == "missing_required")
    assert(q.toMap.apply(lines(4)) == "malformed")
    assert(q.toMap.apply(lines(5)) == "malformed") // blank is not a schema failure
  }

  test("G11 versioned publish: time travel reads exactly, vacuum retires, pointer atomic") {
    import graft.sources.Versioned
    val root = tmp("versioned")
    val v1Data = Tables.region(spark, sfDir)
    val v2Data = Tables.nation(spark, sfDir)
    assert(Versioned.currentVersion(root) == 0L)
    assert(Versioned.publish(v1Data, root) == 1L)
    assert(Versioned.publish(v2Data, root) == 2L)
    assert(Versioned.versions(root) == Seq(1L, 2L))
    // current read = latest snapshot; time travel = the old bytes, exactly
    assert(Versioned.read(spark, root).count() == v2Data.count())
    val back = Versioned.readVersion(spark, root, 1L)
    assert(back.schema == v1Data.schema)
    assert(back.exceptAll(v1Data).isEmpty && v1Data.exceptAll(back).isEmpty)
    // vacuum keeps the newest `keep`; dropped versions fail loudly
    assert(Versioned.vacuum(root, keep = 1) == Seq(1L))
    assert(Versioned.versions(root) == Seq(2L))
    intercept[IllegalArgumentException](Versioned.readVersion(spark, root, 1L))
    assert(Versioned.read(spark, root).count() == v2Data.count())
  }

  test("G17 change feed classifies every key; applying the diff reproduces the snapshot") {
    import graft.sources.Versioned
    import org.apache.spark.sql.functions._
    val root = tmp("versioned-cdf")
    val base = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal")
    // v2: drop key 1, rewrite key 2's balance, add a fresh key
    val v2 = base.filter(col("c_custkey") =!= 1)
      .withColumn("c_acctbal",
        when(col("c_custkey") === 2, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
      .unionByName(base.filter(col("c_custkey") === 3)
        .withColumn("c_custkey", lit(999999L)))
    Versioned.publish(base, root)
    Versioned.publish(v2, root)

    val cdf = Versioned.changesBetween(spark, root, Seq("c_custkey"), 1L, 2L).cache()
    // exactly the planted changes, with Delta's change vocabulary
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 1L, "delete" -> 1L,
      "update_pre" -> 1L, "update_post" -> 1L))
    assert(cdf.filter(col("_change_type") === "delete")
      .select("c_custkey").head().getLong(0) == 1L)
    assert(cdf.filter(col("_change_type") === "insert")
      .select("c_custkey").head().getLong(0) == 999999L)
    assert(cdf.filter(col("_change_type").startsWith("update"))
      .select("c_custkey").distinct().head().getLong(0) == 2L)
    // self-diff is empty; applying the feed to v1 reproduces v2 exactly
    assert(Versioned.changesBetween(spark, root, Seq("c_custkey"), 2L, 2L).isEmpty)
    val v1 = Versioned.readVersion(spark, root, 1L)
    val removedKeys = cdf.filter(col("_change_type").isin("delete", "update_pre"))
      .select("c_custkey")
    val applied = v1.join(removedKeys, Seq("c_custkey"), "left_anti")
      .unionByName(cdf.filter(col("_change_type").isin("insert", "update_post"))
        .drop("_change_type"))
    val v2Read = Versioned.readVersion(spark, root, 2L)
    assert(applied.exceptAll(v2Read).isEmpty && v2Read.exceptAll(applied).isEmpty)
    cdf.unpersist()
  }
}
