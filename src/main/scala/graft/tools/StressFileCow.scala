package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{FileCow, Versioned}

/** Measures G19's central claim — FILE-LEVEL COW makes small-DML commit
  * cost a function of TOUCHED data, not table size — against the
  * snapshot-level comparator (G11's model: every commit rewrites the
  * table). Three arms per table size, same 1000-row upsert each time:
  *
  *  - `cow_narrow`: increment confined to one key range (the incremental
  *    production shape — dw3's daily merge, a streaming batch). Expected:
  *    wall time FLAT across table decades, files_rewritten ≈ 1.
  *  - `cow_scatter`: the same 1000 keys spread uniformly across the whole
  *    key space — the honest worst case: every file's stats admit a key,
  *    COW degenerates to a full rewrite. Expected: grows with the table.
  *  - `full`: snapshot-level upsert (anti-join + union + whole-table
  *    publish — exactly what G11/G18 commit). Expected: grows with the
  *    table; the gap to `cow_narrow` is the feature.
  *
  * Usage: dev/jrun.sh graft.tools.StressFileCow [rowCounts…]
  */
object StressFileCow {

  private def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweepMode = args.headOption.contains("sweep")
    val sizes = if (args.nonEmpty && !sweepMode) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Paths.get("/tmp/stress-filecow")
    rmTree(work)

    if (sweepMode) {
      // FILE-COUNT SWEEP (round 10): fixed data size, growing file count —
      // isolates the per-commit METADATA cost. Before delta manifests,
      // every commit wrote + collected the full manifest: O(F) per commit,
      // visible as commit time growing with F at constant data. After,
      // a small commit persists only its added slice: flat in F (one
      // amortized checkpoint every graft.checkpoint.interval commits).
      val fileCounts =
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(400, 2000, 10000)
      val nRows = 2000000L
      for (f <- fileCounts) {
        val root = work.resolve(s"sweep-$f").toString
        val base = spark.range(0L, nRows).select(col("id"),
          (col("id") % 97).as("grp"), md5(col("id").cast("string")).as("payload"))
        FileCow.create(spark, root, base.repartitionByRange(f, col("id")),
          statsCols = Seq("id"))
        def inc(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
          lit(-1L).as("grp"), lit("UPDATED").as("payload"))
        def timed[T](body: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = body
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // 100 fresh keys per append, three appends: the steady streaming
        // shape whose metadata cost is the sweep's subject. Delta arm
        // (interval high: every commit persists only its added slice) vs
        // the checkpoint-every-commit CONTROL (interval 1: every commit
        // writes the full F-row manifest — the r9 behavior's write cost).
        FileCow.setTableProperties(spark, root,
          Map(FileCow.CheckpointIntervalProp -> "1000000"))
        val appends = (1 to 3).map { i =>
          val fresh = inc(spark.range(nRows + i * 100L, nRows + i * 100L + 100L)
            .select(col("id"))).localCheckpoint()
          timed(FileCow.append(spark, root, fresh))._2
        }
        FileCow.setTableProperties(spark, root,
          Map(FileCow.CheckpointIntervalProp -> "1"))
        val appendsCkpt = (4 to 6).map { i =>
          val fresh = inc(spark.range(nRows + i * 100L, nRows + i * 100L + 100L)
            .select(col("id"))).localCheckpoint()
          timed(FileCow.append(spark, root, fresh))._2
        }
        FileCow.setTableProperties(spark, root,
          Map(FileCow.CheckpointIntervalProp -> "1000000"))
        val narrow = inc(spark.range(0L, 100L).select(col("id"))).localCheckpoint()
        val (cM, sMerge) = timed(FileCow.merge(spark, root, narrow, Seq("id")))
        val (_, sMeta) = timed(FileCow.setTableProperties(spark, root,
          Map("graft.sweep.tag" -> "1")))
        val (_, sRestore) = timed(
          FileCow.restore(spark, root, FileCow.currentVersion(root) - 1))
        // RENAME under column mapping: metadata-only by construction
        // (round 10) — timed here so the sweep records the cost class
        // (one checkpoint write, zero data files) across file counts
        val (cRen, sRename) = timed(
          FileCow.renameColumn(spark, root, "payload", "body"))
        require(cRen.filesRewritten == 0L && cRen.filesAdded == 0L,
          s"mapped rename must be metadata-only, got $cRen")
        // the REMOVED r9 per-commit path, timed for the record: stage the
        // full manifest through a Spark job (untouched left-anti join +
        // union + coalesce(1) write) and collect it back — what every
        // commit paid before delta manifests
        val (_, sR9) = timed {
          val man = FileCow.manifest(spark, root, FileCow.currentVersion(root))
          val probe = work.resolve(s"r9probe-$f").toString
          man.join(man.limit(1).select(col("file")), Seq("file"), "left_anti")
            .unionByName(man.limit(1))
            .coalesce(1).write.mode("overwrite").parquet(probe)
          val n = spark.read.parquet(probe).select("file", "rows", "bytes")
            .collect().length
          rmTree(Paths.get(probe)); n
        }
        println(f"""{"files":$f,"rows":$nRows,"append_sec":[${appends.map(s => f"$s%.2f").mkString(",")}],"append_ckpt_sec":[${appendsCkpt.map(s => f"$s%.2f").mkString(",")}],"merge_narrow_sec":$sMerge%.2f,"merge_rewritten":${cM.filesRewritten},"meta_commit_sec":$sMeta%.2f,"restore_sec":$sRestore%.2f,"rename_sec":$sRename%.2f,"r9_manifest_path_sec":$sR9%.2f}""")
        rmTree(Paths.get(root))
        System.gc()
      }
      spark.stop()
      return
    }

    for (n <- sizes) {
      val root = work.resolve(s"cow-$n").toString
      val vroot = work.resolve(s"ver-$n").toString
      val nFiles = math.max(8L, n / 250000L).toInt
      val base = spark.range(0L, n).select(col("id"),
        (col("id") % 97).as("grp"), md5(col("id").cast("string")).as("payload"))

      FileCow.create(spark, root, base.repartitionByRange(nFiles, col("id")),
        statsCols = Seq("id"))
      Versioned.publish(base, vroot)

      def inc(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
        lit(-1L).as("grp"), lit("UPDATED").as("payload"))
      val narrow = inc(spark.range(0L, 1000L).select(col("id"))).localCheckpoint()
      val stride = math.max(1L, n / 1000L)
      val scatter = inc(spark.range(0L, 1000L).select((col("id") * stride).as("id")))
        .localCheckpoint()

      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
      }
      val (cNarrow, sNarrow) = timed(FileCow.merge(spark, root, narrow, Seq("id")))
      val (cScatter, sScatter) = timed(FileCow.merge(spark, root, scatter, Seq("id")))
      // round-9 arms: append (fresh keys, zero rewrites — the F20/INSERT
      // path: O(batch) regardless of table size) and restore (pure
      // metadata — a shared-files commit, no data IO at any size)
      val fresh = inc(spark.range(n, n + 1000L).select(col("id"))).localCheckpoint()
      val (cAppend, sAppend) = timed(FileCow.append(spark, root, fresh))
      val preRestore = FileCow.currentVersion(root)
      val (_, sRestore) = timed(FileCow.restore(spark, root, preRestore - 1))
      val (_, sFull) = timed {
        val cur = Versioned.read(spark, vroot)
        Versioned.publish(
          narrow.unionByName(cur.join(narrow.select("id"), Seq("id"), "left_anti")), vroot)
      }
      println(f"""{"n":$n,"files":$nFiles,"cow_narrow_sec":$sNarrow%.2f,"cow_narrow_rewritten":${cNarrow.filesRewritten},"cow_narrow_kept":${cNarrow.filesKept},"cow_scatter_sec":$sScatter%.2f,"cow_scatter_rewritten":${cScatter.filesRewritten},"append_sec":$sAppend%.2f,"append_added":${cAppend.filesAdded},"restore_sec":$sRestore%.2f,"full_sec":$sFull%.2f}""")
      rmTree(Paths.get(root)); rmTree(Paths.get(vroot))
      System.gc()
    }
    spark.stop()
  }
}
