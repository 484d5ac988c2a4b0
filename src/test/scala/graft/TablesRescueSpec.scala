package graft

/** Pins the scan-parallelism rescue's size gate to the Hadoop FileSystem
  * API (VERDICT r16 item: a java.io.File probe returns 0 for any non-local
  * scheme — hdfs://, s3a://, even a file: URI — which would make the gate
  * fire UNCONDITIONALLY at exactly the production scales where the
  * scaladoc promises it is dead). The file: URI is the schemed path a
  * local test can actually exercise; the FileSystem API resolves every
  * scheme through the same code path. */
class TablesRescueSpec extends SparkSpec {

  test("tableBytes reads real bytes through a schemed (file:) URI") {
    val plain = Tables.tableBytes(spark, s"$sfDir/documents.parquet")
    val uri = Tables.tableBytes(spark, s"file://$sfDir/documents.parquet")
    assert(plain > 0, "plain path must size the parquet file")
    assert(uri == plain,
      s"file: URI must see the same bytes as the plain path (got $uri vs $plain — " +
        "a java.io.File probe would return 0 here and invert the gate)")
  }

  test("the rescue gate decides identically for plain paths and file: URIs") {
    val plain = Tables.documents(spark, sfDir).queryExecution.executedPlan.toString
    val uri = Tables.documents(spark, s"file://$sfDir").queryExecution.executedPlan.toString
    assert(plain.contains("hashpartitioning(doc_id"),
      s"bench-scale documents must be rescued; plan:\n$plain")
    assert(uri.contains("hashpartitioning(doc_id"),
      s"the same table through a file: URI must get the same rescue; plan:\n$uri")
  }

  test("spark.graft.rescue=false opts a session out at runtime") {
    spark.conf.set("spark.graft.rescue", "false")
    try {
      val p = Tables.documents(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"opt-out must leave the bare scan; plan:\n$p")
    } finally spark.conf.unset("spark.graft.rescue")
  }

  test("unrescued loader leaves pure-projection consumers shuffle-free") {
    val p = Tables.unrescued(spark, sfDir, "documents")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unrescued scan must not shuffle; plan:\n$p")
  }
}
