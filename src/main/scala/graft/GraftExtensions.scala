package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AHash64, CdcChunks, DotProduct, MinHashSig8, PolyHash31, SimHash60, WordShingles3, WordShinglesN}

/** SQL surface for graft's native expressions.
  *
  * Deployment path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes `dot_product(a, b)` and `poly_hash31(s)` available to every SQL
  * user of the session — the standard mechanism for shipping Catalyst
  * extensions in a library (no fork of Spark, no UDF registry, full codegen).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // MERGE INTO on graft.sources.Versioned tables (graft.plans.GraftMerge):
    // rule lowers upsert-shaped MergeIntoTable on registered names; strategy
    // plans the command; unregistered targets pass through untouched.
    ext.injectResolutionRule(session => new graft.plans.GraftMergeRule(session))
    ext.injectPlannerStrategy(_ => graft.plans.GraftMergeStrategy)
    // VACUUM <t> RETAIN <n> VERSIONS; all other statements delegate verbatim.
    // The parser factory runs once per session build — the moment to attach
    // the DURABLE catalog when the deployment names one
    // (`--conf spark.graft.warehouse=<dir>`): name→table bindings then
    // survive driver restarts and resolve across driver processes.
    ext.injectParser { (session, delegate) =>
      session.sparkContext.getConf.getOption("spark.graft.warehouse")
        .filterNot(graft.plans.GraftTables.warehouse.contains)
        .foreach(graft.plans.GraftTables.attachWarehouse)
      // the DSv2 catalog (SHOW TABLES IN graft / DESCRIBE / spark.table /
      // USE graft) rides the extensions conf: catalog plugins resolve
      // lazily from SQLConf, so registering the class name here — before
      // any statement parses — makes `spark.sql.extensions` the ONLY conf
      // a deployment needs; an explicit spark.sql.catalog.graft wins
      // the DSv2 catalog conf itself is registered LAZILY on the parser's
      // first use (GraftSqlParser.ensureCatalog): the factory runs INSIDE
      // sessionState construction, where touching session.conf would
      // recurse into the build
      new graft.plans.GraftSqlParser(session, delegate)
    }
    // metadata-only COUNT(*)/MIN/MAX over unfiltered cow-table scans — the
    // manifest answers from driver-cached per-file stats, zero Spark jobs
    ext.injectOptimizerRule(_ => new graft.plans.CowMetadataAggRule)
  }
}

object GraftExtensions {
  /** Arity checked here; element types are checked by each expression's
    * ExpectsInputTypes/checkInputDataTypes, so misuse fails analysis with a
    * clear message rather than a runtime cast error. */
  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n, s"$name takes exactly $n argument(s), got ${args.length}")
    args
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => { val a = arity("dot_product", 2)(args); DotProduct(a(0), a(1)) }),
    (FunctionIdentifier("poly_hash31"),
      new ExpressionInfo(classOf[PolyHash31].getName, "poly_hash31"),
      (args: Seq[Expression]) => PolyHash31(arity("poly_hash31", 1)(args).head)),
    (FunctionIdentifier("word_shingles3"),
      new ExpressionInfo(classOf[WordShingles3].getName, "word_shingles3"),
      (args: Seq[Expression]) => WordShingles3(arity("word_shingles3", 1)(args).head)),
    (FunctionIdentifier("word_shingles_n"),
      new ExpressionInfo(classOf[WordShinglesN].getName, "word_shingles_n"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles_n(text, n) takes 2 arguments")
        require(args(1).foldable, "word_shingles_n: n must be a literal")
        val n = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles_n: n must be integral, got $other")
        }
        WordShinglesN(args(0), n)
      }),
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(arity("simhash60", 1)(args).head)),
    (FunctionIdentifier("minhash_sig8"),
      new ExpressionInfo(classOf[MinHashSig8].getName, "minhash_sig8"),
      (args: Seq[Expression]) => MinHashSig8(arity("minhash_sig8", 1)(args).head)),
    (FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (args: Seq[Expression]) => CdcChunks(arity("cdc_chunks", 1)(args).head)),
    (FunctionIdentifier("ahash64"),
      new ExpressionInfo(classOf[AHash64].getName, "ahash64"),
      (args: Seq[Expression]) => AHash64(arity("ahash64", 1)(args).head)),
    (FunctionIdentifier("word_window_hashes"),
      new ExpressionInfo(classOf[graft.functions.WordWindowHashes].getName, "word_window_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_window_hashes(text, w) takes 2 arguments")
        require(args(1).foldable, "word_window_hashes: w must be a literal")
        val w = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"word_window_hashes: w must be integral, got $other")
        }
        graft.functions.WordWindowHashes(args(0), w)
      }),
    (FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContainLong].getName,
        "bloom_might_contain_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_might_contain_long(key, sketch) takes 2 arguments")
        require(args(1).foldable, "bloom_might_contain_long: sketch must be a BINARY literal")
        val bytes = args(1).eval() match {
          case b: Array[Byte] => b
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain_long: sketch must be BINARY, got $other")
        }
        graft.functions.BloomMightContainLong(args(0), bytes)
      }))
}
