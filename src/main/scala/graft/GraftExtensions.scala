package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` call-sites can use
  * them directly:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT simhash64(tokens), minhash_signature(shingles, 16), ...")
  * }}}
  *
  * This is the (c) mechanism of the custom-operator preference order
  * (SURVEY.md §7.1) — used here only for function registration; the engine
  * needs no custom planner rules because every operator plans onto stock
  * Spark physical operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }

  private def stringArrayArg(e: Expression, name: String): Seq[String] = e match {
    case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
      data.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
    // `array('a','b')` reaches function resolution as an unfolded CreateArray
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
        if ca.children.forall(c => c.isInstanceOf[Literal]) =>
      ca.children.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString)
    case other => throw new IllegalArgumentException(s"$name must be a string array literal, got $other")
  }

  private def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    // the full 11-arg form (className, db, name, usage, arguments, examples,
    // note, group, since, deprecated, source) is the one non-deprecated
    // ExpressionInfo ctor
    def info(name: String, usage: String) =
      new ExpressionInfo(
        classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "built-in")
    Seq(
      (FunctionIdentifier("simhash64"),
        info("simhash64", "simhash64(array<string>) - 64-bit SimHash of the elements"),
        (args: Seq[Expression]) => SimHash64Expr(args.head)),
      (FunctionIdentifier("minhash_signature"),
        info("minhash_signature", "minhash_signature(array<string>, k) - k-long MinHash signature"),
        (args: Seq[Expression]) => MinHashSignatureExpr(args.head, intArg(args(1), "k"))),
      (FunctionIdentifier("cosine_similarity"),
        info("cosine_similarity", "cosine_similarity(array<float|double>, array<float|double>)"),
        (args: Seq[Expression]) => CosineSimilarityExpr(args.head, args(1))),
      (FunctionIdentifier("jaccard_sorted"),
        info("jaccard_sorted", "jaccard_sorted(array<bigint>, array<bigint>) - set Jaccard of sorted arrays"),
        (args: Seq[Expression]) => JaccardSortedLongExpr(args.head, args(1))),
      (FunctionIdentifier("multi_substring_count"),
        info("multi_substring_count",
          "multi_substring_count(text, array('p1','p2',...)) - occurrence count per pattern"),
        (args: Seq[Expression]) =>
          MultiSubstringCountExpr(args.head, stringArrayArg(args(1), "patterns"))),
      (FunctionIdentifier("winnowing_fingerprints"),
        info("winnowing_fingerprints",
          "winnowing_fingerprints(array<bigint>, w) - distinct sliding-window-min fingerprints"),
        (args: Seq[Expression]) =>
          WinnowingFingerprintsExpr(args.head, intArg(args(1), "w"))),
      (FunctionIdentifier("lsh_bucket"),
        info("lsh_bucket",
          "lsh_bucket(array<float|double>, table, nPlanes) - random-hyperplane LSH bucket id"),
        (args: Seq[Expression]) =>
          LshBucketExpr(args.head, intArg(args(1), "table"), intArg(args(2), "nPlanes"))))
  }

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Register the SQL functions on an ALREADY-RUNNING session —
    * `withExtensions` only applies at build time and `getOrCreate` silently
    * ignores it when a session is active.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new GraftExtensions().registrations.foreach { case (id, info, builder) =>
      ColumnBridge.registerFunction(classic, id, info, builder)
    }
  }

  /** SQL surface for the Aggregator-backed sketch tier (SketchSqlSpec runs
    * one statement per sketch member). CMS / HLL / fixed-bin histogram
    * cells are already plain SQL — md5/conv/floor arithmetic + GROUP BY,
    * exactly what their DuckDB oracles replay — so only the two
    * bounded-buffer aggregators need names:
    *
    *  - `<name>(h, item)` — KMV bottom-k buffer ([[graft.functions.BottomKByHash]]);
    *    pair with `graft.functions.Kmv.hash` for h (13-hex md5 slice:
    *    `conv(substring(md5(item), 1, 13), 16, 10)`).
    *  - `<name>(sim, id, tag)` — top-k-by-sim buffer
    *    ([[graft.functions.TopKBySim]]): the ES weighted sample's core
    *    (sim = ln(u)/w) and every other bounded top-k.
    *
    * k must be baked into the registered name (SQL UDAFs take column
    * arguments only — a `k` argument would have to ride every row); the
    * parametric surface stays the Dataset API (Kmv.bufs / TopK.bufsPerKey).
    * [[registerSketchUdafs]] pins the engine's standard k = 16 under
    * `graft_kmv16` / `graft_topk16`; register other k's as needed.
    */
  def registerKmvUdaf(
      spark: org.apache.spark.sql.SparkSession, name: String, k: Int): Unit =
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(
      new graft.functions.BottomKByHash(k),
      org.apache.spark.sql.Encoders.product[graft.functions.KmvEntry]))

  /** See [[registerKmvUdaf]]. */
  def registerTopKUdaf(
      spark: org.apache.spark.sql.SparkSession, name: String, k: Int): Unit =
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKBySim(k),
      org.apache.spark.sql.Encoders.product[graft.functions.ScoredEntry]))

  /** `<name>(value)` — one-pass adaptive dyadic histogram buffer
    * ([[graft.functions.AdaptiveHistAgg]]): the third Aggregator-backed
    * sketch member. maxBins/minScale bake into the name like k does for the
    * others; explode the returned struct's parallel (bins, cnts) arrays
    * with `posexplode` + `element_at` for the cell table.
    */
  def registerAdaptiveHistUdaf(
      spark: org.apache.spark.sql.SparkSession,
      name: String, maxBins: Int, minScale: Int = 0): Unit =
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(
      new graft.functions.AdaptiveHistAgg(maxBins, minScale),
      org.apache.spark.sql.Encoders.DOUBLE
        .asInstanceOf[org.apache.spark.sql.Encoder[java.lang.Double]]))

  /** Register the standard-parameter sketch aggregators (`graft_kmv16`,
    * `graft_topk16`, `graft_ahist64`) — see [[registerKmvUdaf]] /
    * [[registerAdaptiveHistUdaf]].
    */
  def registerSketchUdafs(spark: org.apache.spark.sql.SparkSession): Unit = {
    registerKmvUdaf(spark, "graft_kmv16", 16)
    registerTopKUdaf(spark, "graft_topk16", 16)
    registerAdaptiveHistUdaf(spark, "graft_ahist64", 64)
  }
}
