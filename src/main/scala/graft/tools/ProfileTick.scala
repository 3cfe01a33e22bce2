package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFunctions
import graft.operators.{Curation, Pin, SimilarityJoin}

/** One-off stage profiler for the q248 indexed-tick loop: replays the
  * harness with a timer around every materialization so a scale-sweep
  * outlier can be attributed to a stage instead of guessed at. Diagnostic
  * only — never part of a bench or oracle gate.
  *
  * Usage: runMain graft.tools.ProfileTick [sfDir]
  */
object ProfileTick {

  // mirrors SparkEntry's shared stopword list (private there)
  private val Stopwords =
    Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF  $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def mat(label: String, df: DataFrame): DataFrame =
      tm(label) { val p = Pin.LocalCheckpoint(df); p.count(); p }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val (x80, x90) = (mx * 4 / 5, mx * 9 / 10)
    val bench = docs.filter(col("doc_id") < x80 && col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") < x80 && col("doc_id") % 50 =!= 0)
    val b1 = docs.filter(col("doc_id") >= x80 && col("doc_id") < x90)
    val b2 = docs.filter(col("doc_id") >= x90)
    def q = TextFunctions.qualityScore(col("text"), Stopwords)

    val idx0 = mat("idx0 signatures",
      Curation.signatures(corpus, "doc_id", "text", "lang"))

    // tick 1, stage by stage (mirrors Curation.tickIndexed)
    def tickStages(tag: String, index: DataFrame, batch: DataFrame): DataFrame = {
      val s1 = batch.filter(q >= 0.5)
      val contaminated = graft.operators.Decontaminate
        .sharedGramCounts(s1, bench, "doc_id", "text", 4)
        .filter(col("shared_grams") >= 5)
        .select(col("doc_id"))
      val s2 = s1.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      val dg = sha2(col("text"), 256)
      val keepMin = s2.groupBy(dg.as("_ctext")).agg(min(col("doc_id")).as("_keep"))
      val s3 = mat(s"$tag s1-s3 quality+decont+digest", s2
        .join(keepMin, dg <=> col("_ctext"))
        .filter(col("doc_id") === col("_keep")).drop("_ctext", "_keep")
        .join(index.select(col("_dg").as("_ctext")).distinct(),
          dg === col("_ctext"), "left_anti"))
      val batchSh = mat(s"$tag batch signatures",
        Curation.signatures(s3, "doc_id", "text", "lang").drop("_dg"))
      val corpusMatched = tm(s"$tag cross jaccardJoin vs index") {
        val m = SimilarityJoin.jaccardJoin(
          index.select(col("doc_id").as("_cid"), col("lang"), col("_h")), "_cid",
          batchSh, "doc_id", "_h", 0.5, blockCols = Seq("lang"),
          leftPinned = true, rightPinned = true)
          .select(col("doc_id")).distinct()
        val p = Pin.LocalCheckpoint(m); p.count(); p
      }
      val free = mat(s"$tag free anti-join",
        batchSh.join(broadcast(corpusMatched), Seq("doc_id"), "left_anti"))
      val selfPairs = tm(s"$tag self-join within batch") {
        val sp = SimilarityJoin.jaccardSelfJoin(
          free, "doc_id", "_h", 0.5, blockCols = Seq("lang"), inputPinned = true)
        val p = Pin.LocalCheckpoint(sp); p.count(); p
      }
      val dominated = tm(s"$tag greedy resolution") {
        val d = Curation.greedyDominated(selfPairs, "id_a", "id_b")
          .withColumnRenamed("id", "doc_id")
        val p = Pin.LocalCheckpoint(d); p.count(); p
      }
      mat(s"$tag accepted",
        s3.join(broadcast(corpusMatched.unionByName(dominated)), Seq("doc_id"), "left_anti"))
    }

    val acc1 = tickStages("t1", idx0, b1)
    val app1 = mat("append signatures(acc1)",
      Curation.signatures(acc1, "doc_id", "text", "lang"))
    val idx1 = idx0.unionByName(app1)
    val acc2 = tickStages("t2", idx1, b2)
    tm("final agg") {
      acc1.unionByName(acc2)
        .select(col("doc_id"), col("lang"),
          greatest(TextFunctions.tokenCount(col("text")), lit(0)).cast("long").as("toks"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
