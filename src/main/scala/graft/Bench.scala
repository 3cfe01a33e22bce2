package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is forced end-to-end with a noop-format
  * write (computes every column — `count()` would let Catalyst prune the
  * projections and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      try fn catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup: run EVERY query once at the smallest sf so the
    // timed sf0.1 numbers measure the plan, not first-touch classloading/JIT
    // (cold-start inflated individual queries 5-10x in testing).
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // min of two runs per query: first-touch JIT and ambient GC noise
    // inflated single-shot numbers up to 4x in testing. Caches from
    // query-internal persist() are dropped between queries so later queries
    // don't pay earlier queries' memory pressure.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val dt = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
        dt
      }
      val two = Seq(once(), once())
      // ambient host contention occasionally inflates BOTH samples of one
      // query 10-80x; when the two samples disagree wildly, buy one more
      val t = if (two.max / math.max(two.min, 1e-9) > 3.0) (two :+ once()).min else two.min
      name -> t
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
