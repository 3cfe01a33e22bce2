package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  /** Max per-task shuffle-read RECORDS across the job — the deterministic
    * task-metric form of "one reducer got the whole hot key" (task TIME
    * flaps with host load; record counts don't).
    */
  private def maxTaskShuffleRecords(action: => Unit): Long = {
    val listener = new SparkListener {
      @volatile var max = 0L
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          if (r > max) max = r
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // listener events are posted asynchronously; poll to a short deadline
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline && listener.max != last) {
        last = listener.max
        Thread.sleep(300)
      }
      listener.max
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("planted 100:1 hot key: salting caps the max reducer's records") {
    // 100:1 skew at a size where one reducer would eat ~50k records
    val n = 50000
    val hot = (1 to n).map(i => (0L, i.toDouble))
    val cold = (1 to n / 100).map(i => ((i % 100 + 1).toLong, i.toDouble))
    val left = (hot ++ cold).toDF("k", "v").repartition(8)
    val dim = (0L to 100L).map(i => (i, s"name_$i")).toDF("k", "name")
    // isolate OUR mitigation: no broadcast fallback, and AQE fully off —
    // at test scale AQE's partition COALESCING folds the whole join into
    // one task, which would hide the reducer-level comparison entirely
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      // enough reducers that the 16 salt sub-keys don't hash-collide into
      // the same few partitions (which would re-concentrate the hot key)
      "spark.sql.shuffle.partitions" -> "32") {
      def run(df: DataFrame): Long = maxTaskShuffleRecords {
        df.write.format("noop").mode("overwrite").save()
      }
      val plainMax = run(left.join(dim, Seq("k")).select(col("k"), col("v"), col("name")))
      val saltedMax = run(
        Skew.saltedJoin(left, dim, "k", buckets = 16)
          .select(col("k"), col("v"), col("name")))
      // the plain join funnels every hot row through one reducer …
      assert(plainMax >= n * 9L / 10, s"plain join max-task records only $plainMax")
      // … salting spreads them over the 16 sub-keys: the worst task must
      // carry well under a quarter of the hot key (16 buckets + slack for
      // whatever else lands on that reducer)
      assert(saltedMax < plainMax / 4,
        s"salted max-task records $saltedMax not < plain $plainMax / 4")
    }
  }

  test("AQE's skew-join split engages on the same planted skew") {
    val n = 50000
    val hot = (1 to n).map(i => (0L, i.toDouble))
    val cold = (1 to n / 100).map(i => ((i % 100 + 1).toLong, i.toDouble))
    val left = (hot ++ cold).toDF("k", "v").repartition(8)
    val dim = (0L to 100L).map(i => (i, s"name_$i")).toDF("k", "name")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the planted hot partition is ~1-2 MB; drop AQE's thresholds so it
      // counts as skewed at test scale
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = left.join(dim, Seq("k")).select(col("k"), col("v"), col("name"))
      // collect() executes THIS Dataset's QueryExecution (write() would plan
      // a fresh one and leave this plan un-finalized)
      assert(joined.collect().length == n + n / 100)
      // the FINAL adaptive plan marks the split sort-merge join skew=true
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    }
  }

  test("saltedAgg equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), buckets = 8,
      partial = Seq(count(lit(1)).as("c"), sum(col("v")).as("s")),
      merge = Seq(sum(col("c")).as("c"), sum(col("s")).as("s")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "name")
    val direct = skewed.join(dim, Seq("k")).groupBy("k", "name").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8).groupBy("k", "name").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }
}
