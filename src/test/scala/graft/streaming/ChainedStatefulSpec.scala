package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Engine, TestSpark}

/** Feasibility + correctness of CHAINED stateful streaming operators
  * (supported since Spark 3.5 for dedup→time-window-agg in append mode):
  * exactly-once event dedup followed by a windowed aggregation in ONE
  * streaming query — the ingest-then-count shape that previously required
  * two queries with an intermediate sink.
  */
class ChainedStatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("events-chain")
    // deleteOnExit on dir + contents: a full parquet copy per run would
    // otherwise accumulate in /tmp (same concern as replayStream's cleanup)
    d.toFile.deleteOnExit()
    Engine.table(spark, TestSpark.Sf, "events").write.mode("overwrite").parquet(d.toString)
    d.toFile.listFiles().foreach(_.deleteOnExit())
    d.toString
  }
  private lazy val batch = spark.read.parquet(streamDir)

  test("dedup then daily windowed counts chain in one streaming query, equal to batch") {
    val stream = spark.readStream.schema(batch.schema).parquet(streamDir)
    val out = stream
      .withWatermark("ts", "10 days")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day_start"), col("event_type"), col("n"))
    val q = out.writeStream.outputMode("append").format("memory").queryName("chain").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("chain")
      .select(to_date(col("day_start")).as("day"), col("event_type"), col("n"))
    // append mode emits only windows the watermark has CLOSED; the last
    // open window(s) are withheld — compare on the emitted prefix
    val exp = batch
      .dropDuplicates("event_id")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val emittedDays = got.select("day").distinct().as[java.sql.Date].collect().toSet
    assert(emittedDays.nonEmpty, "no closed windows emitted")
    val expEmitted = exp.filter(col("day").isin(emittedDays.toSeq: _*))
    assert(got.count() == expEmitted.count())
    assert(got.except(expEmitted).isEmpty && expEmitted.except(got).isEmpty)
    spark.sql("DROP VIEW IF EXISTS chain")
  }
}
