package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** StreamOps.transitions: per-user event-type transitions with O(1) state
  * per user, equal to the batch lead() window — including when the
  * transition spans a micro-batch boundary (the case the state exists for).
  */
class TransitionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("transitions carry state across micro-batches and match the batch window") {
    val d = Files.createTempDirectory("trans-stream")
    d.toFile.deleteOnExit()
    // batch 1: user 1 -> a, b ; user 2 -> x
    Seq(
      StreamOps.TypedEvent(1L, ts(0), 1L, "a"),
      StreamOps.TypedEvent(1L, ts(1), 2L, "b"),
      StreamOps.TypedEvent(2L, ts(0), 3L, "x"))
      .toDF().write.mode("overwrite").parquet(d.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(d.toString).schema)
      .parquet(d.toString)
    val q = StreamOps.transitions(spark, stream.as[StreamOps.TypedEvent])
      .writeStream.outputMode("append").format("memory").queryName("trans").start()
    try {
      q.processAllAvailable()
      // batch 2 (new files appended after the first trigger drained):
      // user 1 -> c (cross-batch transition b->c), user 2 -> y
      Seq(
        StreamOps.TypedEvent(1L, ts(2), 4L, "c"),
        StreamOps.TypedEvent(2L, ts(1), 5L, "y"))
        .toDF().write.mode("append").parquet(d.toString)
      q.processAllAvailable()
      val got = spark.table("trans").as[StreamOps.Transition].collect()
        .map(t => (t.src, t.dst)).sorted.toSeq
      assert(got == Seq(("a", "b"), ("b", "c"), ("x", "y")))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS trans")
    }
  }

  test("within-batch events fold in (ts, event_id) order, not arrival order") {
    val d = Files.createTempDirectory("trans-order")
    d.toFile.deleteOnExit()
    // same timestamp: event_id breaks the tie; rows written out of order
    Seq(
      StreamOps.TypedEvent(7L, ts(1), 12L, "late"),
      StreamOps.TypedEvent(7L, ts(0), 10L, "first"),
      StreamOps.TypedEvent(7L, ts(1), 11L, "mid"))
      .toDF().coalesce(1).write.mode("overwrite").parquet(d.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(d.toString).schema)
      .parquet(d.toString)
    val q = StreamOps.transitions(spark, stream.as[StreamOps.TypedEvent])
      .writeStream.outputMode("append").format("memory").queryName("trans2").start()
    try {
      q.processAllAvailable()
      val got = spark.table("trans2").as[StreamOps.Transition].collect()
        .map(t => (t.src, t.dst)).toSeq.sorted
      assert(got == Seq(("first", "mid"), ("mid", "late")))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS trans2")
    }
  }
}
