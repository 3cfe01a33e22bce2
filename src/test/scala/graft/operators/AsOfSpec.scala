package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 102.0),
    ("B", ts("2024-01-01 10:03:00"), 200.0)).toDF("sym", "qts", "price")

  val trades = Seq(
    ("A", ts("2024-01-01 10:04:00"), 1L), // -> 100.0 (10:00)
    ("A", ts("2024-01-01 10:05:00"), 2L), // -> 101.0 (exact time matches, <=)
    ("A", ts("2024-01-01 10:20:00"), 3L), // -> 102.0 (10:10)
    ("B", ts("2024-01-01 10:02:00"), 4L), // -> null (no prior quote)
    ("B", ts("2024-01-01 10:04:00"), 5L)  // -> 200.0
  ).toDF("sym", "tts", "trade_id")

  test("backward as-of join picks the latest quote at or before each trade") {
    val out = AsOf.asofBackward(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("trade_id")
      .select("trade_id", "price")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq
    assert(out == Seq(
      (1L, Some(100.0)), (2L, Some(101.0)), (3L, Some(102.0)),
      (4L, None), (5L, Some(200.0))))
  }

  test("tolerance discards stale matches") {
    val out = AsOf.asofBackward(trades, quotes, Seq("sym"), "tts", "qts",
      toleranceSeconds = Some(300.0))
      .orderBy("trade_id")
      .select("trade_id", "price")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq
    // trade 3 at 10:20 is 600s after the 10:10 quote -> discarded
    assert(out(2) == ((3L, None)))
    assert(out(0) == ((1L, Some(100.0))))
  }

  test("nearest as-of picks the |gap|-minimizing side, ties and exact hits backward") {
    val out = AsOf.asofNearest(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("trade_id")
      .select("trade_id", "price", "asof_gap_s")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    // trade 1 at 10:04: back=10:00 (240s), fwd=10:05 (60s) -> forward, gap -60
    assert(out(0) == ((1L, 101.0, -60.0)))
    // trade 2 at 10:05 exact -> backward match at distance 0
    assert(out(1) == ((2L, 101.0, 0.0)))
    // trade 3 at 10:20: only backward exists (10:10) -> +600
    assert(out(2) == ((3L, 102.0, 600.0)))
    // trade 4 at 10:02: back none, fwd=10:03 -> forward, gap -60
    assert(out(3) == ((4L, 200.0, -60.0)))
    // trade 5 at 10:04: back=10:03 (60s); no forward -> backward +60
    assert(out(4) == ((5L, 200.0, 60.0)))
  }

  test("nearest as-of: exact |gap| tie resolves backward") {
    val right = Seq(("A", ts("2024-01-01 10:00:00"), 1.0), ("A", ts("2024-01-01 10:02:00"), 2.0))
      .toDF("sym", "qts", "v")
    val left = Seq(("A", ts("2024-01-01 10:01:00"), 9L)).toDF("sym", "tts", "id")
    val r = AsOf.asofNearest(left, right, Seq("sym"), "tts", "qts").head()
    assert(r.getDouble(r.fieldIndex("v")) == 1.0)
    assert(r.getDouble(r.fieldIndex("asof_gap_s")) == 60.0)
  }
}
