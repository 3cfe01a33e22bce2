package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, GraftExtensions, TestSpark}

/** The sketch tier's SQL surface (VERDICT r7 item 8): every member of the
  * tier is reachable from `spark.sql` — CMS / HLL / fixed-bin histogram
  * cells are plain SQL over stock functions (md5/conv/floor + GROUP BY,
  * exactly what their DuckDB oracles replay), and the two
  * Aggregator-backed members (KMV bottom-k, ES/top-k) register as named
  * UDAFs via GraftExtensions.registerSketchUdafs. Each test is ONE SQL
  * statement asserted cell-identical to the Dataset-API build.
  */
class SketchSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val ready: Unit = {
    GraftExtensions.registerSketchUdafs(spark)
    Engine.table(spark, TestSpark.Sf, "events").createOrReplaceTempView("ev")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("Count-Min cells in one SQL statement") {
    ready
    val sql = spark.sql(
      """SELECT d, bucket, count(*) AS cnt FROM (
        |  SELECT posexplode(array(
        |    CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 32,
        |    CAST(conv(substring(md5(CAST(user_id AS STRING)), 9, 8), 16, 10) AS BIGINT) % 32)) AS (d, bucket)
        |  FROM ev WHERE user_id IS NOT NULL
        |) GROUP BY d, bucket""".stripMargin)
    val api = CountMin.sketch(
      spark.table("ev"), col("user_id").cast("string"), depth = 2, width = 32)
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("HyperLogLog cells in one SQL statement") {
    ready
    val sql = spark.sql(
      """SELECT event_type,
        |  CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 128 AS bucket,
        |  max(CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)), 9, 8), 16, 10) AS BIGINT) = 0
        |      THEN 33
        |      ELSE instr(lpad(bin(CAST(conv(substring(md5(CAST(user_id AS STRING)), 9, 8), 16, 10) AS BIGINT)), 32, '0'), '1')
        |      END) AS r
        |FROM ev WHERE user_id IS NOT NULL GROUP BY 1, 2""".stripMargin)
    val api = HyperLogLog.cells(
      spark.table("ev"), col("user_id").cast("string"), p = 7, Seq("event_type"))
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("fixed-bin histogram cells in one SQL statement") {
    ready
    val sql = spark.sql(
      """SELECT CAST(least(greatest(floor((value - 0.0D) / 2.0D), 0), 255) AS BIGINT) AS bin,
        |  count(*) AS cnt
        |FROM ev WHERE value IS NOT NULL GROUP BY 1""".stripMargin)
    val api = QuantileSketch.cells(
      spark.table("ev"), col("value"), lo = 0.0, hi = 512.0, bins = 256)
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("Bloom filter cells in one SQL statement") {
    ready
    // (h1 + i*h2) mod m over the two disjoint 13-hex md5 slices, 32-bit
    // words, bit_or — all stock SQL (no UDAF needed)
    val sql = spark.sql(
      """SELECT CAST(p / 32 AS INT) AS word,
        |  bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))) AS bits
        |FROM (
        |  SELECT (CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 13), 16, 10) AS BIGINT)
        |        + i * CAST(conv(substring(md5(CAST(user_id AS STRING)), 14, 13), 16, 10) AS BIGINT))
        |        % 4096 AS p
        |  FROM ev LATERAL VIEW explode(sequence(0, 3)) t AS i
        |  WHERE user_id IS NOT NULL
        |) GROUP BY 1""".stripMargin)
    val api = Bloom.cells(
      spark.table("ev"), col("user_id").cast("string"), m = 4096, k = 4)
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("KMV sketch cells in one SQL statement (graft_kmv16)") {
    ready
    val sql = spark.sql(
      """SELECT event_type, CAST(pos + 1 AS INT) AS rk, h,
        |  element_at(buf.items, pos + 1) AS item
        |FROM (
        |  SELECT event_type, graft_kmv16(
        |    CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 13), 16, 10) AS BIGINT),
        |    CAST(user_id AS STRING)) AS buf
        |  FROM ev WHERE user_id IS NOT NULL GROUP BY event_type
        |) LATERAL VIEW posexplode(buf.hs) t AS pos, h""".stripMargin)
    val api = Kmv.cells(
      spark.table("ev").where(col("user_id").isNotNull),
      col("user_id").cast("string"), k = 16, Seq("event_type"))
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("adaptive dyadic histogram cells in one SQL statement (graft_ahist64)") {
    ready
    val sql = spark.sql(
      """SELECT event_type, buf.scale AS scale, b AS bin,
        |  element_at(buf.cnts, pos + 1) AS cnt
        |FROM (
        |  SELECT event_type, graft_ahist64(CAST(value AS DOUBLE)) AS buf
        |  FROM ev WHERE value IS NOT NULL GROUP BY event_type
        |) LATERAL VIEW posexplode(buf.bins) t AS pos, b""".stripMargin)
    val api = AdaptiveHist.cells(
      spark.table("ev").where(col("value").isNotNull),
      col("value"), maxBins = 64, Seq("event_type"))
    assert(rows(sql) == rows(api) && sql.count() > 0)
    // the raw SQL surface sees unfiltered columns: NULLs skip like any
    // SQL aggregate (no NPE, no phantom bin) — same cells as filtered
    val noFilter = spark.sql(
      """SELECT event_type, buf.scale AS scale, b AS bin,
        |  element_at(buf.cnts, pos + 1) AS cnt
        |FROM (
        |  SELECT event_type, graft_ahist64(CAST(value AS DOUBLE)) AS buf
        |  FROM ev GROUP BY event_type
        |) LATERAL VIEW posexplode(buf.bins) t AS pos, b""".stripMargin)
    assert(rows(noFilter) == rows(api))
  }

  test("ES weighted sample in one SQL statement (graft_topk16)") {
    ready
    val sql = spark.sql(
      """SELECT event_type, CAST(pos + 1 AS INT) AS rank,
        |  element_at(buf.ids, pos + 1) AS id,
        |  element_at(buf.tags, pos + 1) AS weight,
        |  sim AS es_key
        |FROM (
        |  SELECT event_type, graft_topk16(
        |    ln((CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 13), 16, 10) AS BIGINT) + 0.5D)
        |       / 4503599627370496.0D) / CAST(floor(value) AS BIGINT),
        |    event_id, CAST(floor(value) AS BIGINT)) AS buf
        |  FROM ev
        |  WHERE value IS NOT NULL AND floor(value) > 0 AND event_id IS NOT NULL
        |  GROUP BY event_type
        |) LATERAL VIEW posexplode(buf.sims) t AS pos, sim""".stripMargin)
    val api = graft.operators.WeightedSample.sample(
      spark.table("ev"), "event_type", "event_id",
      floor(col("value")).cast("long"), k = 16)
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }
}
