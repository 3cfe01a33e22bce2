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

  test("bloom saturation monitor in one SQL statement") {
    ready
    // the MONITORING layer is SQL-authored like the sketch tier: the
    // report is one statement over the same cell derivation the Bloom
    // cells test builds — bit_count fill, the explicit left-assoc fill^k
    // product (f*f*f*f, the engine's reduce order), and the documented
    // 0.02 threshold
    val sql = spark.sql(
      """SELECT set_bits,
        |  set_bits / 4096.0D AS fill_ratio,
        |  (set_bits / 4096.0D) * (set_bits / 4096.0D)
        |    * (set_bits / 4096.0D) * (set_bits / 4096.0D) AS effective_fpp,
        |  (set_bits / 4096.0D) * (set_bits / 4096.0D)
        |    * (set_bits / 4096.0D) * (set_bits / 4096.0D) >= 0.02D AS recommend_rebuild
        |FROM (
        |  SELECT coalesce(sum(bit_count(bits)), 0) AS set_bits FROM (
        |    SELECT CAST(p / 32 AS INT) AS word,
        |      bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))) AS bits
        |    FROM (
        |      SELECT (CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 13), 16, 10) AS BIGINT)
        |            + i * CAST(conv(substring(md5(CAST(user_id AS STRING)), 14, 13), 16, 10) AS BIGINT))
        |            % 4096 AS p
        |      FROM ev LATERAL VIEW explode(sequence(0, 3)) t AS i
        |      WHERE user_id IS NOT NULL
        |    ) GROUP BY 1
        |  )
        |)""".stripMargin)
    val api = Bloom.saturationReport(
      Bloom.cells(spark.table("ev"), col("user_id").cast("string"), m = 4096, k = 4),
      m = 4096, k = 4)
    assert(rows(sql) == rows(api) && sql.count() == 1)
  }

  test("adaptive-scale PSI monitor in one SQL statement over cell views") {
    ready
    // psiByPeriodAdaptive's two halves — dyadic rebin to the coarsest
    // scale (guarded arithmetic shift) and the eps-floored PSI grid — as
    // one SQL statement over STORED cell tables (the standing-monitor
    // deployment shape: cells persist, the monitor is SQL on a schedule)
    val cutoff = "2024-01-07"
    val ev = spark.table("ev").where(col("value").isNotNull)
    AdaptiveHist.cells(
        ev.where(to_date(col("ts")) > lit(cutoff).cast("date"))
          .withColumn("day", to_date(col("ts"))),
        col("value"), maxBins = 16, Seq("day"))
      .createOrReplaceTempView("ahist_cells")
    AdaptiveHist.cells(
        ev.where(to_date(col("ts")) <= lit(cutoff).cast("date")),
        col("value"), maxBins = 16)
      .createOrReplaceTempView("ahist_ref")
    val sql = spark.sql(
      """WITH tgt AS (
        |  SELECT max(scale) AS ts FROM
        |    (SELECT scale FROM ahist_cells UNION ALL SELECT scale FROM ahist_ref)
        |), alc AS (
        |  SELECT day,
        |    CASE WHEN ts - scale >= 63 THEN CAST(CASE WHEN bin < 0 THEN -1 ELSE 0 END AS BIGINT)
        |         ELSE shiftright(bin, CAST(ts - scale AS INT)) END AS bin,
        |    sum(cnt) AS cnt
        |  FROM ahist_cells, tgt GROUP BY 1, 2
        |), alr AS (
        |  SELECT CASE WHEN ts - scale >= 63 THEN CAST(CASE WHEN bin < 0 THEN -1 ELSE 0 END AS BIGINT)
        |         ELSE shiftright(bin, CAST(ts - scale AS INT)) END AS bin,
        |    sum(cnt) AS cnt
        |  FROM ahist_ref, tgt GROUP BY 1
        |), tot AS (SELECT day, sum(cnt) AS tp FROM alc GROUP BY 1
        |), rt AS (SELECT sum(cnt) AS tr FROM alr
        |), bins AS (
        |  SELECT DISTINCT bin FROM (SELECT bin FROM alc UNION ALL SELECT bin FROM alr)
        |), grid AS (
        |  SELECT t.day,
        |    greatest(coalesce(c.cnt, 0) / CAST(t.tp AS DOUBLE), 1e-6D) AS p,
        |    greatest(coalesce(r.cnt, 0) / CAST(rt.tr AS DOUBLE), 1e-6D) AS q
        |  FROM tot t CROSS JOIN bins b CROSS JOIN rt
        |  LEFT JOIN alc c ON c.day = t.day AND c.bin = b.bin
        |  LEFT JOIN alr r ON r.bin = b.bin
        |)
        |SELECT day, sum((p - q) * ln(p / q)) AS psi FROM grid GROUP BY 1""".stripMargin)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    val api = graft.operators.Drift.psiByPeriodAdaptive(
        spark.table("ahist_cells"), "day", spark.table("ahist_ref"))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(sql.keySet == api.keySet && sql.nonEmpty)
    // identical term SETS summed by different physical plans — ulp-level
    // float-order tolerance (the documented cross-plan convention)
    sql.foreach { case (d, v) =>
      assert(math.abs(v - api(d)) < 1e-9, s"day $d: sql=$v api=${api(d)}")
    }
  }

  test("KS drift monitor in one SQL statement — bit-identical, not just ulp") {
    ready
    // Drift.ksByPeriod over persisted cell views: running integer sums
    // over the union bin spine, one division per side, max of |gaps| —
    // NO transcendental, so SQL and Dataset must agree EXACTLY (the PSI
    // cases tolerate summation-order ulp; KS has nothing to reorder)
    val ev = spark.table("ev").where(col("value").isNotNull)
    QuantileSketch.cells(
        ev.withColumn("day", to_date(col("ts"))), col("value"), 0.0, 512.0, 16,
        Seq("day"))
      .createOrReplaceTempView("ks_cells")
    QuantileSketch.cells(ev, col("value"), 0.0, 512.0, 16)
      .createOrReplaceTempView("ks_ref")
    val sql = spark.sql(
      """WITH tot AS (SELECT day, sum(cnt) AS tp FROM ks_cells GROUP BY 1
        |), rt AS (SELECT sum(cnt) AS tr FROM ks_ref
        |), bins AS (
        |  SELECT DISTINCT bin
        |  FROM (SELECT bin FROM ks_cells UNION ALL SELECT bin FROM ks_ref)
        |), grid AS (
        |  SELECT t.day, b.bin, t.tp, rt.tr,
        |    coalesce(c.cnt, 0) AS cp, coalesce(r.cnt, 0) AS cr
        |  FROM tot t CROSS JOIN bins b CROSS JOIN rt
        |  LEFT JOIN ks_cells c ON c.day = t.day AND c.bin = b.bin
        |  LEFT JOIN ks_ref r ON r.bin = b.bin
        |), cums AS (
        |  SELECT day,
        |    abs(sum(cp) OVER (PARTITION BY day ORDER BY bin
        |          ROWS UNBOUNDED PRECEDING) / CAST(tp AS DOUBLE)
        |      - sum(cr) OVER (PARTITION BY day ORDER BY bin
        |          ROWS UNBOUNDED PRECEDING) / CAST(tr AS DOUBLE)) AS d
        |  FROM grid
        |)
        |SELECT day, max(d) AS ks FROM cums GROUP BY 1""".stripMargin)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    val api = graft.operators.Drift.ksByPeriod(
        spark.table("ks_cells"), "day", spark.table("ks_ref"))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(sql.nonEmpty && sql == api)
  }

  test("embedding drift monitor in one SQL statement") {
    ready
    // Drift.embeddingPsiByPeriod's two halves — the posexplode marginal
    // cells at a declared (lo, hi, bins) and the keyed eps-floored PSI
    // grid (reference totals and bin spines per dimension) — as one SQL
    // statement over the raw embedding table: the standing deployment
    // persists the cells and schedules exactly this on a cadence
    Engine.table(spark, TestSpark.Sf, "embeddings").createOrReplaceTempView("emb")
    val sql = spark.sql(
      """WITH ex AS (
        |  SELECT label, posexplode(embedding) AS (dim, v) FROM emb
        |  WHERE embedding IS NOT NULL
        |), binned AS (
        |  SELECT label, dim,
        |    CAST(least(greatest(floor((CAST(v AS DOUBLE) - -0.75D)
        |      / ((0.75D - -0.75D) / 12)), 0), 11) AS BIGINT) AS bin
        |  FROM ex WHERE v IS NOT NULL
        |), cells AS (
        |  SELECT label, dim, bin, count(*) AS cnt FROM binned
        |  WHERE label <> 0 GROUP BY 1, 2, 3
        |), refc AS (
        |  SELECT dim, bin, count(*) AS cnt FROM binned WHERE label = 0 GROUP BY 1, 2
        |), tot AS (SELECT label, dim, sum(cnt) AS tp FROM cells GROUP BY 1, 2
        |), rt AS (SELECT dim, sum(cnt) AS tr FROM refc GROUP BY 1
        |), spine AS (
        |  SELECT DISTINCT dim, bin
        |  FROM (SELECT dim, bin FROM cells UNION ALL SELECT dim, bin FROM refc)
        |), grid AS (
        |  SELECT t.label, b.dim,
        |    greatest(coalesce(c.cnt, 0) / CAST(t.tp AS DOUBLE), 1e-6D) AS p,
        |    greatest(coalesce(r.cnt, 0) / CAST(rt.tr AS DOUBLE), 1e-6D) AS q
        |  FROM tot t
        |  JOIN spine b ON b.dim = t.dim
        |  JOIN rt ON rt.dim = b.dim
        |  LEFT JOIN cells c ON c.label = t.label AND c.dim = b.dim AND c.bin = b.bin
        |  LEFT JOIN refc r ON r.dim = b.dim AND r.bin = b.bin
        |)
        |SELECT label, dim, sum((p - q) * ln(p / q)) AS psi
        |FROM grid GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val emb = Engine.table(spark, TestSpark.Sf, "embeddings")
    val api = graft.operators.Drift.embeddingPsiByPeriod(
        emb.filter(col("label") =!= 0), "embedding", "label",
        emb.filter(col("label") === 0), lo = -0.75, hi = 0.75, bins = 12)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(sql.keySet == api.keySet && sql.nonEmpty)
    // identical term SETS summed by different physical plans — ulp-level
    // float-order tolerance (the documented cross-plan convention)
    sql.foreach { case (k, v) =>
      assert(math.abs(v - api(k)) < 1e-9, s"$k: sql=$v api=${api(k)}")
    }
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

  test("reference rotation in one SQL statement") {
    // Drift.rotateReference as plain SQL over a persisted cell table —
    // trailing-k period spine + cell-wise re-aggregation
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val rnd = new scala.util.Random(7)
    val cells = spark.createDataFrame((for {
      d <- 1 to 5; k <- Seq("a", "b"); b <- 0L to 3L
    } yield (s"d$d", k, b, (rnd.nextInt(40) + 1).toLong)))
      .toDF("day", "key", "bin", "cnt")
    cells.createOrReplaceTempView("rot_cells")
    val sql = spark.sql(
      """SELECT key, bin, sum(cnt) AS cnt FROM rot_cells
        |WHERE day IN (
        |  SELECT day FROM (SELECT DISTINCT day FROM rot_cells
        |                   ORDER BY day DESC LIMIT 2))
        |GROUP BY key, bin""".stripMargin)
    val api = graft.operators.Drift.rotateReference(
      cells, "day", 2, keyCols = Seq("key"))
    assert(rows(sql) == rows(api) && sql.count() > 0)
  }

  test("state-audit cheap checks in one SQL statement each over persisted halves") {
    // auditState's three INEXPENSIVE invariants (ids_unique,
    // postings_ids_covered, bench_words_bounded) as plain SQL over the
    // persisted state halves — what an ops dashboard schedules against the
    // parquet directly; the heavy multiset-equality checks stay Dataset
    // because their cost class (a fresh build) is the point. Each SQL
    // count is asserted equal to the auditState row on BOTH a clean state
    // and one with a seeded violation per check.
    import graft.operators.{Curation, Decontaminate}
    val docs = Engine.table(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .where(col("doc_id") % 7 === 0) // deterministic subset (limit() is not)
    val idx = Curation.signatures(docs, "doc_id", "text", "lang")
    val (freq, posts) = Curation.postingsIndex(idx, "doc_id", "lang", 0.5)
    val bi = Decontaminate.benchIndex(
      docs.where(col("doc_id") % 70 === 0), "doc_id", "text", 4, 512, 3)
    val words = (bi.m + 31) / 32
    // seeded violations: a duplicated signature id, an orphan postings id,
    // an out-of-range bloom word
    val idxDup = idx.unionAll(idx.limit(1))
    val orphan = posts.limit(1).withColumn("doc_id", lit(-999L))
    val postsOrphan = posts.unionAll(orphan)
    val badCell = bi.bloomCells.limit(1).withColumn("word", lit(words + 7))
    val cellsBad = bi.bloomCells.unionAll(badCell)
    def auditObserved(ix: org.apache.spark.sql.DataFrame,
        ps: org.apache.spark.sql.DataFrame,
        cells: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Curation.auditState(ix, ps, freq, freq,
          Some(bi.copy(bloomCells = cells)), "doc_id", "lang")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sqlObserved(): Map[String, Long] = Map(
      "ids_unique" -> spark.sql(
        """SELECT count(*) FROM (
          |  SELECT doc_id FROM audit_idx GROUP BY doc_id HAVING count(*) > 1
          |)""".stripMargin).head().getLong(0),
      "postings_ids_covered" -> spark.sql(
        """SELECT count(*) FROM (
          |  SELECT DISTINCT p.doc_id FROM audit_posts p
          |  LEFT ANTI JOIN audit_idx i ON p.doc_id = i.doc_id
          |)""".stripMargin).head().getLong(0),
      "bench_words_bounded" -> spark.sql(
        s"""SELECT count(*) FROM audit_bcells
           |WHERE word < 0 OR word >= $words""".stripMargin).head().getLong(0))
    for ((ix, ps, cells, seeded) <- Seq(
        (idx, posts, bi.bloomCells, false),
        (idxDup, postsOrphan, cellsBad, true))) {
      ix.createOrReplaceTempView("audit_idx")
      ps.createOrReplaceTempView("audit_posts")
      cells.createOrReplaceTempView("audit_bcells")
      val audit = auditObserved(ix, ps, cells)
      val sqlC = sqlObserved()
      for ((check, got) <- sqlC)
        assert(got == audit(check), s"$check: SQL $got vs auditState ${audit(check)}")
      if (seeded)
        assert(sqlC("ids_unique") == 1L && sqlC("postings_ids_covered") == 1L &&
          sqlC("bench_words_bounded") == 1L, s"seeded violations not all caught: $sqlC")
      else assert(sqlC.values.forall(_ == 0L), s"clean state read dirty: $sqlC")
    }
  }
}
