package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{VectorFunctions => VF}

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VF.dot(col("a"), col("b")).as("d"),
      VF.norm(col("a")).as("n"),
      VF.cosine(col("a"), col("b")).as("c")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("cosine of zero vector is null, not NaN") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(df.select(VF.cosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("bruteForceTopK returns exact nearest neighbors in rank order") {
    // 2-D points: q=(1,0); corpus on known angles
    val corpus = Seq(
      (1L, Seq(1f, 0f)),    // sim 1.0 (excluded: same id as query)
      (2L, Seq(1f, 0.1f)),  // ~0.995
      (3L, Seq(1f, 1f)),    // ~0.707
      (4L, Seq(0f, 1f)),    // 0.0
      (5L, Seq(-1f, 0f))    // -1.0
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = VF.bruteForceTopK(queries, corpus, "q_id", "vec_id", "q_vec", "embedding", 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(2L, 3L, 4L))
  }

  test("lshBucketTopK finds the strong neighbors of the exact top-k") {
    val dim = 8
    // cluster A near (1,1,...,1), cluster B near (-1,...,-1,+noise dims)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1f else -1f
      (i.toLong, (0 until dim).map(d => base + 0.01f * ((i * 7 + d) % 5)).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val approx = VF.lshBucketTopK(queries, corpus, "q_id", "vec_id", "q_vec", "embedding",
      k = 5, dim = dim, nPlanes = 4, nTables = 8)
      .select("vec_id").as[Long].collect().toSet
    // all returned neighbors must be from the same (even-id) cluster
    assert(approx.nonEmpty && approx.forall(_ % 2 == 0))
  }

  test("cosineNearDupPairs: bucketed path is a verified subset of exact, recall >= 0.9") {
    val dir = TestSpark.Sf
    val emb = graft.Engine.table(spark, dir, "embeddings")
    // threshold 0.4 is the LSH-hostile low-s regime (see the operator's
    // Scaladoc): tune planes DOWN / tables up for recall — collision 0.63²
    // per table, miss (1−0.4)^8 ≈ 2% at s = 0.4. The default (8, 8) targets
    // s ≥ 0.9 dedup where fine buckets keep candidates sub-quadratic.
    def pairs(gate: Long) =
      VF.cosineNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4, dim = 64,
          exactGateRows = gate, nPlanes = 2, nTables = 8)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val exact = pairs(gate = Long.MaxValue)
    val bucketed = pairs(gate = 0L)
    assert(bucketed.subsetOf(exact), "bucketed path produced a pair the exact path lacks")
    assert(exact.nonEmpty)
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.9, s"bucketed recall $recall (${bucketed.size}/${exact.size})")
  }

  test("cosineNearDupPairs bucketed plan is an equi-join, no cartesian product") {
    val dir = TestSpark.Sf
    val emb = graft.Engine.table(spark, dir, "embeddings")
    val plan = VF.cosineNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4, dim = 64,
        exactGateRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product at scale:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join at scale:\n$plan")
  }

  test("quantizeInt8: codes in [0,255], reconstruction error <= scale/2") {
    val emb = graft.Engine.table(spark, TestSpark.Sf, "embeddings")
      .withColumn("qs", VF.quantizeInt8(col("embedding")))
      .withColumn("deq", VF.dequantize(col("qs")))
    val checked = emb.select(
      aggregate(col("qs.q"), lit(true),
        (acc, c) => acc && c >= 0 && c <= 255).as("codes_ok"),
      // max |x - x̂| over components vs scale/2 (+ tiny fp slack)
      aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")), col("deq"),
          (x, d) => abs(x - d)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"),
      (col("qs.qscale") / 2 + lit(1e-9)).as("bound"))
    assert(checked.filter(!col("codes_ok")).count() == 0)
    assert(checked.filter(col("max_err") > col("bound")).count() == 0)
  }

  test("quantized kNN keeps high recall vs the exact unquantized ranking") {
    val emb = graft.Engine.table(spark, TestSpark.Sf, "embeddings")
    val deq = emb.withColumn("deq", VF.dequantize(VF.quantizeInt8(col("embedding"))))
    def topIds(df: org.apache.spark.sql.DataFrame, vecCol: String): Map[Long, Set[Long]] = {
      val q = df.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col(vecCol).as("q_vec"))
      VF.bruteForceTopK(q, df.select(col("vec_id"), col(vecCol)), "q_id", "vec_id",
          "q_vec", vecCol, k = 10)
        .select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val exact = topIds(emb, "embedding")
    val quant = topIds(deq, "deq")
    val recalls = exact.map { case (qid, ids) =>
      (ids intersect quant(qid)).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 after int8 quantization: $mean")
  }
}

class VectorExpressionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.expressions.VectorExpressions

  test("native cosine equals HOF dot/norm composition bit-for-bit") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(0.1f, -0.2f, 0.3f), Seq(-1f, 2f, -3f))).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.cosineSimilarity(col("a"), col("b")).as("native"),
      (VF.dot(col("a"), col("b")) /
        (sqrt(VF.dot(col("a"), col("a"))) * sqrt(VF.dot(col("b"), col("b"))))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native cosine: zero vector -> null, length mismatch -> null") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("z", "v", "w")
    val r = df.select(
      VectorExpressions.cosineSimilarity(col("z"), col("v")),
      VectorExpressions.cosineSimilarity(col("v"), col("w"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("jaccardSorted equals set jaccard on hashed shingles") {
    val df = Seq(
      (Seq("ab", "bc", "cd"), Seq("bc", "cd", "de")),
      (Seq("xx", "xx", "yy"), Seq("yy", "zz")),   // duplicates collapse
      (Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    val out = df.select(
      VectorExpressions.jaccardSorted(
        sort_array(transform(col("x"), s => xxhash64(s))),
        sort_array(transform(col("y"), s => xxhash64(s)))).as("j"),
      graft.functions.TextFunctions.jaccard(col("x"), col("y")).as("ref"))
      .collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("jaccardSortedMin: exact J at/above threshold, -1 below, on random sets") {
    // random distinct-sorted long sets with mixed overlap levels
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val base = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextInt(80).toLong).distinct
      val keep = base.filter(_ => rnd.nextDouble() < rnd.nextDouble())
      val extra = Seq.fill(rnd.nextInt(40))(100L + rnd.nextInt(80))
      (base.sorted, (keep ++ extra).distinct.sorted)
    }
    val df = rows.toDF("x", "y")
    val t = 0.5
    val out = df.select(
      VectorExpressions.jaccardSortedMin(col("x"), col("y"), t).as("jm"),
      VectorExpressions.jaccardSorted(col("x"), col("y")).as("j"))
      .collect()
    assert(out.exists(_.getDouble(0) >= 0) && out.exists(_.getDouble(0) < 0),
      "test data must exercise both branches")
    out.foreach { r =>
      val (jm, j) = (r.getDouble(0), r.getDouble(1))
      if (j >= t) assert(math.abs(jm - j) < 1e-12, s"expected exact $j, got $jm")
      else assert(jm == -1.0, s"expected -1 sentinel for j=$j, got $jm")
    }
  }

  test("jaccardSortedMin: FP-safe at exact-boundary thresholds") {
    // the hazard class: A ⊂ B with J = |A|/|B| EXACTLY equal to the
    // threshold, B's extras sorted first so the merge hits its early-exit
    // check before any match — double rounding of K must never return -1
    // for these (the -1 margin in the kernel is what this pins)
    def pair(nA: Int, nB: Int): (Seq[Long], Seq[Long]) = {
      val a = (1 to nA).map(_.toLong)
      val extras = (1 to (nB - nA)).map(i => -i.toLong) // sort before a
      (a, (a ++ extras).sorted)
    }
    val cases = Seq(
      (0.8, 28, 35), (0.65, 13, 20), (0.9, 9, 10), (2.0 / 3.0, 2, 3),
      (0.5, 10, 20), (0.75, 3, 4))
    cases.foreach { case (t, nA, nB) =>
      val (x, y) = pair(nA, nB)
      val got = Seq((x, y)).toDF("x", "y")
        .select(VectorExpressions.jaccardSortedMin(col("x"), col("y"), t))
        .head.getDouble(0)
      assert(math.abs(got - nA.toDouble / nB) < 1e-12,
        s"t=$t |A|=$nA |B|=$nB: expected exact J=${nA.toDouble / nB}, got $got")
    }
  }

  test("jaccardSortedMin matches jaccardSorted across random thresholds") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map { _ =>
      val base = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextInt(80).toLong).distinct
      val keep = base.filter(_ => rnd.nextDouble() < rnd.nextDouble())
      val extra = Seq.fill(rnd.nextInt(40))(100L + rnd.nextInt(80))
      (base.sorted, (keep ++ extra).distinct.sorted)
    }
    val df = rows.toDF("x", "y")
    Seq(0.1, 0.3, 0.65, 0.8, 0.9, 0.99).foreach { t =>
      df.select(
        VectorExpressions.jaccardSortedMin(col("x"), col("y"), t).as("jm"),
        VectorExpressions.jaccardSorted(col("x"), col("y")).as("j"))
        .collect()
        .foreach { r =>
          val (jm, j) = (r.getDouble(0), r.getDouble(1))
          if (j >= t) assert(math.abs(jm - j) < 1e-12, s"t=$t: expected $j, got $jm")
          else assert(jm == -1.0, s"t=$t: expected -1 for j=$j, got $jm")
        }
    }
  }

  test("intersectSortedMin: exact |A∩B| when containment can reach the bar") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val base = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextInt(80).toLong).distinct
      val keep = base.filter(_ => rnd.nextDouble() < rnd.nextDouble())
      val extra = Seq.fill(rnd.nextInt(120))(100L + rnd.nextInt(200))
      (base.sorted, (keep ++ extra).distinct.sorted)
    }
    val df = rows.toDF("x", "y")
    val out = df.select(
      VectorExpressions.intersectSortedMin(col("x"), col("y"), 0.6).as("im"),
      col("x"), col("y")).collect()
    var hits = 0
    out.foreach { r =>
      val (x, y) = (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet)
      val trueI = (x intersect y).size.toLong
      val cont = trueI.toDouble / math.min(x.size, y.size)
      val im = r.getLong(0)
      if (cont >= 0.6) { assert(im == trueI, s"expected $trueI, got $im"); hits += 1 }
      else assert(im == -1L || im == trueI, // safety-margin pairs may surface
        s"below-bar pair must be -1 or exact, got $im (true $trueI)")
    }
    assert(hits > 0, "test data must contain high-containment pairs")
  }
}

class IvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("ivfTopK recovers the exact top-k for clustered data") {
    val emb = graft.Engine.table(spark, graft.TestSpark.Sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = VF.bruteForceTopK(queries, emb, "q_id", "vec_id", "q_vec", "embedding", 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VF.ivfTopK(queries, emb, "q_id", "vec_id", "q_vec", "embedding",
      k = 5, nCells = 8, nProbe = 6)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }
}
