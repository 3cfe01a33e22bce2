package graft.ml

import org.apache.spark.ml.feature.{StandardScaler, StandardScalerModel, VectorAssembler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering recipes (SURVEY.md §2.9 M1–M3, M26).
  *
  * The reference's sklearn preprocessing (StandardScaler fit on train /
  * transform both, 乳腺癌预测.py:93-95; stratified and chronological splits)
  * re-expressed on spark.ml. All splits are seeded and deterministic.
  */
object Features {

  /** M1 — assemble `cols` into a vector column and standardize (mean 0/std 1)
    * fitting ONLY on `fit` (train) and transforming any frame via the
    * returned model — the fit-on-train discipline the reference follows.
    */
  def standardize(
      fit: DataFrame,
      cols: Seq[String],
      outputCol: String = "features"): (StandardScalerModel, DataFrame => DataFrame) = {
    val assembler = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("_raw")
    val scaler = new StandardScaler()
      .setInputCol("_raw")
      .setOutputCol(outputCol)
      .setWithMean(true)
      .setWithStd(true)
    val model = scaler.fit(assembler.transform(fit))
    (model, df => model.transform(assembler.transform(df)).drop("_raw"))
  }

  /** M2 — stratified train/test split: per-label sampling at `trainFraction`
    * (seeded) + anti-join for the complement. Matches sklearn
    * `train_test_split(stratify=y)` semantics up to sampling granularity.
    */
  def stratifiedSplit(
      df: DataFrame,
      labelCol: String,
      trainFraction: Double,
      seed: Long,
      idCol: String): (DataFrame, DataFrame) = {
    val labels = df.select(labelCol).distinct().collect().map(_.get(0))
    val fractions = labels.map(_ -> trainFraction).toMap
    val train = df.stat.sampleBy(labelCol, fractions, seed)
    val test = df.join(train.select(idCol), Seq(idCol), "left_anti")
    (train, test)
  }

  /** Deterministic hash split (the 100-TB splitting idiom): assign each row
    * a named split from its id alone via a Knuth multiplicative hash —
    * unlike `randomSplit`/`sampleBy`, the assignment is independent of
    * partition layout, run, engine, and Spark version, so train/val/test
    * membership is stable across the lifetime of a corpus (and re-derivable
    * by any other system from the id). All arithmetic is exact int64:
    * bucket = ((id * 2654435761) mod 2³²) * buckets >> 32.
    *
    * `cuts` are (name, upperBoundExclusive) pairs over [0, buckets),
    * ascending, last bound == buckets — e.g. Seq(("train",80), ("val",90),
    * ("test",100)).
    */
  def hashSplit(
      id: org.apache.spark.sql.Column,
      cuts: Seq[(String, Int)],
      buckets: Int = 100): org.apache.spark.sql.Column = {
    require(cuts.nonEmpty && cuts.last._2 == buckets && cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must ascend to $buckets")
    val bucket = shiftright(pmod(id * lit(2654435761L), lit(4294967296L)) * lit(buckets), 32)
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic per-group sample: the first `n` rows of each group in
    * Knuth-multiplicative-hash order of the id (same exact-int64 hash as
    * `hashSplit`). Unlike `sampleBy` the selection is independent of
    * partition layout, run, and engine — the sample is a stable property of
    * the data, re-derivable by any system from the ids — and unlike a
    * Bernoulli sample the per-group count is exact.
    *
    * Ranking rides the bounded-heap top-k aggregator (map-side partial
    * top-n per group before the exchange), NOT a row_number window — the
    * shuffle carries O(groups · n · map_partitions) rows, not every row.
    * Returns (groupCol, rank, id) with rank 1..n in hash order.
    */
  def deterministicSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int): DataFrame = {
    // TopK ranks by sim DESC; negate the hash so the smallest hash wins.
    // Hash values are < 2^32 — exact in double. Ties (same hash) break by
    // ascending id inside the aggregator.
    val h = pmod(col(idCol) * lit(2654435761L), lit(4294967296L))
    graft.functions.TopK
      .topKPerKey(
        df.select(col(groupCol), col(idCol)),
        groupCol,
        -h.cast("double"),
        col(idCol),
        lit(0L),
        n)
      .select(col(groupCol), col("rank"), col("id").as(idCol))
  }

  /** Weighted deterministic sample without replacement (Efraimidis–Spirakis
    * A-ES): rank rows per group by key = u^(1/w) descending, where u ∈ (0,1)
    * derives from xxhash64 of the id — P(row in a size-1 sample) is exactly
    * w_i/Σw, and larger samples remain weight-proportional without
    * replacement. Deterministic from (id, weight) alone: any system
    * implementing xxhash64 re-derives the same membership. NOTE: this is a
    * DIFFERENT ordering than `deterministicSample` (which ranks by smallest
    * Knuth hash) — equal weights here do NOT reproduce that sample.
    * Rides the same bounded-heap top-k aggregator — map-side partial top-n,
    * no full-group window shuffle. Rows with weight <= 0 are excluded.
    * Returns (groupCol, rank, id).
    */
  def weightedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      n: Int): DataFrame = {
    // u in (0,1) from xxhash64, NOT the Knuth multiplicative hash: the
    // latter is linear in the id (h(id+1) − h(id) ≡ const mod 2^32), so
    // consecutive ids' u values are perfectly correlated and the A-ES
    // inclusion law breaks; xxhash64 avalanches. +0.5 keeps u strictly
    // positive so pow(u, 1/w) never collapses to 0
    val u = (pmod(xxhash64(col(idCol)), lit(4294967296L)) + lit(0.5)) /
      lit(4294967296.0)
    val key = pow(u, lit(1.0) / col(weightCol))
    graft.functions.TopK
      .topKPerKey(
        df.filter(col(weightCol) > 0).select(col(groupCol), col(idCol), col(weightCol)),
        groupCol,
        key,
        col(idCol),
        lit(0L),
        n)
      .select(col(groupCol), col("rank"), col("id").as(idCol))
  }

  /** Soft (probabilistic) filtering — the DCLM/FineWeb-style quality screen
    * that keeps each row INDEPENDENTLY with its own probability instead of a
    * hard threshold: keep row i iff u(id_i) < p_i, where u derives from an
    * overflow-safe Knuth multiplicative hash of the id. Deterministic from
    * (id, p) alone — any engine re-derives the same membership with four
    * integer ops (no RNG state, no seed plumbing, exactly reproducible in
    * plain SQL), so a 100 TB corpus filtered twice yields byte-identical
    * splits. Narrow-and-deterministic beats avalanche here: the decision is
    * per-row against its own p, not an order statistic across rows (contrast
    * [[weightedSample]]'s A-ES keys, where Knuth linearity would break the
    * inclusion law — documented there). The hash's lattice structure makes
    * consecutive ids a low-discrepancy sequence — at equal p this behaves
    * like systematic sampling (slightly LOWER variance than iid Bernoulli).
    *
    * `probCol` is clamped to [0, 1]. Pure projection + filter: fully
    * pushdown-friendly, no shuffle, codegen'd end-to-end.
    */
  def softSample(df: DataFrame, idCol: String, probCol: Column): DataFrame = {
    val u = knuthHashU32(col(idCol)).cast("double") / lit(4294967296.0)
    // NULL p drops the row (coalesce to 0), matching a strict-SQL
    // re-derivation where `u < NULL` filters — Spark's least/greatest skip
    // nulls, which would otherwise clamp NULL to keep-always
    df.filter(u < greatest(least(coalesce(probCol, lit(0.0)), lit(1.0)), lit(0.0)))
  }

  /** Overflow-safe Knuth multiplicative hash of an integer id into
    * [0, 2^32): (id mod 2^31) · 2654435761 mod 2^32. The inner mod keeps
    * the product < 2^63 — exact long arithmetic at any id scale (a raw
    * id·m product overflows past id ~ 3.4e9) — and the whole expression is
    * four integer ops re-derivable in plain SQL, so every engine computes
    * the identical value. SHARED single source for the deterministic
    * sampling/ordering family ([[softSample]], graft.text.Dsir.resample,
    * graft.operators.Packing.shardByTokenBudget) — their SQL oracles
    * mirror this form literally; change it here and ONLY here.
    */
  def knuthHashU32(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** M2 (exact form) — stratified split with sklearn's EXACT per-class
    * counts (`train_test_split(stratify=y)` takes ⌈n_c·frac⌉ per class, not
    * a Bernoulli sample): rows are ranked per label by a seeded hash of the
    * id (deterministic, data-independent shuffle order), and the first
    * ⌈n_c·trainFraction⌉ of each class go to train. One shuffle on the
    * label; counts are exact for every class, every run, every partitioning.
    */
  def stratifiedSplitExact(
      df: DataFrame,
      labelCol: String,
      trainFraction: Double,
      seed: Long,
      idCol: String): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    val ranked = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col(labelCol))))
      .withColumn("_take", ceil(col("_n") * lit(trainFraction)))
    (ranked.filter(col("_rn") <= col("_take")).drop("_rn", "_n", "_take"),
      ranked.filter(col("_rn") > col("_take")).drop("_rn", "_n", "_take"))
  }

  /** M3 — chronological split on an order column (the COVID 191/9 split,
    * 新冠疫情分析.py:93-97): train = order ≤ cut, test = order > cut.
    */
  def chronologicalSplit(df: DataFrame, orderCol: String, cut: Any): (DataFrame, DataFrame) =
    (df.filter(col(orderCol) <= lit(cut)), df.filter(col(orderCol) > lit(cut)))

  /** Random Fourier features (Rahimi & Recht 2007, the sklearn RBFSampler):
    * z(x) = √(2/D)·cos(Wx + b) with W rows ~ N(0, 2γ·I) and b ~ U[0, 2π],
    * so z(x)·z(y) ≈ exp(−γ‖x−y‖²) — the RBF kernel. A LINEAR model on z is
    * the scalable kernel machine: LinearSVC∘rbf ≈ RBF-SVC (M14),
    * ridge∘rbf ≈ kernel ridge / SVR-shape (M18) — the honest 100-TB path
    * where an exact kernel SVM (O(n²) gram matrix) cannot exist.
    *
    * W/b are driver-seeded, closed over, and shipped once per executor; the
    * map is narrow (no shuffle), D·dim multiplies per row.
    */
  def rbfFeatures(
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      inputDim: Int,
      nComponents: Int,
      gamma: Double,
      seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val sigma = math.sqrt(2.0 * gamma)
    val w = Array.fill(nComponents, inputDim)(rnd.nextGaussian() * sigma)
    val b = Array.fill(nComponents)(rnd.nextDouble() * 2.0 * math.Pi)
    val scale = math.sqrt(2.0 / nComponents)
    val rff = udf { (v: org.apache.spark.ml.linalg.Vector) =>
      val x = v.toArray
      val out = new Array[Double](nComponents)
      var i = 0
      while (i < nComponents) {
        val wi = w(i)
        var s = b(i)
        var j = 0
        while (j < x.length) { s += wi(j) * x(j); j += 1 }
        out(i) = math.cos(s) * scale
        i += 1
      }
      org.apache.spark.ml.linalg.Vectors.dense(out)
    }
    df.withColumn(outputCol, rff(col(inputCol)))
  }

  /** M26 — balanced per-class subsample (猫狗大战分类.py:172-177). */
  def balancedSample(df: DataFrame, labelCol: String, fraction: Double, seed: Long): DataFrame = {
    val labels = df.select(labelCol).distinct().collect().map(_.get(0))
    df.stat.sampleBy(labelCol, labels.map(_ -> fraction).toMap, seed)
  }
}
