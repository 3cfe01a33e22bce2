package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — flag corpus documents that share word
  * n-grams with an evaluation/benchmark set so they can be removed before
  * training (the q63 overlap report's corpus-side dual: q63 counts
  * contamination per benchmark doc; this emits the removal list).
  *
  * Scale shape: the benchmark set is small (eval suites are ~10⁴–10⁶
  * grams), the corpus is the 100-TB side. The corpus gram stream is
  * prefiltered by a BLOOM FILTER built over the benchmark grams and
  * broadcast to the executors — the full corpus never shuffles its grams;
  * only the tiny bloom-positive slice reaches the verification join, which
  * then removes the false positives exactly. Result is therefore EXACT
  * (bloom errors are one-sided: no false negatives), independent of `fpp`.
  */
object Decontaminate {

  /** Distinct shared-n-gram counts per corpus document.
    *
    * Tokenization is lowercase + whitespace (mirrors the oracle's
    * `regexp_split_to_array(trim(lower(text)), '\s+')`). Returns
    * (idCol, shared_grams) for corpus docs with at least one shared gram.
    *
    * `useBloom=false` skips the prefilter (exact join only) — the
    * equivalence of the two paths is the operator's correctness test.
    */
  def sharedGramCounts(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      useBloom: Boolean = true,
      fpp: Double = 0.001): DataFrame = {
    require(n >= 1, s"n must be positive: $n")
    def grams(df: DataFrame): DataFrame = df
      .filter(trim(col(textCol)) =!= "")
      .select(
        col(idCol),
        explode(array_distinct(TextFunctions.wordShingles(lower(col(textCol)), n))).as("g"))
    val corpusGrams = grams(corpus)
    val benchGrams = grams(bench).select(col("g")).distinct()
    val candidates =
      if (useBloom) {
        // two driver-visible jobs over the SMALL side only (count sizes the
        // filter, then one pass builds it); the corpus side stays lazy
        val expected = benchGrams.count()
        // an empty benchmark contaminates nothing — and Spark's bloomFilter
        // aggregation returns a NULL buffer on zero rows (NPE on readFrom).
        // Same output schema, zero rows:
        if (expected == 0L)
          return corpusGrams
            .groupBy(col(idCol))
            .agg(count_distinct(col("g")).as("shared_grams"))
            .limit(0)
        val bloom = benchGrams.stat.bloomFilter("g", expected, fpp)
        val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
        val mightContain = udf((g: String) => g != null && bc.value.mightContain(g))
        corpusGrams.filter(mightContain(col("g")))
      } else corpusGrams
    candidates
      .join(benchGrams, Seq("g")) // exact verify: eliminates bloom false positives
      .groupBy(col(idCol))
      .agg(count_distinct(col("g")).as("shared_grams"))
  }

  /** Handle bundling the two stored [[benchIndex]] frames with the (m, k)
    * they were built at — what a tick loop passes around
    * (`Curation.tickIndexed(benchIdx = …)`). `n` stays the tick's
    * `decontN` (one gram convention per pipeline, like shingleN).
    */
  case class BenchIndex(grams: DataFrame, bloomCells: DataFrame, m: Int, k: Int)

  /** The benchmark side as a PERSISTABLE INDEX — what a standing
    * decontamination service stores instead of rebuilding the driver-side
    * bloom every call: `(benchGrams, bloomCells)` where `benchGrams` is the
    * distinct gram table (column `g`) and `bloomCells` its mergeable
    * [[graft.functions.Bloom.cells]] at (m, k). Persist both as parquet;
    * when the benchmark set grows, append the new grams and
    * `Bloom.merge` the new slice's cells — OR-merge equals the whole-data
    * build for any merge shape. The same lowercase + whitespace word
    * n-grams as [[sharedGramCounts]] (`n` is a contract across build and
    * probe, like shingleN on the signature index).
    */
  def benchIndex(
      bench: DataFrame,
      textCol: String,
      n: Int,
      m: Int,
      k: Int): (DataFrame, DataFrame) = {
    require(n >= 1, s"n must be positive: $n")
    val grams = bench
      .filter(trim(col(textCol)) =!= "")
      .select(explode(array_distinct(
        TextFunctions.wordShingles(lower(col(textCol)), n))).as("g"))
      .distinct()
    (grams, graft.functions.Bloom.cells(grams, col("g"), m, k))
  }

  /** [[sharedGramCounts]] against a prebuilt [[benchIndex]] — the
    * production shape: the corpus gram stream probes the STORED bloom
    * cells (a broadcast ≤ ⌈m/32⌉-row join — no driver-side filter build,
    * no benchmark re-gram), then the stored gram table removes the false
    * positives exactly. Output is IDENTICAL to [[sharedGramCounts]]
    * (one-sidedness: the bloom never drops a true member), for any m/k —
    * `fpp` tunes probe cost, not correctness. `n`, `m`, `k` must match the
    * index build.
    */
  def sharedGramCountsIndexed(
      corpus: DataFrame,
      benchGrams: DataFrame,
      bloomCells: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      m: Int,
      k: Int): DataFrame = {
    require(n >= 1, s"n must be positive: $n")
    val corpusGrams = corpus
      .filter(trim(col(textCol)) =!= "")
      .select(
        col(idCol),
        explode(array_distinct(
          TextFunctions.wordShingles(lower(col(textCol)), n))).as("g"))
    val candidates = graft.functions.Bloom
      .positiveItems(bloomCells, corpusGrams, "g", m, k)
    corpusGrams
      .join(broadcast(candidates), Seq("g"), "left_semi")
      .join(benchGrams.select(col("g")).distinct(), Seq("g")) // exact verify
      .groupBy(col(idCol))
      .agg(count_distinct(col("g")).as("shared_grams"))
  }
}
