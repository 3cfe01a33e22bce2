package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE merge learning (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", alg. 1) — the tokenizer
  * TRAINING step of an LLM data pipeline.
  *
  * Scale shape: classic BPE iterates over the WORD-FREQUENCY table, not the
  * raw corpus — so the one corpus-sized pass here is the initial word count
  * (a single shuffle keyed by word); every merge iteration then runs on the
  * vocabulary-sized frame (≤ a few million rows at web scale, constant in
  * corpus size). Per iteration: one distributed pair-count aggregation, a
  * 1-row argmax collect (count desc, pair asc — deterministic), and a typed
  * map applying the merge. The driver holds only the k learned merges.
  */
object Bpe {

  /** One learned merge: `left`+`right` fused, with the pair's weighted
    * count at the time it was chosen.
    */
  case class Merge(left: String, right: String, count: Long)

  /** Learn `k` merges over the whitespace-tokenized, lowercased corpus.
    * Words are segmented to characters; each iteration fuses the most
    * frequent adjacent symbol pair (ties broken lexicographically on the
    * pair). Returns the merges in learned order.
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    require(k >= 1, s"k must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._

    var words: Dataset[(Seq[String], Long)] = docs
      .filter(trim(col(textCol)) =!= "")
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      // code-point segmentation, NOT UTF-16 units: pairCounts uses Spark's
      // codepoint-based substr, so splitting on chars here would emit lone
      // surrogates for non-BMP text and the two paths would diverge
      .map { case (w, f) => (codePoints(w), f) }
      // the vocab frame is re-read every iteration — keep it materialized,
      // and localCheckpoint below truncates the per-iteration lineage
      .localCheckpoint(true)

    val merges = Seq.newBuilder[Merge]
    for (_ <- 1 to k) {
      val best = words
        .flatMap { case (syms, freq) => syms.sliding(2).collect { case Seq(a, b) => ((a, b), freq) } }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .toDF("left", "right", "cnt")
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      if (best.isEmpty) return merges.result()
      val row = best.head
      val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
      merges += Merge(l, r, c)
      val prev = words
      words = words
        .map { case (syms, freq) => (applyMerge(syms, l, r), freq) }
        .localCheckpoint(true)
      // the new checkpoint is eagerly materialized above — release the prior
      // iteration's blocks NOW instead of letting k vocab-sized copies pile
      // up in block storage until the ContextCleaner gets to them
      releaseCheckpoint(prev)
    }
    merges.result()
  }

  /** UTF-32 code-point segmentation of a word (each element one code point,
    * surrogate pairs kept whole).
    */
  private[graft] def codePoints(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Unpersist the block-stored data behind a localCheckpoint'ed Dataset
    * (Dataset.unpersist only talks to the SQL cache manager, which never
    * tracked these blocks — the checkpoint lives as persisted RDD blocks).
    */
  private def releaseCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** The first learnMerges iteration as a declarative frame: adjacent
    * character-pair counts weighted by word frequency (the distributed
    * pair-count stage, exposed for the oracle gate — its (cnt desc, pair
    * asc) argmax row IS the first learned merge; BpeSpec pins the
    * equivalence). Returns (lhs, rhs, cnt).
    */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .filter(trim(col(textCol)) =!= "")
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
    val pairs = TextFunctions.bindOnce(col("w")) { w =>
      transform(
        sequence(lit(1), length(w) - 1),
        i => struct(w.substr(i, lit(1)).as("lhs"), w.substr(i + 1, lit(1)).as("rhs")))
    }
    words
      .filter(length(col("w")) >= 2)
      .select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Left-to-right single-pass fuse of every non-overlapping (l, r)
    * occurrence — the BPE merge application.
    */
  private[graft] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Segment `textCol` with a learned merge list: per-row application of
    * the merges in order (the tokenizer ENCODE step). The merge table rides
    * the closure (vocabulary-sized); the pass is narrow — no shuffle.
    * Returns (idCol: long, pieces: array<string>).
    */
  def segment(docs: DataFrame, idCol: String, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.map(m => (m.left, m.right))
    docs
      .select(col(idCol).cast("long"), TextFunctions.tokens(lower(col(textCol))))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val pieces = toks.flatMap { w =>
          ms.foldLeft(codePoints(w)) { case (s, (l, r)) => applyMerge(s, l, r) }
        }
        (id, pieces)
      }
      .toDF(idCol, "pieces")
  }
}
