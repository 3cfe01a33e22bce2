package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Within-block all-pairs enumeration (north-star dedup suite: exact
  * pairwise similarity over a blocked corpus).
  *
  * A naive blocked self-join (`a.join(b, blockCols)`) shuffles on the block
  * key alone, so a corpus with few distinct blocks (e.g. 5 languages) lands
  * each block's entire m·(m-1)/2 pair workload on ONE reducer — the classic
  * skew cliff. Here rows are additionally salted into `buckets` id-hash
  * buckets and every unordered bucket pair (i ≤ j) becomes its own join
  * group, spreading a block over buckets·(buckets+1)/2 tasks. Each row is
  * replicated (buckets+1) times across the two sides — bounded, paid once —
  * and the join stays a plain equi-join (no CartesianProduct, no window).
  *
  * Pair coverage: a pair with bucket(x) < bucket(y) meets exactly once in
  * group (bx, by) (x on the left side, y on the right); a same-bucket pair
  * meets in group (b, b) twice and is halved by the id ordering filter. The
  * output canonicalizes each pair as (a, b) with a.id < b.id.
  *
  * At unbounded block sizes all-pairs is inherently quadratic — candidate
  * generation (MinHash bands, LSH buckets; see SparkEntry q16/q29) is the
  * 100-TB path. This operator is for the exact-scoring regime where blocks
  * are bounded and completeness is the contract.
  */
object Pairs {

  /** All unordered pairs of distinct rows sharing `blockCols` values,
    * returned as struct columns `a` and `b` (full source rows) with
    * `a.<idCol> < b.<idCol>`. `idCol` must be unique per row.
    */
  def allPairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    val bucket = pmod(xxhash64(col(idCol)), lit(buckets)).cast("int")

    // a row with bucket u is the LEFT member of groups (u, j) for j >= u and
    // the RIGHT member of groups (i, u) for i <= u
    val left = df
      .select(blockCols.map(col) :+ bucket.as("_u") :+ rowStruct.as("a"): _*)
      .select(
        col("a") +: blockCols.zipWithIndex.map { case (c, i) => col(c).as(s"_k$i") } :+
          explode(transform(
            sequence(col("_u"), lit(buckets - 1)),
            j => struct(col("_u").as("i"), j.as("j")))).as("_g"): _*)
    val right = df
      .select(blockCols.map(col) :+ bucket.as("_v") :+ rowStruct.as("b"): _*)
      .select(
        col("b") +: blockCols.zipWithIndex.map { case (c, i) => col(c).as(s"_k$i") } :+
          explode(transform(
            sequence(lit(0), col("_v")),
            i => struct(i.as("i"), col("_v").as("j")))).as("_g"): _*)

    left
      .join(right, blockCols.indices.map(i => s"_k$i") :+ "_g")
      // cross-bucket groups (i < j) hold each pair once in arbitrary id
      // order; same-bucket groups hold both orders — keep the ascending one
      .filter(col("_g.i") < col("_g.j") || col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        when(col(s"a.$idCol") < col(s"b.$idCol"), col("a")).otherwise(col("b")).as("a"),
        when(col(s"a.$idCol") < col(s"b.$idCol"), col("b")).otherwise(col("a")).as("b"))
  }
}
