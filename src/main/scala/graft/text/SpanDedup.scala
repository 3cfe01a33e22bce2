package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Span-level (sub-document) deduplication — the C4/RefinedWeb step that
  * removes REPEATED PASSAGES across a corpus while keeping the documents
  * themselves: tokenize, cut each document into tumbling `w`-token spans,
  * keep only each span's globally FIRST occurrence (ordered by document id,
  * then span position), and reassemble every document from its surviving
  * spans in order.
  *
  * Reference semantics: the cross-document passage-removal analog of the
  * reference's whole-row dedup (蔬菜价格相关性分析.py:25-26 keep-first
  * drop_duplicates), lifted to sub-document granularity — the form used to
  * strip boilerplate/licence blocks from pretraining corpora.
  *
  * Scale shape (the 100 TB contract):
  *   - spans shuffle ONCE by 128-bit span digest for the first-occurrence
  *     aggregate (map-side partial min — duplicate-heavy corpora combine
  *     before the exchange);
  *   - the winner set joins back as a digest-keyed equi-join (no raw span
  *     text on the build side — the probe side streams its own text);
  *   - reconstruction is one groupBy(doc) over kept spans.
  *   No all-pairs stage, no window over corpus-sized frames; per-key state
  *   is one (docId, spanIdx) pair per DISTINCT span.
  */
object SpanDedup {

  /** Per-document reconstruction after global first-occurrence span dedup.
    *
    * Returns one row per non-empty document:
    * (idCol, n_spans, n_kept, clean_text) where clean_text is the document's
    * surviving spans joined by single spaces in original order ("" when every
    * span was claimed by an earlier document).
    *
    * The global order key packs (docId, spanIdx) into one long — valid while
    * spanIdx < 2^20 (a 2^20·w-token document; enforced per-row with a
    * raise_error guard, so an oversize doc fails LOUD instead of silently
    * corrupting the packed order key) — so the first-occurrence winner is a
    * single `min` aggregate, not a struct sort.
    */
  def dedupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w > 0, s"span width must be positive, got $w")
    val spans = docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), TF.tokens(col(textCol)).as("_tk"))
      .select(
        col(idCol),
        posexplode(spanStrings(col("_tk"), w)).as(Seq("span_idx", "span")))
    val keyed = spans.select(
      col(idCol),
      col("span_idx"),
      col("span"),
      md5(col("span").cast("binary")).as("_digest"),
      when(col("span_idx") < lit(1048576),
        col(idCol) * lit(1048576L) + col("span_idx"))
        .otherwise(raise_error(format_string(
          "dedupSpans: doc %s has >= 2^20 spans — chunk oversize docs first",
          col(idCol))).cast("long"))
        .as("_ord"))
    val firsts = keyed
      .groupBy(col("_digest"))
      .agg(min(col("_ord")).as("_first_ord"))
    keyed
      .join(firsts, Seq("_digest"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("_ord") === col("_first_ord"), 1L).otherwise(0L))
          .as("n_kept"),
        concat_ws(" ",
          array_sort(collect_list(when(col("_ord") === col("_first_ord"),
            struct(col("span_idx"), col("span")))))
            .getField("span")).as("clean_text"))
  }

  /** tokens -> array of tumbling w-token span strings (space-joined).
    * Documents longer than 2^20 spans would collide the packed order key —
    * the slice below never reads past the array, and the packing guard lives
    * in the key expression's domain (doc ids scale, span counts are bounded
    * by document length, which a curation pipeline has already capped).
    */
  private def spanStrings(tokensCol: Column, w: Int): Column =
    TF.bindOnce(tokensCol) { tk =>
      transform(
        sequence(lit(0), ceil(size(tk).cast("double") / w).cast("int") - 1),
        i => concat_ws(" ", slice(tk, i * w + 1, lit(w))))
    }
}
