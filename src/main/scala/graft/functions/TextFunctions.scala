package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the training-data pipeline suite
  * (north-star extensions; SURVEY.md §7.2 phase 5): token counting, quality
  * ratios, language-ID heuristic, fingerprinting. All pure `Column`
  * expressions over `org.apache.spark.sql.functions` — codegen'd, no UDFs —
  * so they vectorize inside whole-stage codegen at 100-TB scan scale.
  */
object TextFunctions {

  /** Whitespace tokens (split on runs of whitespace, ignoring leading/
    * trailing). Returns ArrayType(StringType).
    */
  def tokens(text: Column): Column = {
    val trimmed = trim(text)
    when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
  }

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length in characters; null for empty docs. The split is
    * bindOnce-bound: referenced three times in the expression tree, an
    * unbound split would rely on codegen subexpression elimination to
    * avoid re-tokenizing per reference (r10 bindOnce audit).
    */
  def meanTokenLength(text: Column): Column =
    bindOnce(tokens(text)) { toks =>
      when(size(toks) === 0, lit(null))
        .otherwise(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
    }

  /** Ratio of non-alphanumeric, non-space characters (punctuation/symbols). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", ""))).cast("double") /
          length(text))

  /** Ratio of tokens that appear in `stopwords` (exact, case-insensitive). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(s => lit(s.toLowerCase)).toIndexedSeq: _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => array_contains(stops, lower(t)))).cast("double") / size(toks))
  }

  /** SymSpell deletion-neighborhood keys: the term itself plus every
    * single-character deletion of it, deduplicated. Two terms within
    * Levenshtein distance 1 ALWAYS share at least one key (a substitution
    * shares a common deletion; an insert/delete shares the shorter term
    * itself), so exploding these keys and equi-joining on them generates
    * all candidate pairs WITHOUT any pairwise product — the scale-safe
    * blocking for vocabulary typo clustering. Candidates still need an
    * exact `levenshtein` verify (key sharing is necessary, not
    * sufficient — e.g. transpositions share keys at distance 2).
    */
  def deletionNeighborhood(term: Column): Column = {
    val dels = transform(
      sequence(lit(1), length(term)),
      i => concat(term.substr(lit(1), i - 1), term.substr(i + 1, length(term))))
    when(length(term) === 0, array(term))
      .otherwise(array_union(array(term), dels))
  }

  /** Duplicate-token fraction 1 − distinct/total (the Gopher-family
    * repetition signal): 0 for all-unique docs, →1 as tokens repeat. Null
    * for empty docs (callers filter those first). ONE definition shared by
    * the repetition-stats and quality-filter queries so the reported metric
    * can never diverge from the gate that filters on it.
    */
  def duplicateTokenFraction(text: Column): Column =
    bindOnce(tokens(lower(text))) { toks =>
      when(size(toks) === 0, lit(null).cast("double"))
        .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
    }

  /** Heuristic document quality score in [0,1]: rewards moderate length,
    * low punctuation, and a natural stopword rate — the standard cheap
    * pre-filter shape for LLM corpus curation. Deterministic arithmetic only,
    * so it is oracle-checkable.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0)) // saturates at 50 tokens
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4)
    val stopScore = least(stopwordRatio(text, stopwords) * 5, lit(1.0))
    // +1e-9 before rounding: oracle-stable on exact round-half boundaries.
    round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3 + lit(1e-9), 6)
  }

  /** BPE-ish subword tokenization via regex (the cheap pre-tokenizer shape
    * used before byte-pair merging): letter runs, digit runs, and single
    * punctuation marks each become tokens. The pattern uses only constructs
    * with identical semantics in Java regex and RE2, so a DuckDB oracle
    * reproduces it.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Winnowing fingerprints (the rolling-hash document fingerprint of
    * Schleimer et al.): over the shingle-hash sequence, take the minimum
    * hash of every sliding window of `w`, dedup — robust to local edits.
    * Works on the same `array<long>` hash column the near-dup pipeline
    * already computes (each shingle hashed once). Native monotonic-deque
    * expression — O(n) per doc; the composed HOF form was O(n·w) interpreted
    * and dominated the sf0.1 bench. Fingerprints return sorted ascending
    * (set semantics).
    */
  def winnowingFingerprints(hashes: Column, w: Int): Column =
    graft.expressions.HashExpressions.winnowingFingerprints(hashes, w)

  /** Expression-level "let": binds `c` once via a single-element `transform`
    * so `body` can reference it many times without Catalyst re-evaluating
    * the whole subtree per reference (higher-order-function lambdas are
    * interpreted and re-run outer expressions each time — measured 25×
    * slower on the shingle path before binding).
    */
  private[graft] def bindOnce(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** Character n-gram shingles of the normalized text (lowercased, whitespace
    * collapsed). Building block for MinHash / Jaccard near-dup. The
    * normalization is `bindOnce`-bound: the per-shingle lambda would re-run
    * the regex for every shingle otherwise.
    */
  def charShingles(text: Column, n: Int): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    bindOnce(norm) { nm =>
      // guard: sequence(1, 0) in Spark is DESCENDING [1,0], not empty —
      // texts shorter than n must yield an empty shingle set explicitly.
      when(length(nm) < n, array().cast("array<string>"))
        .otherwise(
          transform(
            sequence(lit(1), length(nm) - (n - 1)),
            i => nm.substr(i, lit(n))))
    }
  }

  /** Word n-gram shingles (joined with a space). The token split is
    * `bindOnce`-bound: referenced bare inside the transform lambda it would
    * re-split the text once per output gram (interpreted HOFs re-run outer
    * expressions per element).
    */
  def wordShingles(text: Column, n: Int): Column =
    bindOnce(tokens(text)) { toks =>
      // same sequence(1,0)-is-descending guard as charShingles
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(
          transform(sequence(lit(1), size(toks) - (n - 1)), i => concat_ws(" ", slice(toks, i, lit(n)))))
    }

  /** Sliding token-window chunking — the standard LLM-pretraining document
    * splitter: windows of `chunkSize` whitespace tokens advancing by
    * `stride` (stride < chunkSize ⇒ overlapping context). Returns
    * array<struct<start,n_tok,chunk>> with 1-based token offsets. Start
    * positions run to (nTok − chunkSize + stride) so the final window always
    * reaches the last token without emitting a fully-contained tail window.
    * Pure codegen'd expression — per-row work is O(nTok), no shuffle; the
    * caller explodes it into chunk rows (narrow, scan-parallel).
    */
  def tokenChunks(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"bad chunking: size=$chunkSize stride=$stride")
    bindOnce(tokens(text)) { toks =>
      when(size(toks) === 0, array().cast("array<struct<start:int,n_tok:int,chunk:string>>"))
        .otherwise(
          transform(
            sequence(lit(1), greatest(size(toks) - (chunkSize - stride), lit(1)), lit(stride)),
            start =>
              struct(
                start.cast("int").as("start"),
                least(lit(chunkSize), size(toks) - start + 1).cast("int").as("n_tok"),
                concat_ws(" ", slice(toks, start, lit(chunkSize))).as("chunk"))))
    }
  }

  /** 64-bit document fingerprint: xxhash64 over the normalized text. Same
    * normalization as `charShingles`, so near-identical whitespace variants
    * collide — the cheap exact-near-dup key.
    */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** MinHash signature of a shingle array (length-k array<long>). Delegates
    * to the native Catalyst expression — the composed higher-order-function
    * form is interpreted + boxing-heavy and measured 10× slower on the sf0.1
    * corpus. Empty input yields Long.MaxValue sentinels.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.expressions.HashExpressions.minhashSignature(shingles, k)

  /** SimHash (64-bit) over an array of tokens/shingles: per-bit majority vote
    * of each element's hash. Native Catalyst expression — one tight loop per
    * row (each element hashed once, 64 counter bumps), where the composed
    * `aggregate`/`zip_with` form allocates a boxed 64-array per element.
    */
  def simhash64(elems: Column): Column =
    graft.expressions.HashExpressions.simhash64(elems)

  /** n-gram Jaccard similarity between two shingle arrays (exact). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Default PII redaction table: (pattern, replacement tag), applied in
    * order. Patterns stay inside the regex subset with identical semantics
    * in Java regex and RE2 so a DuckDB oracle reproduces them exactly.
    */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("https?://[^\\s]+", "<URL>"),
    ("\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b", "<PHONE>"))

  /** PII-style scrub — the standard pre-training redaction pass: every match
    * of every pattern is replaced by its tag. A fold of codegen'd
    * `regexp_replace` calls: scan-speed, no UDF, trivially parallel.
    */
  def redact(text: Column, patterns: Seq[(String, String)] = RedactionPatterns): Column =
    patterns.foldLeft(text) { case (c, (p, t)) => regexp_replace(c, p, t) }

  /** Cheap language-ID heuristic over a closed language set: score each
    * language by stopword hits per token and pick the argmax. Suitable for
    * the synthetic TESTDATA corpus; a production engine would swap in a
    * trained n-gram model behind the same Column signature.
    */
  def langIdHeuristic(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val best = bestLangStruct(text, profiles)
    best.getField("lang")
  }

  /** As `langIdHeuristic`, but zero-evidence documents (no profile word hits
    * at all) map to `unknownLabel` instead of the tiebreak winner — the
    * honest answer for a closed-profile classifier.
    */
  def langIdWithUnknown(
      text: Column,
      profiles: Map[String, Seq[String]],
      unknownLabel: String = "und"): Column = {
    val best = bestLangStruct(text, profiles)
    // bindOnce the scored struct: the full profile-scoring tree would
    // otherwise evaluate twice (score test + lang projection)
    bindOnce(best) { b =>
      when(b.getField("score") <= 0.0, lit(unknownLabel)).otherwise(b.getField("lang"))
    }
  }

  private def bestLangStruct(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val toks = tokens(text)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val w = array(words.map(s => lit(s.toLowerCase)).toIndexedSeq: _*)
      struct(
        (size(filter(toks, t => array_contains(w, lower(t)))).cast("double") /
          greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) — deterministic tiebreak on language code
    // (equal scores -> lexicographically greatest lang)
    array_max(array(scored.toIndexedSeq: _*))
  }
}
