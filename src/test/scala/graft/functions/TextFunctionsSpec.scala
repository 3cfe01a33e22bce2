package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens handles empties, runs of whitespace, and trim") {
    val df = Seq("a b  c", "  x ", "", "   ").toDF("t")
    val out = df.select(TF.tokenCount(col("t")).as("n")).as[Int].collect().toSeq
    assert(out == Seq(3, 1, 0, 0))
  }

  test("meanTokenLength averages characters per token, null on empty docs") {
    val df = Seq("ab cdef", "xyz", "", "  ").toDF("t")
    val out = df.select(TF.meanTokenLength(col("t")).as("m"))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(3.0), Some(3.0), None, None))
  }

  test("charShingles slides over the normalized text") {
    val df = Seq("AB  cd").toDF("t") // normalized: "ab cd" (5 chars)
    val out = df.select(TF.charShingles(col("t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("ab ", "b c", " cd"))
  }

  test("charShingles shorter than n yields empty array") {
    val df = Seq("ab").toDF("t")
    assert(df.select(TF.charShingles(col("t"), 5)).as[Seq[String]].head().isEmpty)
  }

  test("wordShingles slides over tokens, joined by single spaces") {
    val df = Seq("the  quick brown fox").toDF("t")
    val out = df.select(TF.wordShingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(out == Seq("the quick brown", "quick brown fox"))
  }

  test("wordShingles with fewer tokens than n yields empty array") {
    val df = Seq("one two", "", "   ").toDF("t")
    val out = df.select(TF.wordShingles(col("t"), 3).as("s")).as[Seq[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("jaccard exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TF.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
  }

  test("fingerprint is whitespace/case-invariant") {
    val df = Seq(("Hello  World", "hello world"), ("a", "b")).toDF("x", "y")
    val out = df.select((TF.fingerprint(col("x")) === TF.fingerprint(col("y"))).as("eq"))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
  }

  test("minhash signature: identical inputs agree, length k, deterministic") {
    val df = Seq("the quick brown fox", "the quick brown fox", "something else entirely")
      .toDF("t")
    val sigs = df.select(TF.minhashSignature(TF.charShingles(col("t"), 4), 16).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs(0).length == 16)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash similarity tracks jaccard (near-dup pair shares most slots)") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and again!" // near-dup
    val c = "completely different text with no overlap whatsoever here"
    val df = Seq(a, b, c).toDF("t")
    val sigs = df.select(TF.minhashSignature(TF.charShingles(col("t"), 4), 32).as("s"))
      .as[Seq[Long]].collect()
    val simAB = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    val simAC = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(simAB > 24, s"near-dup agreement $simAB should be high")
    assert(simAC < 8, s"unrelated agreement $simAC should be low")
  }

  test("simhash: identical inputs equal; near inputs within small hamming distance") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val near = base + " w17"
    val far = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14 z15 z16"
    val df = Seq(base, base, near, far).toDF("t")
    val hs = df.select(TF.simhash64(TF.tokens(col("t"))).as("h")).as[Long].collect()
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hs(0) == hs(1))
    assert(hamming(hs(0), hs(2)) < 16, "near-dup simhash should be close")
    assert(hamming(hs(0), hs(3)) > 16, "unrelated simhash should be far")
  }

  test("stopwordRatio and punctRatio compute exact fractions") {
    val df = Seq("the cat, the dog!").toDF("t") // 4 tokens, 2 stopwords; 2 punct of 17 chars
    val r = df.select(
      TF.stopwordRatio(col("t"), Seq("the")).as("s"),
      TF.punctRatio(col("t")).as("p")).head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 2.0 / 17) < 1e-12)
  }

  test("langIdHeuristic picks the profile with most stopword hits") {
    val profiles = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "das"))
    val df = Seq("the cat and the hat", "der hund und das haus").toDF("t")
    val out = df.select(TF.langIdHeuristic(col("t"), profiles).as("l"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "de"))
  }
}

class TokenizerSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bpeTokens splits letter runs, digit runs, and punctuation") {
    val df = Seq("Hello, world42! x-y").toDF("t")
    val toks = df.select(TF.bpeTokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("Hello", ",", "world", "42", "!", "x", "-", "y"))
  }

  test("winnowing fingerprints are robust to a local edit") {
    def fp(t: String): Set[Long] = {
      val df = Seq(t).toDF("t")
      df.select(
        TF.winnowingFingerprints(
          transform(TF.charShingles(col("t"), 4), s => xxhash64(s)), 4))
        .as[Seq[Long]].head().toSet
    }
    val a = fp("the quick brown fox jumps over the lazy dog again and again")
    val b = fp("the quick brown fox jumps over the lazy dog again and againX")
    val c = fp("completely unrelated content with different words entirely")
    val simAB = (a intersect b).size.toDouble / (a union b).size
    val simAC = (a intersect c).size.toDouble / (a union c).size
    assert(simAB > 0.6, s"near-dup fingerprint overlap $simAB")
    assert(simAC < 0.1, s"unrelated fingerprint overlap $simAC")
  }

  test("winnowing handles short and empty inputs") {
    val df = Seq(("ab"), ("")).toDF("t")
    val out = df.select(
      TF.winnowingFingerprints(
        transform(TF.charShingles(col("t"), 4), s => xxhash64(s)), 4).as("f"))
      .as[Seq[Long]].collect()
    assert(out(1).isEmpty)
  }

  test("native winnowing equals the brute-force window-min reference") {
    // the monotonic-deque expression must match the O(n·w) definition
    // (distinct sorted window minima) on random inputs incl. duplicates
    val rnd = new scala.util.Random(42)
    val cases = (1 to 25).map { i =>
      val n = rnd.nextInt(40)
      (Seq.fill(n)(rnd.nextInt(8).toLong), 1 + rnd.nextInt(6), i)
    }
    val df = cases.map { case (a, w, i) => (i, a, w) }.toDF("i", "hashes", "w")
    val got = cases.map { case (a, w, i) =>
      val r = Seq((i, a)).toDF("i", "hashes")
        .select(TF.winnowingFingerprints(col("hashes"), w)).as[Seq[Long]].head()
      (i, r)
    }.toMap
    cases.foreach { case (a, w, i) =>
      val want =
        if (a.isEmpty) Seq.empty[Long]
        else if (a.length <= w) Seq(a.min) // contract: short input -> global min
        else (0 to a.length - w).map(j => a.slice(j, j + w).min).distinct.sorted
      assert(got(i) == want, s"case $i: arr=$a w=$w")
    }
  }

  test("deletionNeighborhood emits the term plus each single deletion, deduped") {
    val df = Seq("cat", "aa", "x", "").toDF("t")
    val out = df.select(TF.deletionNeighborhood(col("t")).as("k"))
      .as[Seq[String]].collect().toSeq
    assert(out(0).toSet == Set("cat", "at", "ct", "ca"))
    assert(out(1).toSet == Set("aa", "a")) // both deletions collapse
    assert(out(2).toSet == Set("x", ""))
    assert(out(3) == Seq("")) // empty term guarded, no sequence(1,0)
  }

  test("deletionNeighborhood keys intersect exactly for levenshtein<=1 pairs") {
    def keys(t: String): Set[String] =
      Seq(t).toDF("t").select(TF.deletionNeighborhood(col("t")).as("k"))
        .as[Seq[String]].head().toSet
    // substitution, insertion, deletion all share a key
    assert((keys("cat") & keys("cut")).nonEmpty)
    assert((keys("cat") & keys("cart")).nonEmpty)
    assert((keys("cat") & keys("at")).nonEmpty)
    // distance-2 pair with no shared key stays unblocked
    assert((keys("cat") & keys("dog")).isEmpty)
  }
}
