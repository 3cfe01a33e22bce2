package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions must be callable from plain SQL once the
  * extension is installed.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    GraftExtensions.install(s) // getOrCreate ignores withExtensions on a live session
    s
  }

  test("custom expressions resolve and evaluate through spark.sql") {
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  minhash_signature(array('a','b','c'), 4) AS mh,
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS js,
        |  multi_substring_count('abcabc', array('abc', 'bc')) AS msc,
        |  winnowing_fingerprints(array(5L, 3L, 9L, 1L, 7L), 2) AS wf,
        |  lsh_bucket(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 0, 8) AS lb
        |""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).length == 4)
    assert(row.getDouble(2) == 1.0)
    assert(row.getDouble(3) == 0.5)
    assert(row.getSeq[Long](4) == Seq(2L, 2L))
    // window mins of [5,3,9,1,7] w=2 -> [3,3,1,1], distinct sorted -> [1,3]
    assert(row.getSeq[Long](5) == Seq(1L, 3L))
    assert(row.getInt(6) >= 0 && row.getInt(6) < 256)
  }

  test("SQL and Column APIs agree") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("the quick brown fox").toDF("t")
    val viaCol = df.select(
      graft.functions.TextFunctions.simhash64(split(col("t"), " "))).head().getLong(0)
    df.createOrReplaceTempView("docs")
    val viaSql = spark.sql("SELECT simhash64(split(t, ' ')) FROM docs").head().getLong(0)
    assert(viaCol == viaSql)
  }
}
