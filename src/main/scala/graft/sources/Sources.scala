package graft.sources

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY.md §2.1 S1–S8).
  *
  * The reference reads GBK-encoded CSV (新冠疫情分析.py:30, 蔬菜价格相关性分析.py:20),
  * whole text files with an encoding-fallback chain (红楼梦作者分析.py:31-42),
  * image directories (猫狗大战分类.py:62-64), and writes single-file CSV
  * artifacts. All re-expressed on Spark's native sources; nothing here is
  * driver-side I/O except the explicit single-file sink contract.
  */
object Sources {

  /** S1/S2 — CSV scan. `encoding` "GBK" matches the reference's files;
    * explicit schema preferred at scale (inference reads the data twice).
    */
  def csv(
      spark: SparkSession,
      path: String,
      encoding: String = "UTF-8",
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("encoding", encoding)
    schema.fold(base.option("inferSchema", "true"))(base.schema).csv(path)
  }

  /** S3 — whole-file text with an encoding fallback chain, distributed: read
    * raw bytes via `binaryFile` and decode per file inside an executor-side
    * function, trying each charset strictly (malformed input → next charset)
    * exactly like the reference's utf-8 → gbk → gb2312 → gb18030 loop.
    */
  def wholeTextWithFallback(
      spark: SparkSession,
      dir: String,
      glob: String = "*",
      charsets: Seq[String] = Seq("UTF-8", "GBK", "GB2312", "GB18030")): DataFrame = {
    import spark.implicits._
    val decode = udf { (bytes: Array[Byte]) =>
      charsets.iterator.flatMap { cs =>
        try {
          val decoder: CharsetDecoder = Charset.forName(cs).newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          Some((cs, decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString))
        } catch { case _: Exception => None }
      }.nextOption()
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), decode(col("content")).as("_dec"))
      .select(col("path"), col("_dec._1").as("charset"), col("_dec._2").as("text"))
  }

  /** S4 — binary directory scan with a filename filter (the cat/dog listing):
    * lazy per-partition content reads, never a driver-side listing loop.
    */
  def binaryDir(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        col("path"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        col("length"),
        col("content"))

  /** S6/S7 — single-file CSV sink (the reference's `to_csv` artifact shape).
    * `coalesce(1)` is part of the CONTRACT (one deliverable file), not a
    * performance choice; for big outputs use `df.write.csv` unmodified.
    */
  def writeCsvSingle(df: DataFrame, path: String, sortBy: Seq[String] = Seq.empty): Unit = {
    val ordered = if (sortBy.nonEmpty) df.orderBy(sortBy.map(col).toIndexedSeq: _*) else df
    ordered.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON-lines scan (the event-log / crawl-dump interchange format): one
    * JSON object per line, schema explicit — at scale, inference reads the
    * data twice AND silently widens types across files; production ingest
    * pins the schema and quarantines rows that don't parse. `columnNameOfCorruptRecord`
    * captures rejects instead of dropping them (data-loss audit per S-family
    * contract: a scan must account for every input row).
    */
  def jsonLines(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** ORC round-trip (the other columnar interchange format a warehouse
    * migration meets): same pushdown/pruning contract as parquet — filters
    * and projections reach the ORC scan via Catalyst unchanged.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet sink — the 100-TB table layout: one
    * directory per partition value, so any read with a filter on the
    * partition columns prunes whole directories at PLANNING time (the scan's
    * PartitionFilters — zero bytes of pruned data are listed or read).
    * Partition by low-cardinality scan predicates (date, category), never by
    * high-cardinality keys (one dir per value = small-files death).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
