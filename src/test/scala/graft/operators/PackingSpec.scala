package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single partition packs greedily in id order with capacity resets") {
    val docs = Seq((1L, 40L), (2L, 50L), (3L, 20L), (4L, 90L), (5L, 15L))
      .toDF("doc_id", "n_tok")
    val out = Packing.greedyPack(docs, "doc_id", "n_tok", maxLen = 100, partitions = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // bins: [40+50], [20], oversize rule puts 90 alone? 20+90>100 -> [20],[90,15]? walk:
    // 40 -> b0 (40); 50 -> b0 (90); 20 -> b1 (b0 would be 110); 90 -> b2 (110>100); 15 -> b2 (105>100)? 90+15=105>100 -> b3
    assert(out(1L) == out(2L))
    assert(out(3L) != out(1L))
    assert(out(4L) != out(3L))
    assert(out(5L) != out(4L))
  }

  test("no bin exceeds capacity unless it holds a single oversize doc") {
    val docs = (1L to 500L).map(i => (i, (i * 37 % 120) + 1)).toDF("doc_id", "n_tok")
    val packed = Packing.greedyPack(docs, "doc_id", "n_tok", maxLen = 128, partitions = 4)
    val bins = packed.groupBy("bin_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("fill"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    bins.foreach { b =>
      assert(b.getLong(1) <= 128 || b.getLong(2) == 1L, s"overfull multi-doc bin: $b")
    }
    assert(packed.count() == 500L)
    // every doc appears exactly once
    assert(packed.select("doc_id").distinct().count() == 500L)
  }

  test("shardByTokenBudget matches a local hash-order cumsum recomputation") {
    val data = (1L to 300L).map(i => (i, (i * 13 % 90) + 1))
    val docs = data.toDF("doc_id", "n_tok")
    val got = Packing.shardByTokenBudget(docs, "doc_id", "n_tok", budget = 512L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // reference: Knuth hash order, shard = floor(token offset at doc start / budget)
    def h(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L
    var cum = 0L
    val exp = data.sortBy { case (id, _) => (h(id), id) }.map { case (id, n) =>
      val shard = cum / 512L
      cum += n
      id -> shard
    }.toMap
    assert(got == exp)
    // shards are contiguous from 0 and, except the last, hold >= budget
    // tokens once their spill-over doc is counted
    val sizes = Packing.shardByTokenBudget(docs, "doc_id", "n_tok", budget = 512L)
      .groupBy("shard_id").agg(org.apache.spark.sql.functions.sum("n_tok").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until sizes.size.toLong).toSet)
  }

  test("shardByTokenBudget is deterministic and loses no documents or tokens") {
    val docs = (1L to 500L).map(i => (i, (i * 7 % 60) + 1)).toDF("doc_id", "n_tok")
    val a = Packing.shardByTokenBudget(docs, "doc_id", "n_tok", budget = 256L)
    val b = Packing.shardByTokenBudget(docs, "doc_id", "n_tok", budget = 256L)
    assert(a.collect().toSet == b.collect().toSet)
    assert(a.count() == 500L)
    val tot = a.agg(org.apache.spark.sql.functions.sum("n_tok")).collect()(0).getLong(0)
    assert(tot == (1L to 500L).map(i => (i * 7 % 60) + 1).sum)
  }

  test("distributed form = the sequential greedy fold, partition by partition") {
    // reference fold (the q216 oracle's recursive CTE in plain Scala)
    def refPack(docs: Seq[(Long, Long)], maxLen: Long): Seq[(Long, Long, Long)] = {
      var bin = -1L; var fill = 0L; var started = false
      docs.map { case (id, n) =>
        if (!started || fill + n > maxLen) { bin += 1; fill = 0L; started = true }
        fill += n
        (id, n, bin)
      }
    }
    val data = (1L to 400L).map(i => (i, (i * 29 % 150) + 1))
    val docs = data.toDF("doc_id", "n_tok")
    // partitions=1: exact equality with the global sequential fold
    val single = Packing.greedyPack(docs, "doc_id", "n_tok", 128, partitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(single == refPack(data, 128L))
    // partitions=4: each partition's contiguous id-segment is ITS OWN exact
    // sequential fold (bins never span partitions — ≤1 underfilled bin each)
    val dist = Packing.greedyPack(docs, "doc_id", "n_tok", 128, partitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val byPart = dist.groupBy(_._3 >> 32)
    assert(byPart.size > 1, "range partitioning produced a single partition")
    byPart.foreach { case (pid, rows) =>
      val seg = rows.sortBy(_._1)
      val ref = refPack(seg.map(r => (r._1, r._2)).toSeq, 128L)
      val got = seg.map(r => (r._1, r._2, r._3 & 0xffffffffL)).toSeq
      assert(got == ref, s"partition $pid diverged from the sequential fold")
      // ids are contiguous within the segment: range partitioning on doc_id
      val ids = seg.map(_._1)
      assert(ids.last - ids.head + 1 == ids.length, s"partition $pid ids not contiguous")
    }
  }

  test("packing is deterministic and efficiency is reported") {
    val docs = (1L to 300L).map(i => (i, (i * 13 % 60) + 5)).toDF("doc_id", "n_tok")
    val a = Packing.greedyPack(docs, "doc_id", "n_tok", 64, partitions = 3).collect().toSet
    val b = Packing.greedyPack(docs, "doc_id", "n_tok", 64, partitions = 3).collect().toSet
    assert(a == b)
    val stats = Packing.packingStats(
      Packing.greedyPack(docs, "doc_id", "n_tok", 64, partitions = 3), 64).head()
    assert(stats.getLong(0) > 0)
    val fillRatio = stats.getDouble(2)
    assert(fillRatio > 0.5 && fillRatio <= 1.0, s"implausible fill ratio $fillRatio")
  }
}
