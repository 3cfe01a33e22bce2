package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** How a library operator pins a multiply-read intermediate frame.
  *
  * Several operators here (SimilarityJoin, Contrastive) re-read an expensive
  * intermediate 2-3×; by default they cut its lineage with a LOCAL
  * checkpoint, which is the fastest pin but stores blocks on executors with
  * TRUNCATED lineage — on executor loss or dynamic-allocation decommission
  * the job fails unrecoverably instead of recomputing. That trade is right
  * for a benchmark harness or a static cluster; a long-lived elastic job
  * should pass [[Pin.Persist]] (recomputable from lineage, spills to disk)
  * or [[Pin.Off]] (recompute per read — correct, just slower).
  */
sealed abstract class Pin {
  def apply(df: DataFrame): DataFrame
}

object Pin {

  /** `localCheckpoint` (lazy): truncates lineage, blocks live on executors.
    * Fastest; NOT fault-tolerant to executor loss. The default.
    */
  case object LocalCheckpoint extends Pin {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(false)
  }

  /** `persist(MEMORY_AND_DISK)`: keeps lineage, so lost blocks recompute —
    * the elastic-cluster-safe pin. Caller owns the unpersist (or lets the
    * ContextCleaner GC it).
    */
  case object Persist extends Pin {
    def apply(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** No pin: every consumer recomputes the frame from source. */
  case object Off extends Pin {
    def apply(df: DataFrame): DataFrame = df
  }
}
