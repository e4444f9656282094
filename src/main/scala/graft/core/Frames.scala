package graft.core

import org.apache.spark.sql.DataFrame

/** Cached-frame reclamation shared by the incremental logs (BM25Log,
  * VecLog, PqLog) and the scale probes.
  *
  * Durable pieces are `.persist()`ed parquet reads, which the
  * cache-manager `unpersist` frees. Non-durable pieces and every
  * marker/df-delta/scratch frame are `localCheckpoint`ed, and
  * `Dataset.unpersist` is a NO-OP for those — the blocks belong to the
  * checkpointed RDD, not a cache-manager entry, and only the
  * ContextCleaner would eventually reclaim them. A long-lived in-memory
  * store with churn accumulates them (ADVICE r15), so the checkpointed
  * RDD is unpersisted explicitly here. One shared rule: the next fix to
  * the freeing logic (a new plan shape, say) lands once, not once per
  * log. */
object Frames {
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(false); ()
    case _ => df.unpersist(); ()
  }
}
