package graft

import graft.hybrid.Hybrid
import graft.store.HybridStore
import org.apache.spark.sql.functions._

/** Executor-loss behavior of the EPHEMERAL derived logs (the
  * `persistDerivedText = false` / non-persisted mode documented on
  * BM25Log: materialization is `localCheckpoint`, whose blocks die with
  * their executor and CANNOT recompute — lineage is truncated by
  * design). The contract this spec pins: losing those blocks degrades to
  * a LOUD failure or a correct answer, NEVER a silent wrong answer, and
  * the store rebuilds correctly from its (always durable) segment
  * parquet — the store is the source of truth, the log is a cache. */
class EphemeralRecoverySpec extends SparkSpec {

  test("dropping every cached/checkpointed block mid-soak: the next " +
       "search either throws or answers exactly; a reopened store " +
       "rebuilds the full derived state from segment parquet") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("ephrec").toString
    val cfg = Hybrid.Config(k = 100, fusion = Hybrid.Rrf)
    def open() = new HybridStore(spark, root, cfg,
      persistDerivedText = false)
    var hs = open()
    def rows(ids: Seq[Long]) = ids.map(id =>
      (id, s"body doc$id shared probe marker${id % 3}")).toDF("id", "text")
    hs.append(rows(0L until 8L))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty) // seed
    hs.append(rows(8L until 12L))
    hs.delete(Seq(3L, 9L))
    // canonicalized rows: scores rounded (a rebuilt corpus sums the same
    // per-term contributions in a different partition order — last-ulp
    // float drift is not a divergence), ties re-broken by id
    def canon(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      .sortBy(x => (-x._2, x._1)).toSeq
    val want = canon(hs.search(queryText = Some("shared probe marker1"))
      .collect())

    // simulate executor loss: every persisted/checkpointed block in the
    // context is dropped (this suite runs sequentially in the shared
    // test JVM; plain .persist frames recompute through lineage, only
    // localCheckpoint state is unrecoverable — which is the point)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    val survived =
      try Some(canon(hs.search(queryText = Some("shared probe marker1"))
        .collect()))
      catch { case _: org.apache.spark.SparkException => None }
    survived match {
      case Some(got) => assert(got == want,
        s"post-loss search answered WRONG (the one forbidden outcome): " +
          s"$got vs $want")
      case None => () // loud failure — the acceptable degradation
    }

    // recovery: a fresh open rebuilds the derived state from the durable
    // segments; results equal the pre-loss generation exactly
    hs.close()
    hs = open()
    val rebuilt = canon(hs.search(queryText = Some("shared probe marker1"))
      .collect())
    assert(rebuilt == want,
      s"rebuild from segment parquet diverged: $rebuilt vs $want")
    // and incremental maintenance keeps working after the recovery
    hs.append(rows(Seq(50L)))
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).contains(50L))
    hs.close()
  }
}
