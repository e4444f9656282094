package graft

import graft.hybrid.Hybrid
import graft.store.HybridStore
import org.apache.spark.sql.functions._

/** The store facade's synchronization protocol (VERDICT r16 #4 / ADVICE
  * r16 #2): reads proceed CONCURRENTLY with a long mutation (pre-r16
  * behavior, restored), while close() still waits out every in-flight
  * operation and stays atomic with the closed check (the r16 close-race
  * fix, kept). The mutation side is exercised with an append whose input
  * plan BLOCKS on a latch inside a task, so the overlap windows are
  * deterministic, not sleep-tuned. */
class ConcurrencySpec extends SparkSpec {

  // companion-object method: the gated append's task closure calls it,
  // and an instance method would drag the (non-serializable) suite into
  // the closure
  private def vecOf(i: Long): Array[Float] = ConcurrencySpec.vec(i)

  private def await(t: Thread, ms: Long = 30000): Unit = {
    t.join(ms)
    assert(!t.isAlive, "worker thread did not finish in time")
  }

  test("a search completes WHILE a slow append is in flight (reads are " +
       "not serialized behind the mutation's Spark job), and close() " +
       "waits for the append before releasing the store") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("concread").toString
    val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf)
    val hs = new HybridStore(spark, root, cfg)
    hs.append((0L until 8L).map(id => (id, vecOf(id))).toDF("id", "vector"))
    // build the generation BEFORE the slow append: the concurrent search
    // must serve it without touching the mutation mutex
    assert(hs.search(queryVec = Some(Seq((0L, vecOf(3L))).toDF("qid", "qvec")))
      .count() > 0)

    ConcurrencySpec.gate = new java.util.concurrent.CountDownLatch(1)
    ConcurrencySpec.entered = new java.util.concurrent.CountDownLatch(1)
    // an append whose plan blocks inside its task until the gate opens
    val slowDocs = spark.range(100L, 104L).repartition(1)
      .select(col("id"), col("id").cast("int").as("k"))
      .as[(Long, Int)]
      .map { case (id, _) =>
        ConcurrencySpec.entered.countDown()
        ConcurrencySpec.gate.await()
        (id, ConcurrencySpec.vec(id))
      }.toDF("id", "vector")
    @volatile var appendDone = false
    @volatile var appendErr: Option[Throwable] = None
    val appender = new Thread(() => {
      try { hs.append(slowDocs); appendDone = true }
      catch { case t: Throwable => appendErr = Some(t) }
    })
    appender.start()
    assert(ConcurrencySpec.entered.await(30,
      java.util.concurrent.TimeUnit.SECONDS),
      s"append task never started (done=$appendDone err=$appendErr)")
    try {
      // the append is now provably mid-Spark-job and holding the
      // mutation mutex; a search must still complete (it reads the
      // already-built generation under the lifecycle READ lock only)
      val got = hs.search(
        queryVec = Some(Seq((0L, vecOf(3L))).toDF("qid", "qvec")))
        .collect().map(_.getLong(0)).toSet
      assert(got == (0L until 8L).toSet,
        s"concurrent search served the wrong generation: $got")
      assert(!appendDone && appendErr.isEmpty,
        "the gated append finished early — the overlap was not exercised")

      // close() from another thread must WAIT for the in-flight append
      // (write lock) — never interleave with it around the LOCK release
      @volatile var closeDone = false
      val closer = new Thread(() => { hs.close(); closeDone = true })
      closer.start()
      // the closer must be parked on the write lock while the append runs
      Thread.sleep(300)
      assert(!closeDone, "close() completed while an append was in flight")
      ConcurrencySpec.gate.countDown()
      await(appender)
      assert(appendErr.isEmpty, s"append failed: $appendErr")
      assert(appendDone, "append did not complete after the gate opened")
      await(closer)
      assert(closeDone, "close() never completed after the append drained")
    } finally ConcurrencySpec.gate.countDown() // idempotent safety
    // the store is closed; everything throws per the use-after-close rule
    intercept[IllegalStateException](hs.read())
    intercept[IllegalStateException](
      hs.append(Seq((200L, vecOf(200L))).toDF("id", "vector")))
    // the append that ran BEFORE the close is durable: a reopen serves it
    val hs2 = new HybridStore(spark, root, cfg)
    assert(hs2.read().count() == 12L,
      "the append that close() waited for did not land")
    hs2.close()
  }

  test("close() releases EVERY leg even when an earlier release throws " +
       "(ADVICE r16 #3): runAllSteps runs all steps, rethrows the FIRST " +
       "failure, attaches the rest as suppressed") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val boom = new RuntimeException("text release failed")
    val boom2 = new IllegalStateException("vec release failed")
    val thrown = intercept[RuntimeException] {
      HybridStore.runAllSteps(Seq(
        "a" -> (() => { ran += "a" }),
        "text" -> (() => { ran += "text"; throw boom }),
        "vec" -> (() => { ran += "vec"; throw boom2 }),
        "lock" -> (() => { ran += "lock" })))
    }
    assert(ran == Seq("a", "text", "vec", "lock"),
      s"a throwing step skipped later steps: $ran")
    assert(thrown eq boom, "the FIRST failure must be the one rethrown")
    assert(thrown.getSuppressed.toSeq == Seq(boom2),
      "later failures must ride as suppressed, not vanish")
    // the no-failure path is a plain pass-through
    HybridStore.runAllSteps(Seq("ok" -> (() => ())))
  }
}

object ConcurrencySpec {
  // latches the gated-append tasks block on; static so local-mode executor
  // threads (same JVM) see them
  @volatile var gate: java.util.concurrent.CountDownLatch = _
  @volatile var entered: java.util.concurrent.CountDownLatch = _

  def vec(i: Long): Array[Float] =
    Array.tabulate(4)(j => (math.sin(i * 1.7 + j * 0.9) * 3).toFloat)
}
