package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * For each named query (default: all), after the same warmup the bench
  * does, decomposes one timed invocation into
  *
  *   build  — closure call (may run eager work: fixture hits are cached)
  *   plan   — analysis + optimization + physical planning of the final
  *            frame (forcing queryExecution.executedPlan; driver-side,
  *            data-independent — pure Catalyst cost)
  *   exec   — count() on the planned frame, the bench's timed action,
  *            run twice (min reported like the bench's min-of-2)
  *
  * and reports the executed plan's Exchange count plus the number of
  * Spark jobs the exec pass scheduled. Queries whose closure does eager
  * work per call (store_compact's copy+compact, store_stream_e2e's
  * whole stream) show that in `build`.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Prof /root/testdata/sf0.1 q3_topk ..."
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names: Seq[String] =
      if (args.tail.nonEmpty) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // match the bench session (see Bench.scala): profiling must see the
      // same shuffle writer the bench pays for
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.sources.fileCompressionFactor", "6.0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    val jobDurs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stageInfo =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    // stageId -> (sum task ms, max task ms, tasks, sum deser ms, sum run ms)
    val taskAgg =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        jobStarts.put(js.jobId, js.time); ()
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.get(je.jobId)
        if (s != null) jobDurs.add((je.jobId, je.time - s, "")); ()
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; e <- si.completionTime }
          yield e - s).getOrElse(-1L)
        stageInfo.add((si.stageId, dur, si.numTasks,
          si.name.split(" ").headOption.getOrElse(""))); ()
      }
      // per-stage task-time totals: wall ≫ sum(task) ⇒ scheduling/driver
      // gaps; wall ≈ max(task) ⇒ one straggler/skewed task. deser/run
      // split separates closure deserialization from actual compute.
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskInfo != null) {
          val d = te.taskInfo.duration
          val (ds, rn) =
            if (te.taskMetrics != null)
              (te.taskMetrics.executorDeserializeTime,
                te.taskMetrics.executorRunTime)
            else (0L, 0L)
          taskAgg.merge(te.stageId, (d, d, 1, ds, rn),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3,
              a._4 + b._4, a._5 + b._5)); ()
        }
      }
    })

    // same warmup as Bench: tables + one codegen round + shared indexes
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { graft.core.Tables.load(spark, sfDir, t).count() }
      catch { case _: Throwable => () }
    }
    spark.range(1000).selectExpr("sum(id * 2)").collect()
    try { SparkEntry.warmIndexes(spark, sfDir) }
    catch { case _: Throwable => () }

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    println(f"${"query"}%-26s ${"build"}%8s ${"plan"}%8s ${"exec1"}%8s " +
      f"${"exec2"}%8s ${"jobs"}%5s ${"exch"}%5s")
    names.foreach { n =>
      try {
        // inside the try: one mistyped name must print a per-query ERROR
        // line, not abort the whole profiling run (ADVICE r19)
        val fn = SparkEntry.queries.getOrElse(n,
          throw new NoSuchElementException(s"unknown query '$n'"))
        // first invocation builds fixtures / first-run costs; untimed here
        fn(spark, sfDir).count()
        spark.sparkContext.setJobDescription(s"prof: $n")
        val t0 = System.nanoTime(); val df = fn(spark, sfDir)
        val build = ms(t0)
        val t1 = System.nanoTime()
        val planned = df.queryExecution.executedPlan
        val plan = ms(t1)
        val exch = planned.toString.linesIterator
          .count(l => l.contains("Exchange"))
        jobCount.set(0); jobDurs.clear(); stageInfo.clear(); taskAgg.clear()
        val t2 = System.nanoTime(); df.count(); val e1 = ms(t2)
        // read the job counter AFTER the listener-bus drain sleep — events
        // for just-finished jobs can still be in flight (ADVICE r19)
        Thread.sleep(100)
        val jobs = jobCount.get
        val durs = {
          import scala.jdk.CollectionConverters._
          jobDurs.iterator().asScala.toSeq.sortBy(_._1)
            .map { case (i, d, _) => s"$i:${d}ms" }.mkString(" ")
        }
        val stages = {
          import scala.jdk.CollectionConverters._
          stageInfo.iterator().asScala.toSeq.sortBy(_._1)
            .map { case (i, d, nt, _) =>
              val (sum, mx, _, ds, rn) =
                Option(taskAgg.get(i)).getOrElse((0L, 0L, 0, 0L, 0L))
              s"s$i:${d}ms/${nt}t(sum=${sum}ms,max=${mx}ms,deser=${ds}ms,run=${rn}ms)"
            }
            .mkString(" ")
        }
        val t3 = System.nanoTime(); df.count(); val e2 = ms(t3)
        spark.sparkContext.setJobDescription(null)
        println(f"$n%-26s $build%8.1f $plan%8.1f $e1%8.1f $e2%8.1f " +
          f"$jobs%5d $exch%5d  [$durs]  {$stages}")
      } catch {
        case e: Throwable =>
          println(s"$n ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
