package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement probe (guide §1.4 noop-sink isolation) —
  * NOT part of the bench; removed or inert at round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SCRATCH_BYPASS", "200"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
    }

    if (sys.env.contains("SCRATCH_RATIO")) {
      // decoded/encoded ratio: total UnsafeRow bytes of a full scan vs
      // parquet file size — the honest fileCompressionFactor measurement
      for (t <- Seq("lineitem", "orders", "customer", "documents",
          "embeddings", "events")) {
        val df = graft.core.Tables.load(spark, sfDir, t)
        val decoded = df.queryExecution.toRdd.mapPartitions { it =>
          var b = 0L
          it.foreach {
            case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
              b += u.getSizeInBytes
            case _ => ()
          }
          Iterator.single(b)
        }.sum()
        val enc = new java.io.File(s"$sfDir/$t.parquet").length()
        println(f"RATIO $t%-12s decoded=${decoded / 1e6}%.1fMB " +
          f"encoded=${enc / 1e6}%.1fMB ratio=${decoded / enc}%.2f")
      }
      spark.stop(); return
    }
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    println("docs: " + docs.count())
    val c0 = graft.text.BM25.build(docs, "doc_id", "text")
    val c = c0.copy(postings = c0.postings.persist(),
      termDf = c0.termDf.persist(), stats = c0.stats.persist())
    println("postings rows: " + c.postings.count())
    c.termDf.count(); c.stats.count()

    time("postings cache scan count") { c.postings.count() }
    time("postings cache scan noop") {
      c.postings.write.format("noop").mode("overwrite").save()
    }
    val terms = Seq("spark", "query", "join", "table").toDF("term")
    val tinfo = c.termDf.join(broadcast(terms), "term")
    time("tinfo collect") { tinfo.collect() }
    val joined = c.postings.join(broadcast(tinfo), "term")
    time("postings x tinfo noop") {
      joined.write.format("noop").mode("overwrite").save()
    }
    val scoredNoAgg = joined.crossJoin(broadcast(c.stats))
      .select(col("id"), graft.text.BM25.bm25Term(col("tf"), col("df"),
        col("dl"), col("n_docs"), col("avgdl")).as("s"))
    time("scored (no agg) noop") {
      scoredNoAgg.write.format("noop").mode("overwrite").save()
    }
    val scored = c.score(terms, termsDistinct = true)
    time("full score noop") {
      scored.write.format("noop").mode("overwrite").save()
    }
    time("full search count") { c.search("spark query join table", 10).count() }
    if (sys.env.contains("SCRATCH_LOOP")) {
      println("looping score noop for stack sampling; pid=" +
        java.lang.ProcessHandle.current().pid())
      (1 to 200).foreach { _ =>
        c.score(terms, termsDistinct = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
