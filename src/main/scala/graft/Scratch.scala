package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement main for the r19 optimization round (deleted at
  * round close): times isolated pieces of the pipeline_e2e hot stage. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.count()
    spark.range(1000).selectExpr("sum(id*2)").collect()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-40s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }

    val d = docs
    println("[scratch] docs rows=" + d.count() +
      " total chars=" + d.agg(sum(length(col("text")))).head().getLong(0))

    val toks = graft.text.Tokenize.simple(col("text"))
    for (round <- 1 to 2) {
      println(s"[scratch] --- round $round ---")
      t("tokenize+size only")(noop(d.select(size(toks).as("n"))))
      t("tokenize+explode+count")(noop(
        d.select(col("doc_id"), explode(toks).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)))))
      t("meanLen HOF aggregate")(noop(d.select(
        (aggregate(toks, lit(0.0), (acc, x) => acc + length(x)) /
          size(toks).cast("double")).as("m"))))
      t("alphaRatio HOF filter+rlike")(noop(d.select(
        (size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
          size(toks).cast("double")).as("a"))))
      t("stopHits HOF filter+isin")(noop(d.select(
        size(filter(toks, x =>
          x.isin(graft.pipeline.TextAnalysis.GopherStopwords.map(lit): _*)))
          .as("s"))))
      t("dupBigram HOF transform+slice")(noop(d.select(
        size(array_distinct(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))).as("b"))))
      t("gopherFilter full")(noop(
        graft.pipeline.TextAnalysis.gopherFilter(d, "doc_id", "text",
          minWords = 25, maxWords = 100000, minMeanWordLen = 3.0,
          maxMeanWordLen = 10.0, minAlphaWordRatio = 0.8, minStopHits = 1,
          maxDupBigram = 0.1, maxTopToken = 0.2)))
      t("pipeline_e2e full")(noop(
        SparkEntry.queries("pipeline_e2e")(spark, sfDir)))
    }
    spark.stop()
  }
}
