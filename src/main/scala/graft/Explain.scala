package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of named
  * SparkEntry queries' FINAL frame. The final frame itself is not
  * executed, but building it runs whatever the query closure runs eagerly
  * — index training, persistence writes, segment appends — so
  * persistence/store queries do real work (and write scratch data) before
  * their plan prints.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 ivf_prefilter ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // match the bench session's planner-relevant settings (Bench.scala)
      // so dumped plans are the plans the bench executes
      .config("spark.sql.sources.fileCompressionFactor", "6.0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
