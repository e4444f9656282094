package graft

/** Smoke runner mirroring the driver's t1 check: entry() on sf0.001 must
  * return rows > 0. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("graft-smoke", 8)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry() rows=${rows.length}")
    rows.take(10).foreach(r => println(s"[smoke] $r"))
    df.explain("formatted")
    spark.stop()
  }
}
