package graft

import graft.pipeline.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariant properties of the round-10 pipeline operators — facts that
  * must hold on ANY input, complementing the fixture specs. */
class PipelinePropertySpec extends SparkSpec {

  test("dedupLines conservation: across the whole corpus every distinct " +
       "non-empty trimmed line survives EXACTLY once (kept total == " +
       "distinct line count), regardless of how lines are spread") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val lines = (0 until 40).map(i => s"line body number $i")
    val docs = (0L until 60L).map { id =>
      val k = 1 + rnd.nextInt(6)
      val body = Seq.fill(k)(lines(rnd.nextInt(lines.size))) ++
        (if (rnd.nextBoolean()) Seq("   ") else Seq.empty) // blank noise
      (id, body.mkString("\n"))
    }.toDF("id", "text")
    val out = Dedup.dedupLines(docs, "id", "text").collect()
    val keptTotal = out.map(r => r.getLong(1) - r.getLong(2)).sum
    val distinctLines = docs.select(explode(split(col("text"), "\n")).as("l"))
      .select(trim(col("l")).as("l")).filter(length(col("l")) > 0)
      .distinct().count()
    assert(keptTotal == distinctLines,
      s"kept $keptTotal != distinct $distinctLines")
    // and the kept lines, concatenated, contain each distinct line once
    val allKept = out.flatMap(_.getString(3).split("\n")).filter(_.nonEmpty)
    assert(allKept.length == allKept.distinct.length, "a line survived twice")
  }

  test("importanceWeights self-target is exactly zero: when target == raw " +
       "every bucket ratio is 1, ln(1) = 0, and the DECIMAL sum is 0.0 " +
       "for every document") {
    val s = spark
    import s.implicits._
    val docs = (0L until 30L).map(id =>
      (id, s"alpha beta w$id gamma t${id % 7} delta")).toDF("id", "text")
    val w = Curation.importanceWeights(docs, docs, "id", "text",
        buckets = 512, alpha = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.values.forall(_ == 0.0), s"self-target weights nonzero: $w")
  }

  test("lmCrossEntropy self-scoring bound: documents drawn FROM the " +
       "reference never score higher entropy than an all-OOV document") {
    val s = spark
    import s.implicits._
    val ref = (0L until 20L).map(id =>
      (id, "the model sees these words often and again the model sees"))
      .toDF("id", "text")
    val probe = Seq(
      (100L, "the model sees these words often"),
      (101L, "zzq xxv jjw qqp mmn kkl")).toDF("id", "text")
    val ce = TextAnalysis.lmCrossEntropy(probe, ref, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(100L) < ce(101L),
      s"in-reference doc scored higher entropy: $ce")
  }

  test("semanticDedup is partition-order invariant: shuffling and " +
       "repartitioning the input changes nothing in the output") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val embs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0.1f) else Array(0.1f, 1f)
      val v = if (i < 10) base // planted duplicate directions
      else Array(base(0) + rnd.nextFloat() * 0.5f,
        base(1) + rnd.nextFloat() * 0.5f)
      (i, v)
    }.toDF("id", "vector")
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.semanticDedup(df, "id", "vector", cents, 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).sortBy(_._1).toSeq
    val a = run(embs)
    val b = run(embs.repartition(13).orderBy(rand(7)))
    assert(a == b, "semanticDedup depends on partitioning/order")
    assert(a.exists(!_._4), "fixture planted no duplicates")
  }
}
