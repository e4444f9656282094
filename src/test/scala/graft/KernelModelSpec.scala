package graft

import graft.expr.{TextShingles, TextTokens}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng, Test => SCTest}

/** Differential tests of the codegen'd text kernels against INDEPENDENT
  * driver-side models over ScalaCheck-generated corpora — one Spark job
  * per test (the whole generated corpus rides a single DataFrame), so
  * hundreds of generated documents cost one action. Complements
  * ExprKernelSpec's kernel-vs-HOF bit parity with kernel-vs-model
  * semantics. */
class KernelModelSpec extends SparkSpec {

  // deterministic sample of generated docs: words of 1-8 [a-z0-9] chars,
  // 0-30 words per doc, plus adversarial rows appended by hand
  private def genDocs(n: Int, seed: Long): Seq[String] = {
    val word = Gen.choose(1, 8).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))).map(_.mkString))
    val doc = Gen.choose(0, 30).flatMap(w => Gen.listOfN(w, word))
      .map(_.mkString(" "))
    val s0 = rng.Seed(seed)
    Iterator.iterate((s0, List.empty[String])) { case (s, acc) =>
      val (next, v) = (s.next, doc.pureApply(Gen.Parameters.default, s))
      (next, v :: acc)
    }.drop(n).next()._2 ++ Seq(
      "",                       // empty doc
      "   ",                    // whitespace only
      "single",                 // one token
      "UPPER Case MiXeD",       // case folding
      "a-b c_d e.f",            // punctuation splits under [a-z0-9]+
      "x x x x x x x x x x")    // heavy repetition
  }

  private def modelTokens(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  test("TextTokens kernel == regex model on 200 generated + adversarial " +
       "docs (single job)") {
    val s = spark
    import s.implicits._
    val docs = genDocs(200, seed = 9L)
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextTokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == modelTokens(t), s"doc $i: '${t.take(60)}'")
    }
  }

  test("TextShingles kernel == sliding-distinct model for n in {2, 3, 8} " +
       "(single job per n)") {
    val s = spark
    import s.implicits._
    val docs = genDocs(150, seed = 23L)
    for (n <- Seq(2, 3, 8)) {
      val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), TextShingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        val toks = modelTokens(t)
        val want =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
        assert(got(i.toLong) == want, s"n=$n doc $i: '${t.take(60)}'")
      }
    }
  }

  test("minhashSignature column == driver model (md5-hash + affine perms " +
       "+ min) on generated docs (single job)") {
    val s = spark
    import s.implicits._
    val docs = genDocs(100, seed = 41L).filter(_.nonEmpty)
    val h = 8; val nSh = 3; val p = 2147483647L
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Dedup.minhashSignature(
        graft.text.Tokenize.simple(col("text")), nSh, h).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    def md5h32(sv: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    docs.zipWithIndex.foreach { case (t, i) =>
      val toks = modelTokens(t)
      val shingles =
        if (toks.length < nSh) Seq.empty
        else toks.sliding(nSh).map(_.mkString(" ")).toSeq.distinct
      val hs = shingles.map(md5h32)
      val want = (0 until h).map { k =>
        val a = 1L + 2L * k; val b = 7919L * (k + 1)
        if (hs.isEmpty) p else hs.map(x => (x * a + b) % p).min
      }
      assert(got(i.toLong) == want, s"doc $i: '${t.take(60)}'")
    }
  }

  test("simhash32 column == driver bit-vote model (single job)") {
    val s = spark
    import s.implicits._
    val docs = genDocs(100, seed = 57L)
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        Dedup.simhash32(graft.text.Tokenize.simple(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def md5h32(sv: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    docs.zipWithIndex.foreach { case (t, i) =>
      val hs = modelTokens(t).map(md5h32)
      val want = (0 until 32).map { j =>
        val vote = hs.map(x => ((x >> j) % 2) * 2 - 1).sum
        if (vote > 0) 1L << j else 0L
      }.sum
      assert(got(i.toLong) == want, s"doc $i: '${t.take(60)}'")
    }
  }
}
