package graft

import graft.text.{BM25, TextSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference's BM25 search-edge matrix
  * (`bm25_index_search_test.go`): k sanitization (0/-1 = all, k > corpus
  * = all), OOV-only / punctuation-only / empty queries, empty index,
  * deleted-doc scoring, score ordering, and deterministic tie ordering.
  */
class BM25SearchEdgeSpec extends SparkSpec {

  private def build(rows: (Long, String)*): graft.text.BM25Corpus = {
    val s = spark; import s.implicits._
    BM25.build(rows.toDF("id", "text"))
  }

  private def ids(r: DataFrame): Seq[Long] =
    r.select("id").collect().map(_.getLong(0)).toSeq

  test("k sanitization: 0 and -1 mean ALL, k>n returns n, k=3 returns 3 " +
       "(bm25_index_search_test.go:55-93)") {
    val c = build((1L to 10L).map(i => i -> "the quick brown fox jumps"): _*)
    assert(c.search("quick", 3).count() == 3)
    assert(c.search("quick", 5).count() == 5)
    assert(c.search("quick", 10).count() == 10)
    assert(c.search("quick", 0).count() == 10)   // k=0 -> all
    assert(c.search("quick", -1).count() == 10)  // k=-1 -> all
    assert(c.search("quick", 100).count() == 10) // k>n -> all n
  }

  test("OOV-only, punctuation-only, and empty queries: empty result, " +
       "no error (bm25_index_search_test.go:184-271)") {
    val c = build(1L -> "the quick brown fox", 2L -> "lazy dog sleeps")
    assert(c.search("elephant zebra", 5).count() == 0) // OOV-only
    assert(c.search("!!! ??? ...", 5).count() == 0)    // tokenizes to nothing
    assert(c.search("", 5).count() == 0)               // empty string
    // OOV terms MIXED with present ones score only the present terms
    val mixed = ids(c.search("fox zzzunseen", 5))
    assert(mixed == Seq(1L))
  }

  test("empty index: search returns empty, not error " +
       "(bm25_index_search_test.go:360-376)") {
    val s = spark; import s.implicits._
    val c = BM25.build(Seq.empty[(Long, String)].toDF("id", "text"))
    assert(c.search("test", 5).count() == 0)
  }

  test("score ordering: higher tf ranks first, scores descend " +
       "(bm25_index_search_test.go:378-415)") {
    val c = build(
      1L -> "fox fox fox fox fox", 2L -> "fox fox fox", 3L -> "fox",
      4L -> "the quick brown fox jumps", 5L -> "cat and dog")
    val rows = c.search("fox", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 4) // doc 5 has no 'fox'
    assert(rows.head._1 == 1L)
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("tie ordering: identical docs score equal and order by id ascending") {
    val c = build((1L to 6L).map(i => i -> "same text every doc"): _*)
    val rows = c.search("text", 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.map(_._2).distinct.length == 1) // one tied score
    assert(rows.map(_._1).toSeq == (1L to 6L))  // deterministic id order
    // ... and the result is STABLE across runs
    val again = c.search("text", 0).collect().map(_.getLong(0)).toSeq
    assert(again == (1L to 6L))
  }

  test("deleted docs never score, and stats shift as if rebuilt " +
       "(bm25_index_search_test.go deleted-doc scoring)") {
    val s = spark; import s.implicits._
    val c = build(1L -> "spark fast", 2L -> "spark slow", 3L -> "other words")
    val deleted = BM25.delete(c, Seq(2L).toDF("id"))
    val got = deleted.search("spark", 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L))
    // score equals a FRESH build over the survivors (idf/avgdl updated)
    val fresh = build(1L -> "spark fast", 3L -> "other words")
    val freshGot = fresh.search("spark", 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == freshGot)
    // k > surviving matches still returns just the survivors
    assert(deleted.search("spark", 100).count() == 1)
  }

  test("no query and no node errors; unknown node errors " +
       "(bm25_index_search_test.go:331-358)") {
    val c = build(1L -> "test document")
    intercept[IllegalArgumentException] {
      TextSearch.on(c).withK(5).execute()
    }
    intercept[IllegalArgumentException] {
      TextSearch.on(c).withNodes(999L).withK(5).execute()
    }
  }
}
