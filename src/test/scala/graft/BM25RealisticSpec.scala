package graft

import graft.text.BM25
import org.apache.spark.sql.DataFrame

/** Ranking-quality checks in the spirit of the reference's realistic
  * corpora suites (`bm25_index_search_test.go:566-1260`): term frequency
  * wins, length normalization demotes long documents, rare terms
  * dominate common ones, and non-matching docs never surface. Corpora
  * are our own wording with the same discriminative structure.
  */
class BM25RealisticSpec extends SparkSpec {

  private def build(rows: (Long, String)*): graft.text.BM25Corpus = {
    val s = spark; import s.implicits._
    BM25.build(rows.toDF("id", "text"))
  }

  private def ranked(r: DataFrame): Seq[(Long, Double)] =
    r.collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq

  test("ranking correctness: tf wins, no-match excluded, scores positive " +
       "descending (bm25_index_search_test.go:1204-1260)") {
    val c = build(
      1L -> "cat",
      2L -> "cat cat cat",
      3L -> "cat dog bird fish turtle rabbit hamster",
      4L -> ("a cat is a small mammal kept in many homes and the cat has " +
        "lived beside people for thousands of years as the cat hunts mice"),
      5L -> "a dog is a loyal animal and dogs make great companions")
    val res = ranked(c.search("cat", 10))
    assert(!res.exists(_._1 == 5L))           // no 'cat' in doc 5
    assert(res.take(2).exists(_._1 == 2L))    // tf=3 in a short doc: top-2
    assert(res.forall(_._2 > 0))              // positive scores
    assert(res.map(_._2).sliding(2).forall {  // descending
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("length normalization: same tf, shorter doc scores higher (B=0.75)") {
    val c = build(
      1L -> "cat",                                      // dl=1, tf=1
      2L -> "cat dog bird fish turtle rabbit hamster")  // dl=7, tf=1
    val res = ranked(c.search("cat", 10))
    assert(res.map(_._1) == Seq(1L, 2L))
    assert(res(0)._2 > res(1)._2)
  }

  test("rare terms dominate common ones in multi-term queries") {
    // 'engine' appears in 5 docs, 'felidae' in exactly one: the rare-term
    // doc must outrank docs matching only the common term
    val c = build(
      1L -> "engine parts and engine tools",
      2L -> "engine maintenance guide",
      3L -> "engine history overview",
      4L -> "engine sounds recorded",
      5L -> "felidae taxonomy with one engine mention")
    val res = ranked(c.search("felidae engine", 10))
    assert(res.head._1 == 5L)
  }

  // The reference's Wikipedia-style suite: topic corpora where specific
  // phrases discriminate (memory safety -> Go/Rust; garbage collection ->
  // Go/Python/Ruby but NOT Rust, which only negates it).
  private lazy val wiki = build(
    1L -> ("go is a compiled language from google with memory safety " +
      "garbage collection and builtin concurrency"),
    2L -> ("python is an interpreted language whose design values " +
      "readability and which relies on garbage collection"),
    3L -> "javascript runs in every web browser and powers interactive pages",
    4L -> ("rust is a systems language focused on performance and memory " +
      "safety achieved without garbage collection"),
    5L -> "c is a small portable language standardized decades ago",
    6L -> "java compiles to bytecode that any virtual machine can run",
    7L -> "typescript layers static types over javascript for earlier errors",
    8L -> ("ruby is an interpreted language tuned for programmer happiness " +
      "with dynamic types and garbage collection"),
    9L -> "sql queries relational tables declaratively",
    10L -> "html structures documents for browsers to render",
    11L -> "css styles those documents with cascading rules",
    12L -> "git tracks changes to source files across a team")

  test("wiki corpus: 'memory safety' tops with the two docs that state it") {
    val res = ranked(wiki.search("memory safety", 5))
    assert(res.size >= 2)
    assert(res.take(2).map(_._1).toSet == Set(1L, 4L))
  }

  test("wiki corpus: 'garbage collection' finds the three collectors ahead " +
       "of unrelated docs") {
    val res = ranked(wiki.search("garbage collection", 10))
    val top = res.take(4).map(_._1).toSet
    assert(Set(1L, 2L, 8L).subsetOf(top + 4L)) // rust mentions the phrase too
    assert(!top.contains(9L) && !top.contains(10L))
  }

  test("wiki corpus: 'interpreted language' ranks python and ruby over " +
       "compiled languages") {
    val res = ranked(wiki.search("interpreted language", 10))
    assert(res.take(2).map(_._1).toSet == Set(2L, 8L))
  }
}
