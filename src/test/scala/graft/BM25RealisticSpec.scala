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

  test("product catalog: brand recall, multi-term category precision, " +
       "exact-model top hit (TestRealisticEcommerceSearch " +
       "bm25_index_search_test.go:701-895, own corpus, same structure)") {
    val c = build(
      // phones 1-4 (two 'orchid' brand), laptops 5-8, headphones 9-12, tvs 13-16
      1L -> "orchid phone nine pro flagship smartphone fast chip great camera",
      2L -> "nimbus galaxy ultra smartphone android stylus camera zoom",
      3L -> "orchid phone eight compact smartphone dual camera long battery",
      4L -> "pinefone open hardware smartphone hackable linux community",
      5L -> "orchid book pro sixteen laptop workstation fast memory bright screen",
      6L -> "nimbus ultrabook slim laptop light magnesium body long battery",
      7L -> "stratus gaming laptop discrete graphics high refresh display",
      8L -> "corvid business laptop docking security chip matte display",
      9L -> "aural max wireless noise cancelling over ear headphones premium",
      10L -> "nimbus buds wireless noise cancelling earbuds compact case",
      11L -> "sonar quiet comfort wireless bluetooth noise cancelling headphones",
      12L -> "aural sport earbuds sweat resistant secure fit wireless",
      13L -> "nimbus oled four k smart tv cinema color gaming hub",
      14L -> "lumen c series oled evo four k smart tv dolby vision",
      15L -> "stratus qled four k smart tv quantum dot high brightness",
      16L -> "vista budget four k led roku tv value pick")
    // brand recall: every 'orchid' product surfaces
    val orchid = ranked(c.search("orchid", 20)).map(_._1).toSet
    assert(Set(1L, 3L, 5L).subsetOf(orchid) && orchid.size == 3)
    // category precision: headphone docs dominate the multi-term query
    val hp = ranked(c.search("wireless noise cancelling headphones", 10))
    assert(hp.size >= 4)
    assert(hp.take(4).map(_._1).count(id => id >= 9L && id <= 12L) >= 3,
      s"headphone category not on top: ${hp.take(4)}")
    // exact model: 'orchid book pro' is the unique laptop of that name
    assert(ranked(c.search("orchid book pro", 5)).head._1 == 5L)
    // feature search: OLED TVs in the top ranks
    val tv = ranked(c.search("oled four k tv", 10))
    assert(tv.take(3).map(_._1).count(id => id >= 13L && id <= 16L) >= 2)
  }

  test("api-doc search: exact function name tops, operation phrases find " +
       "their function, format term recalls its family " +
       "(TestRealisticCodeSearch :897-1016, own corpus, same structure)") {
    val c = build(
      1L -> "readfile reads the entire file and returns its contents as bytes with an error when the file cannot be read",
      2L -> "writefile writes data to a file creating it when missing and truncating when present",
      3L -> "openfile opens a file with flags and permissions more flexible than plain open",
      4L -> "removeall removes a path and any children it contains returning the first error",
      5L -> "jsonmarshal converts a value to json format returning serialized bytes or an error",
      6L -> "jsonunmarshal parses json data and stores the result in the target value",
      7L -> "jsonencoder returns a streaming json encoder writing to an output stream",
      8L -> "copybuffer copies from a source reader to a destination writer until end of stream",
      9L -> "splitstring slices a string into substrings separated by a separator",
      10L -> "joinstrings concatenates slice elements into one string with a separator between",
      11L -> "httpget issues a get request to a url returning the response or an error",
      12L -> "listenandserve listens on a network address and serves requests with a handler")
    assert(ranked(c.search("readfile", 5)).head._1 == 1L)
    // operation phrase: the writer is in the top 2
    val w = ranked(c.search("write data file", 5))
    assert(w.size >= 2 && w.take(2).map(_._1).contains(2L))
    // format family: all three json docs in the top ranks
    val j = ranked(c.search("json", 10))
    assert(j.take(3).map(_._1).toSet == Set(5L, 6L, 7L))
  }

  test("inbox search with UAX#29 addresses: sender address finds the " +
       "thread, project phrase recalls its emails, finance terms stay in " +
       "the invoice cluster (TestRealisticEmailSearch :1018-1202, own " +
       "corpus, same structure)") {
    val s = spark; import s.implicits._
    // UAX#29 splits the address at '@' but keeps 'acme.example' joined
    // (MidNumLet '.') — so a sender query matches the rare local part
    // hard and the shared domain token weakly, ranking the sender's
    // thread on top of the whole inbox
    val c = BM25.build(Seq(
      1L -> "quarterly meeting schedule from dana@acme.example planning meeting tuesday conference room agenda",
      2L -> "quarter budget review from finance@acme.example submit budget proposals personnel equipment costs",
      3L -> "project vega update from rhea@acme.example frontend dashboard complete backend integration progressing",
      4L -> "project vega sprint review from rhea@acme.example demo features discuss next sprint planning",
      5L -> "project vega launch date from rhea@acme.example launch confirmed teams ready by november",
      6L -> "project lyra kickoff from theo@acme.example requirements timeline team assignments monday",
      7L -> "invoice 12345 payment due from billing@vendor.example reminder invoice due march process payment",
      8L -> "invoice 12346 office supplies from supplies@vendor.example invoice october payment terms net thirty",
      9L -> "expense report approved from finance@acme.example reimbursement next paycheck",
      10L -> "security alert password reset from security@acme.example suspicious activity reset password immediately",
      11L -> "security training mandatory from security@acme.example complete awareness training by november",
      12L -> "team lunch tomorrow from mike@acme.example lobby noon italian restaurant"
    ).toDF("id", "text"), tokenizer = graft.text.Tokenize.Uax29)
    val fromRhea = ranked(c.search("rhea@acme.example", 10))
    assert(fromRhea.take(3).map(_._1).toSet == Set(3L, 4L, 5L),
      s"sender's thread not on top: ${fromRhea.take(3)}")
    // the local-part idf gap is decisive: a wide score cliff after rank 3
    assert(fromRhea(2)._2 > fromRhea(3)._2 * 3)
    val vega = ranked(c.search("project vega", 10))
    assert(vega.take(3).map(_._1).toSet == Set(3L, 4L, 5L))
    val invoices = ranked(c.search("invoice payment", 10))
    assert(invoices.take(2).map(_._1).toSet == Set(7L, 8L))
    val sec = ranked(c.search("security password reset", 10))
    assert(sec.head._1 == 10L)
  }
}
