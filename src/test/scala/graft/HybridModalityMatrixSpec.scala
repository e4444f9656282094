package graft

import graft.filter.{Filter, FilterGroup}
import graft.hybrid.{Hybrid, HybridSearch}
import graft.store.HybridStore
import graft.text.BM25
import graft.vector.Metric
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-for-row port of the reference's hybrid modality-combination
  * matrix (`hybrid_search_index_test.go:10-574`): each modality alone,
  * every pairing, the full three-way search, weighted fusion, removal,
  * explicit ids, and OR filter groups — on the same datasets with the
  * same expected result counts/orderings. The partial-data rows
  * (`:577-644`), empty-index row (`:550-574`) and the serialization
  * matrix (`:645-1101`) are already pinned by FluentSearchSpec and
  * HybridPersistMatrixSpec. `AddWithID` (`:461-492`) is the ONLY id
  * model here — every row carries its explicit id column — so that row
  * ports as id fidelity through the search path.
  */
class HybridModalityMatrixSpec extends SparkSpec {
  import Filter._

  private def pairs(df: DataFrame): Seq[(Long, Double)] =
    df.select("id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("vector-only: cosine top-2 of three docs, sorted strictly by " +
       "score, exact match first (hybrid_search_index_test.go:10-52)") {
    val s = spark; import s.implicits._
    val meta = Seq(1L, 2L, 3L).toDF("id")
    val vectors = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(1f, 0.1f, 0f))
    ).toDF("id", "vector")
    // the Go test's intent on the vector-index surface: nearest-first,
    // strict, exact match leading
    val vs = pairs(graft.vector.VectorSearch.onFlat(vectors, Metric.Cosine)
      .withQuery(Array(1f, 0f, 0f)).withK(2).execute())
    assert(vs.length == 2, s"expected 2 results, got ${vs.length}")
    assert(vs.map(_._1) == Seq(1L, 3L),
      "exact cosine match must rank above the 0.1-perturbed neighbour")
    assert(vs.head._2 < vs(1)._2, "distances not strictly ascending")
    // the hybrid's vector-ONLY form reproduces the reference caveat
    // (Hybrid scaladoc / SURVEY.md §2.9) with ANY fusion kind — a single
    // modality is a passthrough, and the final sort is descending over
    // lower-better distances, so the top-k (still the correct NEAREST
    // two, selected ascending) print farthest-first
    val hy = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withVector(Array(1f, 0f, 0f))
      .withMetric(Metric.Cosine)
      .withK(2).execute())
    assert(hy.map(_._1).toSet == Set(1L, 3L),
      "candidate selection must still be nearest-first")
    assert(hy.map(_._1) == Seq(3L, 1L),
      "vector-only descending-sort caveat no longer reproduces — if " +
        "fusion normalization changed, update this row AND the scaladoc")
  }

  test("text-only: 'quick brown' finds exactly the two quick-brown docs " +
       "(hybrid_search_index_test.go:55-89)") {
    val s = spark; import s.implicits._
    val meta = Seq(1L, 2L, 3L).toDF("id")
    val corpus = BM25.build(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat climbs a tree"),
      (3L, "a lazy dog sleeps all day")).toDF("id", "text"))
    val got = pairs(HybridSearch.on(meta).withCorpus(corpus)
      .withText("quick brown").withK(2).execute())
    assert(got.length == 2, s"expected 2 results, got ${got.length}")
    assert(got.map(_._1).toSet == Set(1L, 2L))
  }

  test("metadata-only: electronics AND price>=500 selects exactly one " +
       "doc, served at the meta-only score (hybrid_search_index_test" +
       ".go:92-138)") {
    val s = spark; import s.implicits._
    val meta = Seq(
      (1L, "electronics", 999), (2L, "electronics", 499), (3L, "books", 29)
    ).toDF("id", "category", "price")
    val got = pairs(HybridSearch.on(meta)
      .withMetadata(Eq("category", "electronics"), Gte("price", 500))
      .withK(10).execute())
    assert(got.length == 1, s"expected 1 result, got ${got.length}")
    assert(got.head._1 == 1L)
  }

  test("vector + metadata: similarity restricted to the electronics " +
       "candidates — the books doc with the SECOND-closest vector never " +
       "surfaces (hybrid_search_index_test.go:141-190)") {
    val s = spark; import s.implicits._
    val meta = Seq(
      (1L, "electronics", 999), (2L, "electronics", 499), (3L, "books", 29)
    ).toDF("id", "category", "price")
    val vectors = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(1f, 0.05f, 0f))
    ).toDF("id", "vector")
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withVector(Array(1f, 0f, 0f))
      .withMetric(Metric.Cosine)
      .withMetadata(Eq("category", "electronics"))
      .withK(10).execute())
    assert(got.length == 2, s"expected 2 results, got ${got.length}")
    assert(got.map(_._1).toSet == Set(1L, 2L),
      "metadata did not restrict the vector candidates")
  }

  test("text + metadata: 'quick brown' restricted to animals AND " +
       "rating>=4 leaves only the fox doc (hybrid_search_index_test" +
       ".go:193-242)") {
    val s = spark; import s.implicits._
    val meta = Seq(
      (1L, "animals", 5), (2L, "animals", 3), (3L, "nature", 4)
    ).toDF("id", "category", "rating")
    val corpus = BM25.build(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat climbs a tree"),
      (3L, "a lazy dog sleeps all day")).toDF("id", "text"))
    val got = pairs(HybridSearch.on(meta).withCorpus(corpus)
      .withText("quick brown")
      .withMetadata(Eq("category", "animals"), Gte("rating", 4))
      .withK(10).execute())
    assert(got.length == 1, s"expected 1 result, got ${got.length}")
    assert(got.head._1 == 1L)
  }

  test("full hybrid: vector + text + metadata over the ai corpus — the " +
       "two ai docs return, sorted strictly by combined score " +
       "(hybrid_search_index_test.go:245-313)") {
    val s = spark; import s.implicits._
    val meta = Seq(
      (1L, "ai", "advanced"), (2L, "ai", "beginner"),
      (3L, "programming", "intermediate")
    ).toDF("id", "category", "level")
    val vectors = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f))
    ).toDF("id", "vector")
    val corpus = BM25.build(Seq(
      (1L, "advanced machine learning algorithms"),
      (2L, "introduction to machine learning"),
      (3L, "data structures and algorithms")).toDF("id", "text"))
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors)).withCorpus(corpus)
      .withVector(Array(1f, 0f, 0f)).withText("machine learning")
      .withMetric(Metric.Cosine)
      .withMetadata(Eq("category", "ai"))
      .withK(10).execute())
    assert(got.length == 2, s"expected 2 results, got ${got.length}")
    assert(got.map(_._1).toSet == Set(1L, 2L))
    assert(got.head._2 > got(1)._2, "results not sorted by combined score")
  }

  test("weighted fusion: weights reach the score combination — both " +
       "weightings return both docs, the fused scores move with the " +
       "weights, and the distance-into-descending-sort caveat reproduces " +
       "(the Go test itself only LOGS the position shift, never asserts " +
       "it: hybrid_search_index_test.go:316-401, t.Logf at :398-400)") {
    val s = spark; import s.implicits._
    val meta = Seq(1L, 2L).toDF("id")
    val vectors = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f))
    ).toDF("id", "vector")
    val corpus = BM25.build(Seq(
      (1L, "machine learning algorithms"),
      (2L, "machine learning basics")).toDF("id", "text"))
    def search(vw: Double, tw: Double) = pairs {
      HybridSearch.on(meta)
        .withVectorLeg(Hybrid.FlatLeg(vectors)).withCorpus(corpus)
        .withVector(Array(1f, 0f, 0f)).withText("machine learning")
        .withMetric(Metric.Cosine)
        .withFusionKind(Hybrid.WeightedSum) // the reference default
        .withWeights(vw, tw)
        .withK(10).execute()
    }
    val equal = search(1.0, 1.0)
    val vecHeavy = search(10.0, 0.1)
    assert(equal.length == 2 && vecHeavy.length == 2,
      "expected 2 results from both searches")
    // weights must actually reach the combination: 10x the vector leg
    // changes every fused score
    assert(equal.toMap != vecHeavy.toMap, "weights did not affect fusion")
    // the caveat reproduced on purpose (SURVEY.md §2.9 / Hybrid scaladoc):
    // WeightedSum adds lower-better cosine DISTANCES into a descending
    // sort, so a heavy vector weight ranks the FAR vector doc first —
    // exactly why the Go test never asserts the position improves
    assert(vecHeavy.head._1 == 2L,
      "distance-weighted descending sort caveat no longer reproduces — " +
        "if fusion normalization changed, update this row AND the scaladoc")
  }

  test("remove: deleting one of two text-matching docs through the " +
       "store facade leaves exactly the other visible to search " +
       "(hybrid_search_index_test.go:404-458)") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hybmatrix").toString
    val hs = new HybridStore(spark, root,
      Hybrid.Config(k = 10, fusion = Hybrid.Rrf))
    hs.append(Seq(
      (1L, Array(1f, 0f, 0f), "test document one", "test"),
      (2L, Array(0f, 1f, 0f), "test document two", "test")
    ).toDF("id", "vector", "text", "tag"))
    val before = pairs(hs.search(queryText = Some("test document")))
    assert(before.length == 2,
      s"expected 2 results before removal, got ${before.length}")
    hs.delete(Seq(1L))
    val after = pairs(hs.search(queryText = Some("test document")))
    assert(after.length == 1,
      s"expected 1 result after removal, got ${after.length}")
    assert(after.head._1 == 2L, "wrong document survived the removal")
    hs.close()
  }

  test("explicit ids: a doc added under id 42 comes back as id 42 from " +
       "a vector search (hybrid_search_index_test.go:461-492)") {
    val s = spark; import s.implicits._
    val meta = Seq(42L).toDF("id")
    val vectors = Seq((42L, Array(1f, 0f, 0f))).toDF("id", "vector")
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withVector(Array(1f, 0f, 0f)).withMetric(Metric.Cosine)
      .withK(1).execute())
    assert(got.length == 1, s"expected 1 result, got ${got.length}")
    assert(got.head._1 == 42L, s"expected id 42, got ${got.head._1}")
  }

  test("metadata OR groups: (electronics AND price>=900) OR (phones AND " +
       "price>=500) selects the two premium docs " +
       "(hybrid_search_index_test.go:495-547)") {
    val s = spark; import s.implicits._
    val meta = Seq(
      (1L, "electronics", 999), (2L, "phones", 599), (3L, "books", 29)
    ).toDF("id", "category", "price")
    val got = pairs(HybridSearch.on(meta)
      .withMetadataGroups(
        FilterGroup(Seq(Eq("category", "electronics"), Gte("price", 900))),
        FilterGroup(Seq(Eq("category", "phones"), Gte("price", 500))))
      .withK(10).execute())
    assert(got.length == 2, s"expected 2 results, got ${got.length}")
    assert(got.map(_._1).toSet == Set(1L, 2L))
  }
}
