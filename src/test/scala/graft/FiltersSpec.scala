package graft

import graft.filter.{Filter, FilterGroup, Filters}
import org.apache.spark.sql.DataFrame

/** Mirrors the reference's metadata filter tests (metadata_index_test.go)
  * on the canonical fixture docs (FIXTURES.md §3). */
class FiltersSpec extends SparkSpec {
  import Filter._

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "electronics", Some(999.0), Some(4.5), true),
      (2L, "electronics", Some(499.0), None, true),
      (3L, "books", Some(29.0), Some(4.8), false),
      (4L, "books", None, Some(2.0), true)
    ).toDF("id", "category", "price", "rating", "in_stock")
  }

  private def ids(f: Filter*): Set[Long] =
    docs.filter(Filters.compileAll(f)).select("id")
      .collect().map(_.getLong(0)).toSet

  test("eq / ne") {
    assert(ids(Eq("category", "electronics")) == Set(1L, 2L))
    assert(ids(Ne("category", "electronics")) == Set(3L, 4L))
  }

  test("range operators") {
    assert(ids(Gt("price", 400.0)) == Set(1L, 2L))
    assert(ids(Gte("price", 499.0)) == Set(1L, 2L))
    assert(ids(Lt("price", 100.0)) == Set(3L))
    assert(ids(Between("price", 29.0, 499.0)) == Set(2L, 3L))
  }

  test("in / not-in (missing field qualifies for not-in, metadata_index.go:311-323)") {
    assert(ids(In("category", Seq("books", "toys"))) == Set(3L, 4L))
    assert(ids(NotIn("category", Seq("electronics"))) == Set(3L, 4L))
    // rating missing on doc 2 -> NotIn over rating must still include it
    assert(ids(NotIn("rating", Seq(4.5))) == Set(2L, 3L, 4L))
  }

  test("exists / not-exists") {
    assert(ids(Exists("rating")) == Set(1L, 3L, 4L))
    assert(ids(NotExists("rating")) == Set(2L))
  }

  test("Not inversion table (metadata_index.go:518-543)") {
    assert(ids(Not(Eq("category", "books"))) == Set(1L, 2L))
    // gt -> lte via the inversion table; BSI comparisons only cover docs
    // that HAVE the field, so the null price (doc 4) is excluded
    assert(ids(Not(Gt("price", 400.0))) == Set(3L))
    assert(ids(Not(Between("price", 29.0, 499.0))) == Set(1L, 4L)) // null price qualifies (bitmap complement)
    assert(ids(Not(Exists("rating"))) == Set(2L))
  }

  test("empty filter list matches all (metadata_index_search.go:143-146)") {
    assert(ids() == Set(1L, 2L, 3L, 4L))
  }

  test("DNF groups: (electronics AND price<500) OR (books AND rating>=4)") {
    val groups = Seq(
      FilterGroup(Seq(Eq("category", "electronics"), Lt("price", 500.0))),
      FilterGroup(Seq(Eq("category", "books"), Gte("rating", 4.0))))
    val got = docs.filter(Filters.compileGroups(groups))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("OR-within-group") {
    val g = FilterGroup(Seq(Eq("category", "books"), Gt("price", 900.0)),
      and = false)
    val got = docs.filter(Filters.compileGroups(Seq(g)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("fixed-point x100 semantics: 29.99 vs 29.994 collide (metadata_index.go:142-143)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 29.99), (2L, 29.994), (3L, 30.0)).toDF("id", "price")
    val got = df.filter(Filters.compileFixedPoint(Eq("price", 29.99)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  private val sampleFilters: Seq[Filter] = Seq(
    Eq("category", "books"), Ne("category", "books"),
    Gt("price", 100.0), Gte("price", 499.0), Lt("price", 999.0),
    Lte("price", 29.0), Between("price", 29.0, 999.0),
    In("category", Seq("electronics")), NotIn("category", Seq("books")),
    Exists("rating"), NotExists("rating"))

  test("boolean fields and mixed-type DNF groups " +
       "(TestMetadataIndexBooleanStorage/MixedFields)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "electronics", 42L, 3.5, true, Seq("new", "sale")),
      (2L, "books", 7L, 4.8, false, Seq("used")),
      (3L, "electronics", 99L, 4.9, true, Seq.empty[String]),
      (4L, "garden", 10L, 2.0, false, Seq("sale"))
    ).toDF("id", "cat", "stock", "rating", "active", "tags")
    def ids(gs: Seq[FilterGroup]): Set[Long] =
      rows.filter(Filters.compileGroups(gs)).select("id")
        .collect().map(_.getLong(0)).toSet
    // boolean equality both ways
    assert(ids(Seq(FilterGroup(Seq(Filter.Eq("active", true))))) == Set(1L, 3L))
    assert(ids(Seq(FilterGroup(Seq(Filter.Ne("active", true))))) == Set(2L, 4L))
    // one group mixing string, long, double, boolean, and list predicates
    val mixed = Seq(FilterGroup(Seq(
      Filter.Eq("cat", "electronics"), Filter.Gt("stock", 50L),
      Filter.Gte("rating", 4.0), Filter.Eq("active", true),
      Filter.NoneIn("tags", Seq("sale")))))
    assert(ids(mixed) == Set(3L))
    // the embedded evaluator agrees on the mixed group (serving parity)
    val fieldIdx = rows.columns.zipWithIndex.toMap
    val local = rows.collect().filter { r =>
      Filters.matchesGroups(mixed, f => fieldIdx.get(f).map(r.get).orNull)
    }.map(_.getLong(0)).toSet
    assert(local == Set(3L))
  }

  test("movie-dataset expressive matrix: pinned result sets " +
       "(metadata_index_search_test.go:221-324)") {
    val s = spark
    import s.implicits._
    val movies = Seq(
      (1L, "action", 2020L, 8.5, "en", "Nolan"),
      (2L, "action", 2019L, 7.8, "en", "Bay"),
      (3L, "comedy", 2021L, 7.2, "en", "Wright"),
      (4L, "drama", 2020L, 9.0, "en", "Nolan"),
      (5L, "drama", 2018L, 8.8, "fr", "Dumont"),
      (6L, "comedy", 2022L, 6.5, "en", "Apatow"),
      (7L, "action", 2022L, 7.5, "en", "Nolan"),
      (8L, "scifi", 2021L, 8.2, "en", "Villeneuve")
    ).toDF("id", "genre", "year", "rating", "language", "director")
    def run(groups: Seq[FilterGroup]): Set[Long] =
      movies.filter(Filters.compileGroups(groups)).select("id")
        .collect().map(_.getLong(0)).toSet
    // (genre IN (action, scifi)) AND year >= 2020 AND rating >= 8.0
    assert(run(Seq(FilterGroup(Seq(In("genre", Seq("action", "scifi")),
      Gte("year", 2020L), Gte("rating", 8.0))))) == Set(1L, 8L))
    // director = Nolan OR (genre = drama AND rating >= 8.5)
    assert(run(Seq(
      FilterGroup(Seq(Eq("director", "Nolan"))),
      FilterGroup(Seq(Eq("genre", "drama"), Gte("rating", 8.5)))))
      == Set(1L, 4L, 5L, 7L))
    // genre = comedy AND NOT (rating < 7.0)
    assert(run(Seq(FilterGroup(Seq(Eq("genre", "comedy"),
      Not(Lt("rating", 7.0)))))) == Set(3L))
    // (year >= 2020 AND rating >= 8.0 AND language = en)
    //   OR (director = Nolan AND genre = action)
    assert(run(Seq(
      FilterGroup(Seq(Gte("year", 2020L), Gte("rating", 8.0),
        Eq("language", "en"))),
      FilterGroup(Seq(Eq("director", "Nolan"), Eq("genre", "action")))))
      == Set(1L, 4L, 7L, 8L))
  }

  test("property: double inversion is identity on match sets") {
    sampleFilters.foreach { f =>
      assert(ids(f) == ids(Not(Not(f))), s"Not(Not($f))")
    }
  }

  test("FilterBuilder chain == manual FilterGroup construction") {
    val built = graft.filter.FilterBuilder
      .where(Eq("brand", "B1")).and(Lt("price", 100.0))
      .orWhere(Eq("type", "PROMO"))
      .orAnyOf(Eq("brand", "B2"), Eq("brand", "B3"))
      .groups()
    val manual = Seq(
      FilterGroup(Seq(Eq("brand", "B1"), Lt("price", 100.0))),
      FilterGroup(Seq(Eq("type", "PROMO"))),
      FilterGroup(Seq(Eq("brand", "B2"), Eq("brand", "B3")), and = false))
    assert(built == manual)
  }

  /** Docs with a list-valued tags field (comet's []string, node.go:130);
    * doc 4 has no tags at all — the complement must still include it. */
  private lazy val tagged: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some(Seq("red", "sale"))),
      (2L, Some(Seq("blue"))),
      (3L, Some(Seq("red", "blue", "new"))),
      (4L, Option.empty[Seq[String]]),
      (5L, Some(Seq.empty[String]))
    ).toDF("id", "tags")
  }
  private def tids(f: Filter*): Set[Long] =
    tagged.filter(Filters.compileAll(f)).select("id")
      .collect().map(_.getLong(0)).toSet

  test("AnyIn over a list field matches when ANY tag is in the set (metadata_index.go:279-296)") {
    assert(tids(AnyIn("tags", Seq("red"))) == Set(1L, 3L))
    assert(tids(AnyIn("tags", Seq("red", "blue"))) == Set(1L, 2L, 3L))
    assert(tids(AnyIn("tags", Seq("missing"))) == Set.empty)
  }

  test("NoneIn: complement includes docs with no tags and empty tag lists") {
    assert(tids(NoneIn("tags", Seq("red"))) == Set(2L, 4L, 5L))
    assert(tids(Not(AnyIn("tags", Seq("red")))) == Set(2L, 4L, 5L))
    assert(tids(Not(NoneIn("tags", Seq("red")))) == Set(1L, 3L))
  }

  test("property: AnyIn over a list == any-of exploded Eq") {
    import org.apache.spark.sql.functions._
    val sets = Seq(Seq("red"), Seq("blue", "new"), Seq("sale", "missing"))
    sets.foreach { vs =>
      val viaExplode = tagged
        .select(col("id"), explode(col("tags")).as("tag"))
        .filter(col("tag").isin(vs: _*))
        .select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(tids(AnyIn("tags", vs)) == viaExplode, s"AnyIn($vs)")
    }
  }

  test("property: matchesLocal == compiled Column on every sample filter (embedded evaluator parity)") {
    // (fields must exist in the schema for the Column side to compile —
    // "missing" on the local side means a null value, not an absent column)
    val all = sampleFilters ++ sampleFilters.map(Not(_)) ++ Seq[Filter](
      Between("price", 29.0, 499.0), Not(Between("price", 29.0, 499.0)),
      Eq("in_stock", true), Ne("in_stock", true))
    val schema = docs.schema.fieldNames.zipWithIndex.toMap
    val rows = docs.collect()
    all.foreach { f =>
      val viaColumn = ids(f)
      val viaLocal = rows.filter { r =>
        Filters.matchesLocal(f, name => schema.get(name).map(i =>
          if (r.isNullAt(i)) null else r.get(i)).orNull)
      }.map(_.getLong(0)).toSet
      assert(viaLocal == viaColumn, s"local/Column divergence on $f")
    }
  }

  test("property: matchesGroups == compileGroups on DNF groups incl. lists") {
    val groupSets = Seq(
      Seq(FilterGroup(Seq(Eq("category", "electronics"), Lt("price", 500.0))),
        FilterGroup(Seq(Eq("category", "books"), Gte("rating", 4.0)))),
      Seq(FilterGroup(Seq(Eq("category", "books"), Gt("price", 900.0)),
        and = false)),
      Seq.empty[FilterGroup])
    val schema = docs.schema.fieldNames.zipWithIndex.toMap
    val rows = docs.collect()
    groupSets.foreach { gs =>
      val viaColumn = docs.filter(Filters.compileGroups(gs))
        .select("id").collect().map(_.getLong(0)).toSet
      val viaLocal = rows.filter { r =>
        Filters.matchesGroups(gs, name => schema.get(name).map(i =>
          if (r.isNullAt(i)) null else r.get(i)).orNull)
      }.map(_.getLong(0)).toSet
      assert(viaLocal == viaColumn, s"groups divergence on $gs")
    }
    // list-valued fields through the local evaluator
    val tagSchema = tagged.schema.fieldNames.zipWithIndex.toMap
    val tagRows = tagged.collect()
    Seq[Filter](AnyIn("tags", Seq("red", "new")), NoneIn("tags", Seq("blue")),
      Not(AnyIn("tags", Seq("sale")))).foreach { f =>
      val viaColumn = tids(f)
      val viaLocal = tagRows.filter { r =>
        Filters.matchesLocal(f, name => tagSchema.get(name).map(i =>
          if (r.isNullAt(i)) null else r.get(i)).orNull)
      }.map(_.getLong(0)).toSet
      assert(viaLocal == viaColumn, s"list divergence on $f")
    }
  }

  test("property: invert() complements within docs that have the field") {
    val numeric = Seq[Filter](
      Gt("price", 100.0), Gte("price", 499.0), Lt("price", 999.0),
      Lte("price", 29.0))
    val withField = ids(Exists("price"))
    numeric.foreach { f =>
      assert((ids(f) & ids(Filter.invert(f))) == Set.empty, s"overlap $f")
      assert(((ids(f) | ids(Filter.invert(f))) & withField) == withField,
        s"cover $f")
    }
  }
}
