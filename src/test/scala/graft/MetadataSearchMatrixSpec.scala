package graft

import graft.filter.{Filter, FilterBuilder, FilterGroup, Filters}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-for-row port of the reference's metadata search enumeration
  * (`metadata_index_search_test.go`) — the same datasets and the same
  * pinned id sets, evaluated through [[Filters]] compiled Columns over a
  * metadata DataFrame (our engine's metadata index IS the frame +
  * predicate pushdown; the advanced-expressions func `:221-324` is
  * already ported in FiltersSpec's movie-dataset matrix).
  *
  * Two deliberate schema-engine deviations, both noted inline: booleans
  * are typed (`Eq("in_stock", true)`, not the Go string "true"), and a
  * field NO document carries is modeled as an all-null column — in the
  * dynamic-map engine an unknown field name silently matches nothing,
  * while referencing a column absent from a Spark schema is an analysis
  * error (fail-fast is the correct schema-first behavior).
  */
class MetadataSearchMatrixSpec extends SparkSpec {
  import Filter._

  private def ids(df: DataFrame, fs: Filter*): Set[Long] =
    df.filter(Filters.compileAll(fs)).select("id")
      .collect().map(_.getLong(0)).toSet

  private def groupIds(df: DataFrame, gs: FilterGroup*): Set[Long] =
    df.filter(Filters.compileGroups(gs)).select("id")
      .collect().map(_.getLong(0)).toSet

  private lazy val basic: DataFrame = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "electronics", 100, true),
      (2L, "electronics", 200, false),
      (3L, "books", 15, true),
      (4L, "books", 25, true),
      (5L, "clothing", 50, false)
    ).toDF("id", "category", "price", "in_stock")
  }

  test("basic filters: the eight-row enumeration with pinned id sets " +
       "(metadata_index_search_test.go:10-90)") {
    assert(ids(basic, Eq("category", "electronics")) == Set(1L, 2L))
    assert(ids(basic, Gt("price", 50)) == Set(1L, 2L))
    assert(ids(basic, Lte("price", 25)) == Set(3L, 4L))
    // typed boolean, not the Go string "true"
    assert(ids(basic, Eq("in_stock", true)) == Set(1L, 3L, 4L))
    assert(ids(basic, Eq("category", "books"), Gt("price", 15)) == Set(4L))
    assert(ids(basic, Between("price", 20, 150)) == Set(1L, 4L, 5L))
    assert(ids(basic, Ne("category", "electronics")) == Set(3L, 4L, 5L))
    assert(ids(basic) == Set(1L, 2L, 3L, 4L, 5L), "empty filters = all")
  }

  private lazy val ecommerce: DataFrame = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "laptop", "Apple", 1500, 4.5, true),
      (2L, "laptop", "Dell", 800, 4.2, true),
      (3L, "laptop", "HP", 600, 3.8, false),
      (4L, "phone", "Apple", 1000, 4.7, true),
      (5L, "phone", "Samsung", 900, 4.5, true),
      (6L, "phone", "Google", 700, 4.3, false),
      (7L, "tablet", "Apple", 800, 4.6, true),
      (8L, "tablet", "Samsung", 500, 4.1, true)
    ).toDF("id", "category", "brand", "price", "rating", "verified")
  }

  test("expressive queries over the e-commerce dataset: builder OR " +
       "groups and conjunctions, five rows with pinned id sets " +
       "(metadata_index_search_test.go:93-218)") {
    // (brand = Apple) OR (category = phone AND brand = Samsung)
    val appleOrSamsungPhone = FilterBuilder
      .where(Eq("brand", "Apple"))
      .orWhere(Eq("category", "phone")).and(Eq("brand", "Samsung"))
      .compile()
    assert(ecommerce.filter(appleOrSamsungPhone).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L, 5L, 7L))
    // price >= 900 AND verified AND rating >= 4.5
    assert(ids(ecommerce, Gte("price", 900), Eq("verified", true),
      Gte("rating", 4.5)) == Set(1L, 4L, 5L))
    // price <= 700 AND category IN (phone, tablet)
    assert(ids(ecommerce, Lte("price", 700),
      In("category", Seq("phone", "tablet"))) == Set(6L, 8L))
    // category = laptop AND brand NOT IN (HP)
    assert(ids(ecommerce, Eq("category", "laptop"),
      NotIn("brand", Seq("HP"))) == Set(1L, 2L))
    // price BETWEEN 600 AND 900 AND verified
    assert(ids(ecommerce, Between("price", 600, 900),
      Eq("verified", true)) == Set(2L, 5L, 7L))
  }

  private lazy val sparse: DataFrame = {
    val s = spark; import s.implicits._
    // absent map fields become nulls in the schema engine
    Seq(
      (1L, "Product A", Some(100), Some("electronics"), Option.empty[Int]),
      (2L, "Product B", Some(200), None, None),
      (3L, "Product C", None, Some("books"), None),
      (4L, "Product D", Some(50), Some("clothing"), Some(10)),
      (5L, "Product E", None, None, None)
    ).toDF("id", "name", "price", "category", "discount")
  }

  test("existence queries: Exists/NotExists (and their IsNotNull/IsNull " +
       "aliases) over sparse documents, six rows with pinned id sets " +
       "(metadata_index_search_test.go:324-394)") {
    assert(ids(sparse, Exists("price")) == Set(1L, 2L, 4L))
    assert(ids(sparse, NotExists("category")) == Set(2L, 5L))
    // IsNotNull("discount") — Exists IS the null test here
    assert(ids(sparse, Exists("discount")) == Set(4L))
    // IsNull("discount")
    assert(ids(sparse, NotExists("discount")) == Set(1L, 2L, 3L, 5L))
    assert(ids(sparse, Exists("price"), NotExists("category")) == Set(2L))
    assert(ids(sparse, Exists("category"), NotExists("price")) == Set(3L))
  }

  private lazy val colored: DataFrame = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "red", "small"), (2L, "blue", "medium"), (3L, "green", "large"),
      (4L, "red", "large"), (5L, "yellow", "small")
    ).toDF("id", "color", "size")
  }

  test("IN/NOT-IN operator enumeration (the scalar AnyOf/NoneOf aliases " +
       "coincide with In/NotIn), five rows with pinned id sets " +
       "(metadata_index_search_test.go:397-459)") {
    assert(ids(colored, In("color", Seq("red", "blue"))) == Set(1L, 2L, 4L))
    assert(ids(colored, NotIn("color", Seq("red", "blue"))) == Set(3L, 5L))
    // AnyOf("size", small, large) — scalar alias of In
    assert(ids(colored, In("size", Seq("small", "large")))
      == Set(1L, 3L, 4L, 5L))
    assert(ids(colored, In("color", Seq("red")), NotIn("size", Seq("small")))
      == Set(4L))
    // NoneOf("color", yellow, green) — scalar alias of NotIn
    assert(ids(colored, NotIn("color", Seq("yellow", "green")))
      == Set(1L, 2L, 4L))
  }

  test("Not operator: negated Eq/Gt/Lt/In with pinned id sets " +
       "(metadata_index_search_test.go:462-518)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "active", 100), (2L, "inactive", 50),
      (3L, "active", 75), (4L, "pending", 90)
    ).toDF("id", "status", "score")
    assert(ids(df, Not(Eq("status", "inactive"))) == Set(1L, 3L, 4L))
    assert(ids(df, Not(Gt("score", 75))) == Set(2L, 3L)) // becomes <=
    assert(ids(df, Not(Lt("score", 75))) == Set(1L, 3L, 4L)) // becomes >=
    assert(ids(df, Not(In("status", Seq("active", "pending")))) == Set(2L))
  }

  test("empty-result queries: unmatched value, impossible range, " +
       "contradictory conjunction, and a field no document carries " +
       "(metadata_index_search_test.go:521-568)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "electronics", 100), (2L, "books", 20))
      .toDF("id", "category", "price")
      // the field NO doc has: an all-null column (see class doc — an
      // unknown column NAME is an analysis error in a schema engine)
      .withColumn("nonexistent_field", lit(null).cast("string"))
    assert(ids(df, Eq("category", "nonexistent")).isEmpty)
    assert(ids(df, Gt("price", 1000)).isEmpty)
    assert(ids(df, Eq("category", "electronics"),
      Eq("category", "books")).isEmpty)
    assert(ids(df, Exists("nonexistent_field")).isEmpty)
  }

  test("filter groups: OR-of-AND-groups enumeration with pinned id sets " +
       "(metadata_index_search_test.go:571-632)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "A", 10), (2L, "B", 20), (3L, "A", 30), (4L, "C", 15)
    ).toDF("id", "type", "value")
    assert(groupIds(df,
      FilterGroup(Seq(Eq("type", "A"))),
      FilterGroup(Seq(Eq("type", "B")))) == Set(1L, 2L, 3L))
    assert(groupIds(df,
      FilterGroup(Seq(Eq("type", "A"), Gt("value", 20))),
      FilterGroup(Seq(Eq("type", "B")))) == Set(2L, 3L))
    assert(groupIds(df,
      FilterGroup(Seq(Eq("type", "A"), Lt("value", 20))),
      FilterGroup(Seq(Eq("type", "B"))),
      FilterGroup(Seq(Eq("type", "C")))) == Set(1L, 2L, 4L))
  }
}
