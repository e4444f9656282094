package graft

import graft.filter.{Filter, FilterGroup, Filters}
import graft.store.SegmentStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The metadata_index_test.go permutation family (929 LoC in the
  * reference), re-expressed on the engine's metadata layer: FILTER ALGEBRA
  * × ADD/REPLACE/DELETE LIFECYCLE × PERSISTENCE ROUND TRIP. The reference
  * mutates roaring bitmaps / BSI slices in place and re-runs every query
  * family after each mutation and after a WriteTo/ReadFrom cycle
  * (metadata_index_test.go:164-211 Remove, 226-244 Flush, 246-399 typed
  * storage, 533-911 serialization × complex queries). Here the metadata
  * "index" is the segment store's live view (bitmaps replaced by
  * Catalyst predicates over columns) and persistence is the parquet
  * artifact; the invariant checked at EVERY stage is that the compiled
  * Column agrees with the driver-side [[Filters.matchesLocal]] model on
  * an explicitly tracked document map. */
class MetaLifecycleSpec extends SparkSpec {
  import Filter._

  private type Doc = Map[String, Any]

  // the filter catalog: one of every algebra family, over every stored
  // type (categorical, numeric int, numeric float ×100 fixed point,
  // boolean, []string tags), incl. Not() inversions and DNF groups —
  // metadata_index_test.go:813-868 "complex queries" plus the typed
  // storage families
  private val catalog: Seq[Filter] = Seq(
    Eq("category", "electronics"), Ne("category", "electronics"),
    Eq("in_stock", true), Ne("in_stock", true),
    Gt("price", 100L), Gte("price", 150L), Lt("price", 200L),
    Lte("price", 150L), Between("price", 100L, 300L),
    Gte("rating", 4.5), Lt("rating", 4.55),
    In("category", Seq("books", "toys")),
    NotIn("brand", Seq("brand1", "brand2")),
    Exists("rating"), NotExists("rating"),
    Not(Gt("price", 150L)), Not(In("category", Seq("electronics"))),
    Not(Between("price", 100L, 300L)),
    AnyIn("tags", Seq("sale", "new")), NoneIn("tags", Seq("sale")))

  private val dnfGroups: Seq[Seq[FilterGroup]] = Seq(
    Seq(FilterGroup(Seq(Eq("category", "electronics"), Gte("price", 150L))),
      FilterGroup(Seq(Eq("category", "books"), Gte("rating", 4.0)))),
    Seq(FilterGroup(Seq(Eq("in_stock", true), AnyIn("tags", Seq("sale"))),
      and = false)))

  private def doc(id: Long, category: String, brand: String,
                  price: Option[Long], rating: Option[Double],
                  inStock: Boolean, tags: Seq[String]): (Long, Doc) =
    id -> Map("category" -> category, "brand" -> brand,
      "price" -> price.orNull, "rating" -> rating.orNull,
      "in_stock" -> inStock, "tags" -> tags)

  private def frame(docs: Seq[(Long, Doc)]): DataFrame = {
    val s = spark
    import s.implicits._
    docs.map { case (id, m) =>
      (id, m("category").asInstanceOf[String], m("brand").asInstanceOf[String],
        Option(m("price")).map(_.asInstanceOf[Long]),
        Option(m("rating")).map(_.asInstanceOf[Double]),
        m("in_stock").asInstanceOf[Boolean],
        m("tags").asInstanceOf[Seq[String]])
    }.toDF("id", "category", "brand", "price", "rating", "in_stock", "tags")
  }

  /** live-view ids matching a compiled filter vs the matchesLocal model —
    * the single invariant every (filter, stage) cell asserts. */
  private def checkAll(live: DataFrame, model: Map[Long, Doc],
                       stage: String): Unit = {
    val schema = live.schema.fieldNames.zipWithIndex.toMap
    val rows = live.collect()
    val liveIds = rows.map(_.getLong(schema("id"))).toSet
    assert(liveIds == model.keySet,
      s"$stage: live ids $liveIds != model ${model.keySet}")
    catalog.foreach { f =>
      val got = live.filter(Filters.compile(f)).select("id")
        .collect().map(_.getLong(0)).toSet
      val want = model.collect {
        case (id, m) if Filters.matchesLocal(f, m.getOrElse(_, null)) => id
      }.toSet
      assert(got == want, s"$stage / $f: got $got want $want")
    }
    dnfGroups.foreach { gs =>
      val got = live.filter(Filters.compileGroups(gs)).select("id")
        .collect().map(_.getLong(0)).toSet
      val want = model.collect {
        case (id, m) if Filters.matchesGroups(gs, m.getOrElse(_, null)) => id
      }.toSet
      assert(got == want, s"$stage / groups $gs: got $got want $want")
    }
  }

  test("filter algebra × add/replace/delete/compact/reload lifecycle: " +
       "every catalog filter (incl. ×100 float rows and []string tags) " +
       "matches the driver model at every stage " +
       "(metadata_index_test.go:164-399, 533-911)") {
    val root = java.nio.file.Files.createTempDirectory("metalife").toString
    var store = new SegmentStore(spark, root)
    var model = Map.empty[Long, Doc]

    // ADD in two segments (AddMultiple, typed storage families)
    val seg0 = Seq(
      doc(1L, "electronics", "brand1", Some(100L), Some(4.5), true,
        Seq("sale", "featured")),
      doc(2L, "electronics", "brand2", Some(200L), None, true, Seq.empty),
      doc(3L, "books", "brand3", Some(15L), Some(4.8), false, Seq("new")),
      doc(4L, "books", "brand1", None, Some(2.0), true, Seq("sale")),
      // the ×100 fixed-point edge pair: 4.55 vs 4.554 collide under
      // fixed-point compare (metadata_index.go:142-143) but stay distinct
      // under exact compare — both live in the corpus
      doc(5L, "toys", "brand4", Some(150L), Some(4.55), false, Seq.empty))
    val seg1 = Seq(
      doc(6L, "toys", "brand5", Some(300L), Some(4.554), true,
        Seq("new", "clearance")),
      doc(7L, "electronics", "brand2", Some(250L), Some(3.0), false,
        Seq("clearance")))
    store.append(frame(seg0)); model ++= seg0
    store.append(frame(seg1)); model ++= seg1
    checkAll(store.read(), model, "after add")

    // REPLACE: re-append live ids with mutated metadata (category flips,
    // price moves across thresholds, tags change) — newest segment wins
    val repl = Seq(
      doc(3L, "electronics", "brand1", Some(180L), None, true, Seq("sale")),
      doc(6L, "books", "brand2", None, Some(4.9), false, Seq.empty))
    store.append(frame(repl)); model ++= repl
    checkAll(store.read(), model, "after replace")

    // REMOVE: one live id per typed family + a nonexistent id (Remove /
    // RemoveNonexistent — no error, no effect)
    store.delete(Seq(2L, 5L, 999L))
    model --= Seq(2L, 5L)
    checkAll(store.read(), model, "after delete")

    // RESURRECT: a deleted id re-added with fresh metadata is live again
    val back = Seq(doc(2L, "toys", "brand9", Some(120L), Some(1.0), false,
      Seq("new", "sale")))
    store.append(frame(back)); model ++= back
    checkAll(store.read(), model, "after resurrect")

    // FLUSH/COMPACT: a no-op for queries (Flush) — the live view rewritten
    // into one segment must answer every filter identically
    store.compact()
    checkAll(store.read(), model, "after compact")

    // RELOAD: a fresh store over the same root derives everything from
    // disk alone (ReadFrom) — same matrix
    store = new SegmentStore(spark, root)
    checkAll(store.read(), model, "after reload")

    // SERIALIZATION ROUND TRIP of the metadata artifact: write the live
    // view partitioned by category (the meta_persist artifact shape),
    // read back, and re-run the complex-query set — results must be
    // IDENTICAL before and after (SerializationRoundTrip,
    // SerializationComplexQueries)
    val artifact = java.nio.file.Files.createTempDirectory("metaart").toString
    store.read().write.mode("overwrite").partitionBy("category")
      .parquet(artifact)
    val reloaded = spark.read.parquet(artifact)
    checkAll(reloaded.select(store.read().columns.map(col).toIndexedSeq: _*),
      model, "after artifact round trip")
  }

  test("fixed-point ×100 float family across the lifecycle: 4.55 and " +
       "4.554 collide under compileFixedPoint but not under exact " +
       "compare, before AND after mutation + round trip " +
       "(metadata_index.go:142-143)") {
    val root = java.nio.file.Files.createTempDirectory("metafix").toString
    val store = new SegmentStore(spark, root)
    // NOTE 4.57, not 4.56: IEEE 4.56*100 = 455.999..., which TRUNCATES to
    // 455 and would collide with the 4.55 class — the same float-to-int
    // behavior as the reference's int(value*100) (metadata_index.go:142)
    val docs = Seq(
      doc(1L, "a", "b", None, Some(4.55), true, Seq.empty),
      doc(2L, "a", "b", None, Some(4.554), true, Seq.empty),
      doc(3L, "a", "b", None, Some(4.57), true, Seq.empty))
    store.append(frame(docs))
    def fx(f: Filter) = store.read()
      .filter(Filters.compileFixedPoint(f)).select("id")
      .collect().map(_.getLong(0)).toSet
    def exact(f: Filter) = store.read()
      .filter(Filters.compile(f)).select("id")
      .collect().map(_.getLong(0)).toSet
    // truncation to int(x*100): 4.55 and 4.554 both store 455
    assert(fx(Eq("rating", 4.55)) == Set(1L, 2L))
    assert(exact(Eq("rating", 4.55)) == Set(1L))
    assert(fx(Gt("rating", 4.55)) == Set(3L))   // 455 > 455 is false
    assert(exact(Gt("rating", 4.55)) == Set(2L, 3L))
    // delete the collision partner: the fixed-point class shrinks with it
    store.delete(Seq(2L))
    assert(fx(Eq("rating", 4.55)) == Set(1L))
    // and survives compaction + reload
    store.compact()
    val re = new SegmentStore(spark, root)
    assert(re.read().filter(Filters.compileFixedPoint(Eq("rating", 4.55)))
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("tag []string family across the lifecycle: AnyIn/NoneIn track " +
       "replaced and deleted tag lists (metadata_index.go:279-296 " +
       "list-valued fields)") {
    val root = java.nio.file.Files.createTempDirectory("metatags").toString
    val store = new SegmentStore(spark, root)
    val docs = Seq(
      doc(1L, "a", "b", None, None, true, Seq("red", "blue")),
      doc(2L, "a", "b", None, None, true, Seq("green")),
      doc(3L, "a", "b", None, None, true, Seq.empty))
    store.append(frame(docs))
    def anyIn(vs: String*) = store.read()
      .filter(Filters.compile(AnyIn("tags", vs))).select("id")
      .collect().map(_.getLong(0)).toSet
    def noneIn(vs: String*) = store.read()
      .filter(Filters.compile(NoneIn("tags", vs))).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(anyIn("red") == Set(1L) && anyIn("green", "red") == Set(1L, 2L))
    assert(noneIn("red") == Set(2L, 3L)) // empty list qualifies
    // replace doc 1's tags: the old memberships must vanish
    store.append(frame(Seq(doc(1L, "a", "b", None, None, true, Seq("green")))))
    assert(anyIn("red") == Set.empty[Long])
    assert(anyIn("green") == Set(1L, 2L))
    // delete doc 2: gone from every tag query; NoneIn keeps the rest
    store.delete(Seq(2L))
    assert(anyIn("green") == Set(1L))
    assert(noneIn("green") == Set(3L))
  }

  test("empty-index serialization: an empty metadata frame round-trips " +
       "and answers every filter with the empty set " +
       "(metadata_index_test.go:709-744 SerializationEmpty)") {
    val s = spark
    import s.implicits._
    val empty = frame(Seq.empty)
    val path = java.nio.file.Files.createTempDirectory("metaempty").toString
    empty.write.mode("overwrite").parquet(path)
    val re = spark.read.parquet(path)
    assert(re.count() == 0)
    catalog.foreach { f =>
      assert(re.filter(Filters.compile(f)).count() == 0, s"empty / $f")
    }
  }

  test("invalid serialized data fails the read loudly, not with wrong " +
       "results (metadata_index_test.go:746-811 ReadFromInvalidData)") {
    // truncated/garbage parquet: schema inference at read OR the scan at
    // action time must throw — never return partial rows
    val dir = java.nio.file.Files.createTempDirectory("metabad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.parquet"),
      "not a parquet file at all".getBytes("UTF-8"))
    intercept[Exception] {
      spark.read.parquet(dir).collect()
    }
  }
}
