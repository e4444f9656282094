package graft

import graft.core.Tables
import graft.filter.{Filter, FilterGroup, Filters}
import graft.hybrid.Hybrid
import graft.pipeline.{Dedup, Multimodal, TextAnalysis}
import graft.text.BM25
import graft.vector.{FlatKnn, Metric}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — each entry in [[queries]] is an implemented operator
  * from SURVEY.md §2 (or a training-data pipeline op); [[oracleSql]] holds
  * the equivalent DuckDB SQL over the same parquet tables.
  *
  * Determinism rules shared by both sides: all float math in DOUBLE,
  * identical fold order, outputs rounded (2-6 dp), every result totally
  * ordered with an id tie-break.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def emb(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vector"), col("label"))

  private def docs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")

  private def queryVec(s: SparkSession, dir: String, qid: Long = 0L): DataFrame =
    emb(s, dir).filter(col("id") === qid)
      .select(col("id").as("qid"), col("vector").as("qvec"))

  /** Flagship: full hybrid search (metadata filter → vector + text → RRF
    * fusion → top-k) on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val meta = docs(spark, dir).select(col("doc_id").as("id"), col("lang"),
      col("source"), col("n_chars"))
    val corpus = BM25.build(docs(spark, dir), "doc_id", "text")
    Hybrid.search(
      meta,
      Seq(FilterGroup(Seq(Filter.Eq("lang", "en"), Filter.Gt("n_chars", 100)))),
      Some(emb(spark, dir).select("id", "vector")),
      Some(queryVec(spark, dir)),
      Some(corpus), Some("spark query join table"),
      Hybrid.Config(k = 10, fusion = Hybrid.Rrf))
  }

  // ---------------------------------------------------------------- helpers

  /** Round + re-sort a (vec_id, dist) knn result for cross-engine compare. */
  private def knnOut(df: DataFrame): DataFrame =
    df.select(col("id").as("vec_id"), round(col("score"), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id"))

  private val knnSqlPrefix =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)""".stripMargin

  private def l2Sql(extra: String) =
    s"""$knnSqlPrefix
       |SELECT vec_id, round(dist, 6) AS dist FROM (
       |  SELECT e.vec_id, sqrt(list_sum(list_transform(list_zip(e.v, q.qv),
       |    x -> (x[1]-x[2])*(x[1]-x[2])))) AS dist
       |  FROM e CROSS JOIN q $extra
       |  ORDER BY dist ASC, vec_id ASC LIMIT 10)
       |ORDER BY dist ASC, vec_id ASC""".stripMargin

  // -------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core: scan/filter/agg/join/window/sort/limit ---
    "q1_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q3_topk" -> ((s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      val rev = c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("raw_rev"))
        .orderBy(col("raw_rev").desc, col("o_orderkey")).limit(10)
      rev.select(col("o_orderkey"), round(col("raw_rev"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
    }),
    "q5_join" -> ((s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("num_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("n_name"))
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),
    "q_semi" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q_anti" -> ((s, dir) => {
      T(s, dir, "customer")
        .join(T(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q_events_window" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(avg(col("value")), 4).as("avg_value"))
        .select(col("w.start").cast("string").as("w_start"), col("event_type"),
          col("cnt"), col("avg_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),
    "q_events_json" -> ((s, dir) => {
      T(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1)
          .cast("long"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    // deletes-as-data: tombstone anti-join (SURVEY.md §2.8 soft deletes)
    "q_tombstone" -> ((s, dir) => {
      val tomb = T(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("l_orderkey"))
      T(s, dir, "lineitem")
        .join(tomb, Seq("l_orderkey"), "left_anti")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- metadata filter algebra (Filter ADT → Column) ---
    "f_eq_in" -> ((s, dir) => {
      T(s, dir, "part").filter(Filters.compileAll(Seq(
          Filter.Eq("p_brand", "Brand#1"),
          Filter.In("p_type", Seq("ECONOMY", "PROMO")))))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),
    "f_range" -> ((s, dir) => {
      T(s, dir, "part").filter(Filters.compileAll(Seq(
          Filter.Between("p_retailprice", 950.0, 960.0),
          Filter.Gte("p_size", 10))))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),
    "f_dnf" -> ((s, dir) => {
      T(s, dir, "part").filter(Filters.compileGroups(Seq(
          FilterGroup(Seq(Filter.Eq("p_brand", "Brand#1"), Filter.Lt("p_size", 10))),
          FilterGroup(Seq(Filter.Eq("p_type", "PROMO"),
            Filter.Gt("p_retailprice", 995.0))))))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),
    "f_not" -> ((s, dir) => {
      T(s, dir, "part").filter(Filters.compileAll(Seq(
          Filter.Not(Filter.Between("p_size", 5, 45)),
          Filter.Ne("p_brand", "Brand#2"))))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),
    "f_null" -> ((s, dir) => {
      T(s, dir, "part")
        .withColumn("b", expr("nullif(p_brand, 'Brand#1')"))
        .filter(Filters.compileGroups(Seq(
          FilterGroup(Seq(Filter.NotExists("b"))),
          FilterGroup(Seq(Filter.NotIn("b", Seq("Brand#2", "Brand#3")),
            Filter.Eq("p_size", 1))))))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // --- vector: flat exact kNN (the ANN oracle) ---
    "knn_l2" -> ((s, dir) =>
      knnOut(FlatKnn.search(emb(s, dir).select("id", "vector"),
        queryVec(s, dir), 10, Metric.L2))),
    "knn_cosine" -> ((s, dir) =>
      knnOut(FlatKnn.search(emb(s, dir).select("id", "vector"),
        queryVec(s, dir), 10, Metric.Cosine))),
    "knn_prefilter" -> ((s, dir) => {
      val e = emb(s, dir)
      knnOut(FlatKnn.search(e.select("id", "vector"), queryVec(s, dir), 10,
        Metric.L2,
        candidates = Some(e.filter(col("label").isin(1, 2, 3)).select("id"))))
    }),

    // --- text: BM25 ---
    "bm25_search" -> ((s, dir) => {
      val c = BM25.build(docs(s, dir), "doc_id", "text")
      c.search("spark query join table", 10)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "bm25_morelike" -> ((s, dir) => {
      val c = BM25.build(docs(s, dir), "doc_id", "text")
      c.searchByDocs(Seq(0L), 10)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // --- training-data pipeline ops ---
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text").orderBy(col("keeper"))),
    "text_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "mm_binary" -> ((s, dir) =>
      Multimodal.binaryMeta(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")))
  )

  // ------------------------------------------------------------ oracle SQL

  private val bm25Cte =
    """WITH tok AS (SELECT doc_id AS id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
      |d AS (SELECT id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM tok),
      |post AS (SELECT id, dl, unnest(toks) AS term FROM d),
      |tf AS (SELECT term, id, dl, CAST(count(*) AS DOUBLE) AS tf FROM post GROUP BY 1,2,3),
      |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d)""".stripMargin

  private def bm25ScoreSql(qcte: String) =
    s"""$bm25Cte,
       |$qcte,
       |scored AS (
       |  SELECT tf.id, sum(
       |    ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0) *
       |    tf.tf*(1.2+1.0)/(tf.tf + 1.2*(1.0-0.75+0.75*tf.dl/stats.avgdl))) AS score
       |  FROM tf JOIN df USING(term) JOIN q USING(term) CROSS JOIN stats
       |  GROUP BY tf.id)
       |SELECT id AS doc_id, round(score, 4) AS score FROM (
       |  SELECT * FROM scored ORDER BY score DESC, id LIMIT 10)
       |ORDER BY score DESC, doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, round(raw_rev, 2) AS revenue FROM (
        |  SELECT o_orderkey, sum(l_extendedprice * (1.0 - l_discount)) AS raw_rev
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY o_orderkey ORDER BY raw_rev DESC, o_orderkey LIMIT 10)
        |ORDER BY revenue DESC, o_orderkey""".stripMargin,
    "q5_join" ->
      """SELECT n_name, count(*) AS num_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS w_start, event_type,
        | count(*) AS cnt, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        | round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_tombstone" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f_eq_in" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_brand = 'Brand#1' AND p_type IN ('ECONOMY', 'PROMO')
        |ORDER BY p_partkey""".stripMargin,
    "f_range" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part
        |WHERE p_retailprice BETWEEN 950.0 AND 960.0 AND p_size >= 10
        |ORDER BY p_partkey""".stripMargin,
    "f_dnf" ->
      """SELECT p_partkey, p_brand, p_type, p_size, p_retailprice FROM part
        |WHERE (p_brand = 'Brand#1' AND p_size < 10)
        |   OR (p_type = 'PROMO' AND p_retailprice > 995.0)
        |ORDER BY p_partkey""".stripMargin,
    "f_not" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE NOT (p_size BETWEEN 5 AND 45) AND p_brand <> 'Brand#2'
        |ORDER BY p_partkey""".stripMargin,
    "f_null" ->
      """SELECT p_partkey, p_brand, p_size FROM (
        |  SELECT *, nullif(p_brand, 'Brand#1') AS b FROM part)
        |WHERE (b IS NULL)
        |   OR ((b IS NULL OR b NOT IN ('Brand#2', 'Brand#3')) AND p_size = 1)
        |ORDER BY p_partkey""".stripMargin,
    "knn_l2" -> l2Sql(""),
    "knn_cosine" ->
      s"""$knnSqlPrefix
         |SELECT vec_id, round(dist, 6) AS dist FROM (
         |  SELECT e.vec_id,
         |    least(greatest(1.0 -
         |      list_sum(list_transform(list_zip(e.v, q.qv), x -> x[1]*x[2])) /
         |      (sqrt(list_sum(list_transform(list_zip(e.v, e.v), x -> x[1]*x[2]))) *
         |       sqrt(list_sum(list_transform(list_zip(q.qv, q.qv), x -> x[1]*x[2])))),
         |      0.0), 2.0) AS dist
         |  FROM e CROSS JOIN q
         |  ORDER BY dist ASC, vec_id ASC LIMIT 10)
         |ORDER BY dist ASC, vec_id ASC""".stripMargin,
    "knn_prefilter" -> l2Sql("WHERE e.label IN (1, 2, 3)"),
    "bm25_search" -> bm25ScoreSql(
      "q AS (SELECT unnest(['spark','query','join','table']) AS term)"),
    "bm25_morelike" -> bm25ScoreSql(
      "q AS (SELECT DISTINCT term FROM tf WHERE id = 0)"),
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS cnt, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(toks)) AS BIGINT) AS n_terms,
        | round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS ttr
        |FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_binary" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        | md5(text) AS content_hash,
        | CAST(strlen(text) % 640 AS BIGINT) AS fake_width,
        | CAST(strlen(text) % 480 AS BIGINT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
