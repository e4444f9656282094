package graft

import graft.agg.ScoreAgg
import org.apache.spark.sql.DataFrame

/** Row-for-row port of the segment-merge result semantics
  * (`/root/reference/storage_merge_test.go`): dedup-by-id keeping the
  * HIGHEST score (storage_merge.go:13-38 `mergeResults`) and the
  * descending score sort (`sortResultsByScore`, :40-47). Our analog is
  * [[ScoreAgg.aggregate]] with Max over a (id, score) frame — the same
  * operator the `store_merge` oracle query and HybridStore's segment
  * union use — so these rows pin the library primitive, not a test-local
  * reimplementation.
  */
class MergeSortSemanticsSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "score")
  }

  private def merged(rows: Seq[(Long, Double)]): Seq[(Long, Double)] =
    ScoreAgg.aggregate(frame(rows), ScoreAgg.Max, ascending = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("merge: no duplicates passes scores through " +
      "(storage_merge_test.go:14-26)") {
    val out = merged(Seq(1L -> 0.5, 2L -> 0.8, 3L -> 0.3)).toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.8, 3L -> 0.3))
  }

  test("merge: duplicates keep the highest score per id " +
      "(storage_merge_test.go:27-41)") {
    val out = merged(Seq(
      1L -> 0.5, 2L -> 0.8, 1L -> 0.9, 3L -> 0.3, 2L -> 0.6)).toMap
    assert(out == Map(1L -> 0.9, 2L -> 0.8, 3L -> 0.3))
  }

  test("merge: many duplicates of one id collapse to its max " +
      "(storage_merge_test.go:42-53)") {
    val out = merged(Seq(1L -> 0.1, 1L -> 0.5, 1L -> 0.9, 1L -> 0.3))
    assert(out == Seq(1L -> 0.9))
  }

  test("merge: empty input yields empty output " +
      "(storage_merge_test.go:54-58, 89-100)") {
    assert(merged(Seq.empty).isEmpty)
  }

  test("sort: unsorted results order by score descending " +
      "(storage_merge_test.go:109-118)") {
    val out = merged(Seq(1L -> 0.5, 2L -> 0.9, 3L -> 0.3, 4L -> 0.7))
    assert(out.map(_._1) == Seq(2L, 4L, 1L, 3L))
  }

  test("sort: already-sorted and reverse-sorted inputs " +
      "(storage_merge_test.go:119-136)") {
    assert(merged(Seq(1L -> 0.9, 2L -> 0.7, 3L -> 0.5)).map(_._1)
      == Seq(1L, 2L, 3L))
    assert(merged(Seq(1L -> 0.1, 2L -> 0.5, 3L -> 0.9)).map(_._1)
      == Seq(3L, 2L, 1L))
  }

  test("sort: equal scores are deterministic — id ascending " +
      "(storage_merge_test.go:137-145)") {
    // the reference leaves equal-score order unspecified; ours pins the
    // id-ascending tie-break so repeated runs (and the DuckDB oracle
    // compare) are stable
    val out = merged(Seq(2L -> 0.5, 1L -> 0.5, 3L -> 0.5))
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("sort: empty and single-row inputs survive unchanged " +
      "(storage_merge_test.go:176-193)") {
    assert(merged(Seq.empty).isEmpty)
    assert(merged(Seq(1L -> 0.5)) == Seq(1L -> 0.5))
  }
}
