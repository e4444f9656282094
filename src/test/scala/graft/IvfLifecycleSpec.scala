package graft

import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized lifecycle interleavings for IVF — the `ivf_index_test.go`
  * lifecycle families (Add / Remove+Flush / retrain / WriteTo/ReadFrom in
  * every order), mirroring PqLifecycleSpec. No exact-codebook trick is
  * needed here: IVF at probe-all is EXHAUSTIVE (every list scanned, raw
  * vectors scored), so the in-memory id→vector map searched by exact
  * Double L2 is a strict oracle after any op sequence. */
class IvfLifecycleSpec extends SparkSpec {

  private val Dim = 4
  private val N = 24

  private def vec(i: Int): Array[Float] = Array(
    (math.sin(i * 0.7) * 3 + (i % 5)).toFloat,
    (math.cos(i * 1.3) * 2).toFloat,
    ((i % 7) * 1.1).toFloat,
    (i * 0.37).toFloat)

  private val universe: Map[Long, Array[Float]] =
    (0 until N).map(i => i.toLong -> vec(i)).toMap

  private def df(ids: Iterable[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.sorted.map(i => (i, universe(i))).toDF("id", "vector")
  }

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private val queries = Seq(
    Array(1.5f, 0.2f, 3.3f, 4.1f),
    Array(-0.5f, 1.9f, 0.0f, 8.2f),
    Array(2.2f, -1.0f, 6.0f, 1.0f))

  private def l2(a: Array[Float], b: Array[Float]): Double =
    math.sqrt((0 until Dim).map(i =>
      (a(i).toDouble - b(i)) * (a(i).toDouble - b(i))).sum)

  private def expect(live: Map[Long, Array[Float]], qv: Array[Float],
                     k: Int): Seq[Long] =
    live.toSeq.map { case (id, v) => (l2(qv, v), id) }.sorted.take(k).map(_._2)

  private def gotIds(res: DataFrame): Seq[Long] =
    res.select("id").collect().map(_.getLong(0)).toSeq

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def buildIvf(ids: Iterable[Long] = universe.keys): Ivf.Index =
    Ivf.build(df(ids), nlist = 3, maxIter = 5)

  private def probeAll(index: Ivf.Index, qv: Array[Float], k: Int) =
    Ivf.search(index, q(qv), k, nprobe = index.model.k)

  private def ivfSoak(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var index = buildIvf()
    var live = universe
    def check(): Unit = {
      val qv = queries(rnd.nextInt(queries.length))
      assert(gotIds(probeAll(index, qv, 8)) == expect(live, qv, 8),
        s"seed=$seed live=${live.keys.toSeq.sorted}")
    }
    for (_ <- 0 until ops) {
      rnd.nextInt(6) match {
        case 0 | 1 => // Remove+Flush (ivf_index_test.go:227-379)
          val victims = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
          index = Ivf.delete(index, victims)
          live = live -- victims
        case 2 => // incremental Add to EXISTING centroids (ivf_index.go:251-280)
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            val back = rnd.shuffle(absent).take(1 + rnd.nextInt(3))
            index = Ivf.add(index, df(back))
            live = live ++ back.map(i => i -> universe(i))
          }
        case 3 => // remove of an absent id is harmless (ivf_index_test.go:285-306)
          index = Ivf.delete(index, Seq(900L, 901L))
        case 4 => // periodic rebuild on the live set (the retrain guidance)
          index = buildIvf(live.keys)
        case 5 => // partitioned persist + reload, continue from loaded state
          val p = tmp("ivfsoak")
          Ivf.writePartitioned(index, p)
          index = Ivf.readPartitioned(spark, p)
      }
      check()
    }
    assert(index.assigned.count() == live.size)
  }

  test("ivf lifecycle soak seed 13: 20 random delete/add/rebuild/persist " +
       "ops at probe-all, flat-oracle top-k after every op " +
       "(ivf_index_test.go lifecycle families)") {
    ivfSoak(seed = 13L, ops = 20)
  }

  test("ivf lifecycle soak seed 59: a different interleaving order") {
    ivfSoak(seed = 59L, ops = 20)
  }

  test("ivf op-pair enumeration: every ordered pair of {delete, add, " +
       "delete-missing, rebuild, persist-reload} preserves the flat oracle") {
    val opNames = Seq("delete", "add", "delete-missing", "rebuild", "persist")
    def run(first: String, second: String): Unit = {
      var index = buildIvf()
      var live = universe
      def apply(op: String): Unit = op match {
        case "delete" =>
          val victims = live.keys.toSeq.sorted.take(3)
          index = Ivf.delete(index, victims); live = live -- victims
        case "add" =>
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            index = Ivf.add(index, df(absent.take(2)))
            live = live ++ absent.take(2).map(i => i -> universe(i))
          }
        case "delete-missing" => index = Ivf.delete(index, Seq(900L))
        case "rebuild" => index = buildIvf(live.keys)
        case "persist" =>
          val p = tmp("ivfpair")
          Ivf.writePartitioned(index, p)
          index = Ivf.readPartitioned(spark, p)
      }
      apply(first); apply(second)
      val got = gotIds(probeAll(index, queries.head, 8))
      assert(got == expect(live, queries.head, 8), s"pair=($first, $second)")
    }
    for (a <- opNames; b <- opNames) run(a, b)
  }

  test("ivf partitioned persist AFTER deletions reloads the flushed state " +
       "— deleted ids never resurface from the cluster= layout") {
    val gone = Seq(2L, 8L, 14L, 20L)
    val index = Ivf.delete(buildIvf(), gone)
    val p = tmp("ivfdel")
    Ivf.writePartitioned(index, p)
    val loaded = Ivf.readPartitioned(spark, p)
    assert(loaded.assigned.count() == N - gone.size)
    val live = universe -- gone
    for (qv <- queries) {
      val got = gotIds(probeAll(loaded, qv, 8))
      assert(got == expect(live, qv, 8))
      assert(got.intersect(gone).isEmpty)
    }
  }

  test("ivf delete-all empties probe-all search; re-add restores exact " +
       "results with the surviving centroids") {
    var index = Ivf.delete(buildIvf(), universe.keys.toSeq)
    assert(probeAll(index, queries.head, 8).collect().isEmpty)
    index = Ivf.add(index, df(universe.keys))
    assert(gotIds(probeAll(index, queries.head, 8)) ==
      expect(universe, queries.head, 8))
  }

  test("ivf add AFTER a rebuild routes through the NEW centroids and " +
       "stays oracle-exact (retrain-then-add, ivf_index_test.go shape)") {
    val partial = (0 until 20).map(_.toLong)
    var index = buildIvf(partial)
    index = Ivf.add(index, df(Seq(20L, 21L, 22L, 23L)))
    assert(index.assigned.count() == N)
    for (qv <- queries)
      assert(gotIds(probeAll(index, qv, 8)) == expect(universe, qv, 8))
    // every added row really sits in its NEAREST surviving centroid's list
    val misrouted = index.assigned.collect().count { r =>
      val v = r.getSeq[Float](1).toArray
      val c = r.getInt(2)
      val best = index.model.centroids.indices
        .minBy(i => l2(v, index.model.centroids(i)))
      c != best
    }
    assert(misrouted == 0, s"$misrouted rows in a non-nearest list")
  }
}
