package graft

import graft.agg.ScoreAgg
import graft.expr.Quantizers
import graft.vector.{Hnsw, Kmeans}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized PROPERTY tests (ScalaCheck) over the driver-side kernels —
  * the invariants the reference pins with hand-picked tables
  * (`quantizer_test.go`, `limiter_test.go`, `clustering_test.go`,
  * `hnsw_index_search_test.go`), here quantified over generated inputs.
  * All properties run without Spark jobs, so hundreds of samples cost
  * milliseconds. */
class PropertyKernelSpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), // reproducible runs
      prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  // ---- float16 (quantizer_test.go HalfPrecision families) ----

  private val normalF16: Gen[Float] = for {
    mag <- Gen.chooseNum(6.104e-5, 65504.0) // binary16 normal range
    neg <- Gen.oneOf(true, false)
  } yield (if (neg) -mag else mag).toFloat

  test("property: f16 round trip keeps relative error under 2^-10 on the " +
       "normal range and is idempotent") {
    check(Prop.forAll(normalF16) { x =>
      val rt = Quantizers.fromHalfBits(Quantizers.toHalfBits(x))
      val relErr = math.abs(rt - x) / math.abs(x)
      val again = Quantizers.fromHalfBits(Quantizers.toHalfBits(rt))
      relErr <= math.pow(2, -10) && again == rt
    })
  }

  test("property: f16 conversion is monotone and sign-symmetric") {
    check(Prop.forAll(normalF16, normalF16) { (a, b) =>
      val (fa, fb) = (Quantizers.fromHalfBits(Quantizers.toHalfBits(a)),
        Quantizers.fromHalfBits(Quantizers.toHalfBits(b)))
      val mono = if (a <= b) fa <= fb else fa >= fb
      val negA = Quantizers.fromHalfBits(Quantizers.toHalfBits(-a))
      mono && negA == -fa
    })
  }

  // ---- autocut (limiter.go:81-118) ----

  private val ascScores: Gen[IndexedSeq[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0.0, 10.0))
      .map(_.toIndexedSeq.sorted)

  test("property: autocut index is always in [1, len] for ascending " +
       "scores, and disabled (-1) returns len") {
    check(Prop.forAll(ascScores, Gen.chooseNum(1, 5)) { (scores, nth) =>
      val cut = ScoreAgg.autocutIndex(scores, nth)
      cut >= 1 && cut <= scores.length &&
        ScoreAgg.autocutIndex(scores, -1) == scores.length
    })
  }

  test("property: autocut is monotone in nth — a deeper cutOff never cuts " +
       "earlier") {
    check(Prop.forAll(ascScores, Gen.chooseNum(1, 4)) { (scores, nth) =>
      ScoreAgg.autocutIndex(scores, nth) <=
        ScoreAgg.autocutIndex(scores, nth + 1)
    })
  }

  // ---- k-means centroid lookups (clustering.go FindNearestCentroid*) ----

  private val centroidsGen: Gen[Array[Array[Float]]] = for {
    k <- Gen.chooseNum(1, 12)
    dim <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(k, Gen.listOfN(dim,
      Gen.chooseNum(-100.0, 100.0).map(_.toFloat)))
  } yield cs.map(_.toArray).toArray

  test("property: ranked(v) is a permutation of centroid indices, sorted " +
       "by distance with ties keeping the lower index; head == nearest") {
    val gen = for {
      cs <- centroidsGen
      v <- Gen.listOfN(cs(0).length,
        Gen.chooseNum(-100.0, 100.0).map(_.toFloat)).map(_.toArray)
    } yield (cs, v)
    check(Prop.forAll(gen) { case (cs, v) =>
      val m = Kmeans.Model(cs)
      def d2(c: Array[Float]): Double =
        c.iterator.zip(v.iterator)
          .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      val r = m.ranked(v)
      val isPerm = r.sorted.toSeq == cs.indices.toSeq
      val sortedByDist = r.sliding(2).forall {
        case Array(i, j) =>
          d2(cs(i)) < d2(cs(j)) || (d2(cs(i)) == d2(cs(j)) && i < j)
        case _ => true
      }
      isPerm && sortedByDist && r.head == m.nearest(v)
    })
  }

  // ---- HNSW local graph vs brute force (search accuracy families) ----

  test("property: LocalGraph at exhaustive ef equals brute-force L2 top-k " +
       "on random point sets (hnsw_index_search_test.go:942-1040)") {
    val pointsGen = for {
      n <- Gen.chooseNum(5, 40)
      pts <- Gen.listOfN(n, Gen.listOfN(4,
        Gen.chooseNum(-50.0, 50.0).map(_.toFloat)))
      q <- Gen.listOfN(4, Gen.chooseNum(-50.0, 50.0).map(_.toFloat))
      k <- Gen.chooseNum(1, 10)
    } yield (pts.map(_.toArray).zipWithIndex, q.toArray, k)
    check(Prop.forAll(pointsGen) { case (pts, q, k) =>
      val g = new Hnsw.LocalGraph()
      pts.foreach { case (v, i) => g.add(i.toLong, v) }
      val got = g.search(q, k, efSearch = 1000).map(_._1)
      def dist(v: Array[Float]): Double =
        math.sqrt(v.iterator.zip(q.iterator)
          .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum)
      val brute = pts.sortBy { case (v, i) => (dist(v), i.toLong) }
        .take(k).map(_._2.toLong)
      // compare by distance multiset: equidistant ids may legally swap
      got.map(id => dist(pts(id.toInt)._1)).sorted ==
        brute.map(id => dist(pts(id.toInt)._1)).sorted
    }, minSuccessful = 100)
  }

  test("property: LocalGraph delete-then-search never surfaces deleted ids " +
       "and still matches brute force over the survivors") {
    val gen = for {
      n <- Gen.chooseNum(8, 30)
      pts <- Gen.listOfN(n, Gen.listOfN(3,
        Gen.chooseNum(-20.0, 20.0).map(_.toFloat)))
      nDel <- Gen.chooseNum(1, n - 2)
      q <- Gen.listOfN(3, Gen.chooseNum(-20.0, 20.0).map(_.toFloat))
    } yield (pts.map(_.toArray).zipWithIndex, nDel, q.toArray)
    check(Prop.forAll(gen) { case (pts, nDel, q) =>
      val g = new Hnsw.LocalGraph()
      pts.foreach { case (v, i) => g.add(i.toLong, v) }
      val deleted = pts.take(nDel).map(_._2.toLong).toSet
      deleted.foreach(g.delete)
      val got = g.search(q, pts.length, efSearch = 1000).map(_._1)
      def dist(v: Array[Float]): Double =
        math.sqrt(v.iterator.zip(q.iterator)
          .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum)
      val survivors = pts.filterNot(p => deleted(p._2.toLong))
      got.toSet.intersect(deleted).isEmpty &&
        got.map(id => dist(pts(id.toInt)._1)).sorted ==
          survivors.map(p => dist(p._1)).sorted
    }, minSuccessful = 100)
  }
}
