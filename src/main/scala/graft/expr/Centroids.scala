package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd INGEST kernels: centroid assignment, PQ encoding, residual
  * computation. At 100 TB these run once per ingested row (IVF add,
  * ivf_index.go:251-280; PQ encode, pq_index.go:439-507; IVFPQ residual,
  * ivfpq_index.go:467-542) — a Scala UDF there boxes every vector; these
  * stay inside whole-stage codegen with the centroids/codebooks riding in
  * as referenced objects.
  */
object CentroidUtil {

  /** Per-row dim guard for every kernel that indexes into the vector:
    * reading past an UnsafeArrayData's end is a silent garbage read, not
    * an exception, so a wrong-dim row would quietly encode/assign against
    * junk — the reference errors the mismatch at Add
    * (pq_index_test.go:288-318, ivfpq_index_test.go:265-296). One branch
    * per row, negligible against the m·ksub·dsub scan it guards. */
  private def checkDim(v: ArrayData, want: Int, op: String): Unit = {
    val n = v.numElements()
    if (n != want)
      throw new IllegalArgumentException(
        s"$op: vector dim $n != expected dim $want")
  }

  private def l2sqF(v: ArrayData, isF: Boolean, off: Int,
                    cent: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < cent.length) {
      val x = if (isF) v.getFloat(off + i).toDouble else v.getDouble(off + i)
      val d = x - cent(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Index of the nearest centroid (first wins ties — clustering.go
    * nearest loop order). */
  def nearest(v: ArrayData, isF: Boolean, centsObj: Object): Int = {
    val cents = centsObj.asInstanceOf[Array[Array[Float]]]
    if (cents.nonEmpty) checkDim(v, cents(0).length, "nearest_centroid")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = l2sqF(v, isF, 0, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** PQ codes: per subspace, nearest sub-codebook centroid. */
  def pqEncode(v: ArrayData, isF: Boolean, codebooksObj: Object): ArrayData = {
    val books = codebooksObj.asInstanceOf[Array[Array[Array[Float]]]]
    val m = books.length
    val dsub = if (m > 0 && books(0).nonEmpty) books(0)(0).length else 0
    checkDim(v, m * dsub, "pq_encode")
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < books(s).length) {
        val d = l2sqF(v, isF, s * dsub, books(s)(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-bit signature over hyperplanes: bit p set iff `v · plane_p > 0`
    * (random-hyperplane LSH). */
  def signLsh(v: ArrayData, isF: Boolean, planesObj: Object): Int = {
    val planes = planesObj.asInstanceOf[Array[Array[Float]]]
    var sig = 0
    var p = 0
    while (p < planes.length) {
      var d = 0.0
      var i = 0
      while (i < planes(p).length) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        d += x * planes(p)(i)
        i += 1
      }
      if (d > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Dense rotation `out = M v` (OPQ's learned orthogonal transform,
    * applied once per encoded row and once per query — Ge et al.,
    * CVPR 2013). */
  def rotate(v: ArrayData, isF: Boolean, matObj: Object): ArrayData = {
    val mat = matObj.asInstanceOf[Array[Array[Float]]]
    if (mat.nonEmpty) checkDim(v, mat(0).length, "rotate_vec")
    val out = new Array[Any](mat.length)
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      var s = 0.0
      var j = 0
      while (j < row.length) {
        val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
        s += row(j).toDouble * x
        j += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `(cluster, v - centroid[cluster])` — assignment + residual in one
    * pass; returned as residual array, cluster via [[nearest]]. */
  def residual(v: ArrayData, isF: Boolean, cluster: Int,
               centsObj: Object): ArrayData = {
    val cent = centsObj.asInstanceOf[Array[Array[Float]]](cluster)
    checkDim(v, cent.length, "residual")
    val out = new Array[Any](cent.length)
    var i = 0
    while (i < cent.length) {
      val x = if (isF) v.getFloat(i) else v.getDouble(i).toFloat
      out(i) = x - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class CentroidKernel extends UnaryExpression {
  protected def isF: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `vector -> INT` nearest-centroid index. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends CentroidKernel {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(v: Any): Any =
    CentroidUtil.nearest(v.asInstanceOf[ArrayData], isF, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids)
    defineCodeGen(ctx, ev, c => s"graft.expr.CentroidUtil.nearest($c, $isF, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `vector -> ARRAY<INT>` PQ codes. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends CentroidKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    CentroidUtil.pqEncode(v.asInstanceOf[ArrayData], isF, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks)
    defineCodeGen(ctx, ev, c => s"graft.expr.CentroidUtil.pqEncode($c, $isF, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `(vector, cluster INT) -> ARRAY<FLOAT>` residual vs that cluster's
  * centroid. */
case class ResidualVec(left: Expression, right: Expression,
                       centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def isF: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "residual_vec"
  override protected def nullSafeEval(v: Any, c: Any): Any =
    CentroidUtil.residual(v.asInstanceOf[ArrayData], isF,
      c.asInstanceOf[Int], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids)
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.expr.CentroidUtil.residual($v, $isF, $c, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualVec =
    copy(left = newLeft, right = newRight)
}

/** `vector -> ARRAY<FLOAT>` dense orthogonal rotation (OPQ transform). */
case class RotateVec(child: Expression, matrix: Array[Array[Float]])
    extends CentroidKernel {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "rotate_vec"
  override protected def nullSafeEval(v: Any): Any =
    CentroidUtil.rotate(v.asInstanceOf[ArrayData], isF, matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matrix", matrix)
    defineCodeGen(ctx, ev, c => s"graft.expr.CentroidUtil.rotate($c, $isF, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): RotateVec =
    copy(child = newChild)
}

/** `vector -> INT` random-hyperplane sign signature (LSH bucketing —
  * one dot product per plane, per ingested row). */
case class SignLshSig(child: Expression, planes: Array[Array[Float]])
    extends CentroidKernel {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sign_lsh_sig"
  override protected def nullSafeEval(v: Any): Any =
    CentroidUtil.signLsh(v.asInstanceOf[ArrayData], isF, planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes)
    defineCodeGen(ctx, ev, c => s"graft.expr.CentroidUtil.signLsh($c, $isF, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): SignLshSig =
    copy(child = newChild)
}

object CentroidKernels {
  def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column =
    GraftSql.column(NearestCentroid(GraftSql.expression(v), centroids))

  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSql.column(PqEncodeExpr(GraftSql.expression(v), codebooks))

  def residual(v: Column, cluster: Column,
               centroids: Array[Array[Float]]): Column =
    GraftSql.column(ResidualVec(GraftSql.expression(v),
      GraftSql.expression(cluster), centroids))

  def signLsh(v: Column, planes: Array[Array[Float]]): Column =
    GraftSql.column(SignLshSig(GraftSql.expression(v), planes))

  def rotateVec(v: Column, matrix: Array[Array[Float]]): Column =
    GraftSql.column(RotateVec(GraftSql.expression(v), matrix))
}
