package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric distance computation (ADC) kernel for PQ scans
  * (pq_index_search.go:218-324: `dist = sqrt(Σ_m table[m][code[m]])`).
  *
  * The per-query (or per-(query,cluster)) distance tables are tiny driver
  * arrays keyed by a long; they ride into codegen as a referenced object,
  * so the scan over the codes column is one static call per row — no UDF
  * boxing of the codes array, no Scala Map lookup per element. At 100 TB
  * the ADC scan IS the PQ search cost; this keeps it inside whole-stage
  * codegen next to the parquet reader.
  */
object AdcUtil {
  /** `tables` is a java HashMap[java.lang.Long, Array[Array[Double]]]. */
  def adc(tables: Object, key: Long, codes: ArrayData): Double = {
    val t = tables.asInstanceOf[java.util.HashMap[java.lang.Long, Array[Array[Double]]]]
      .get(key)
    if (t == null) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < t.length) {
      s += t(i)(codes.getInt(i))
      i += 1
    }
    math.sqrt(s)
  }
}

/** `(key BIGINT, codes ARRAY<INT>) => DOUBLE` ADC distance against
  * broadcast-style reference tables. */
case class AdcDist(left: Expression, right: Expression,
                   tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dist"

  override protected def nullSafeEval(key: Any, codes: Any): Any =
    AdcUtil.adc(tables, key.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTables", tables)
    defineCodeGen(ctx, ev, (k, c) => s"graft.expr.AdcUtil.adc($ref, $k, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

object AdcDist {
  def apply(key: Column, codes: Column,
            tables: Map[Long, Array[Array[Double]]]): Column = {
    val jm = new java.util.HashMap[java.lang.Long, Array[Array[Double]]]()
    tables.foreach { case (k, v) => jm.put(k, v) }
    GraftSql.column(AdcDist(GraftSql.expression(key), GraftSql.expression(codes), jm))
  }
}
