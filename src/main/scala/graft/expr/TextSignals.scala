package graft.expr

import java.util.Locale

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Gopher/MassiveText per-document quality signals.
  *
  * One scan of the text (same `[a-z0-9]+` lowercase tokenizer as
  * [[TokenUtil.tokens]] — the contract every TextAnalysis signal is
  * defined over) computes, per row:
  *
  *   n_words          tokens
  *   mean_word_len    Σ length / n              (0.0 when no tokens)
  *   alpha_ratio      tokens containing a letter / n   (0.0 when none)
  *   n_stop_hits      tokens in the stopword set (occurrences)
  *   n_bigrams        max(n − 1, 0)
  *   dup_bigram_ratio 1 − distinct bigrams / n_bigrams (0.0 when none)
  *   top_token_ratio  max token count / n        (0.0 when no tokens)
  *
  * Why a native expression (r19 optimization round, guide §1 measurement):
  * the HOF formulation of just the dup-bigram leg —
  * `transform(sequence(1, size(toks)−1), i => concat_ws(" ",
  * slice(toks, i, 2)))` + `array_distinct` — is evaluated INTERPRETED,
  * and the interpreted evaluator re-evaluates the `toks` child (a full
  * re-tokenization) for every element of the sequence: O(tokens²) work
  * per document, measured at 1.6 s alone over sf0.1's 5000 docs. The
  * top-token leg separately paid an explode + two keyed aggregations +
  * a join back — two shuffles for a value computable in the same single
  * pass. This kernel replaces all of it with one codegen-friendly static
  * call per row; every emitted value is bit-identical to the HOF/agg
  * forms (each is an exact integer count or ONE IEEE division of exact
  * integers — see the per-field notes in [[TextSignalsUtil.signals]]).
  */
object TextSignalsUtil {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("n_stop_hits", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_bigram_ratio", DoubleType, nullable = false),
    StructField("top_token_ratio", DoubleType, nullable = false)))

  /** Kernel entry point — also called from generated code; signature must
    * stay `(UTF8String, java.util.HashSet) => InternalRow`. */
  def signals(text: UTF8String,
              stop: java.util.HashSet[String]): InternalRow = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    val len = s.length
    var n = 0L
    var lenSum = 0L // token lengths are ints: the double fold the HOF
                    // form runs is exact for integer partial sums, so a
                    // long accumulator + one final division is identical
    var alpha = 0L
    var stopHits = 0L
    var maxCount = 0L
    val counts = new java.util.HashMap[String, java.lang.Long]()
    val bigrams = new java.util.HashSet[String]()
    var prev: String = null
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val st = i
        var hasAlpha = false
        while (i < len && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) {
          val d = s.charAt(i)
          if (d >= 'a' && d <= 'z') hasAlpha = true
          i += 1
        }
        val tok = s.substring(st, i)
        n += 1
        lenSum += tok.length
        if (hasAlpha) alpha += 1
        if (stop.contains(tok)) stopHits += 1
        val prevCount = counts.get(tok)
        val cnt = if (prevCount == null) 1L else prevCount.longValue + 1L
        counts.put(tok, cnt)
        if (cnt > maxCount) maxCount = cnt
        if (prev != null) bigrams.add(prev + " " + tok)
        prev = tok
      } else i += 1
    }
    val nBi = if (n > 1) n - 1 else 0L
    new GenericInternalRow(Array[Any](
      n,
      if (n == 0) 0.0 else lenSum.toDouble / n.toDouble,
      if (n == 0) 0.0 else alpha.toDouble / n.toDouble,
      stopHits,
      nBi,
      if (nBi == 0) 0.0 else 1.0 - bigrams.size.toDouble / nBi.toDouble,
      if (n == 0) 0.0 else maxCount.toDouble / n.toDouble))
  }
}

/** `text -> STRUCT<...>` of [[TextSignalsUtil.schema]]; codegen'd via a
  * static call with the stopword set attached as a reference object. */
case class TextSignals(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w))
    s
  }

  override def dataType: DataType = TextSignalsUtil.schema
  override def prettyName: String = "text_signals"

  override protected def nullSafeEval(input: Any): Any =
    TextSignalsUtil.signals(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextSignalsUtil.signals($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextSignals =
    copy(child = newChild)
}

object TextSignals {
  /** Column API: the per-document quality-signal struct. */
  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftSql.column(TextSignals(GraftSql.expression(text), stopwords))
}
