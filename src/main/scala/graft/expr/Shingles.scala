package graft.expr

import java.util.Locale

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram shingling kernel.
  *
  * Semantics are identical to `Dedup.shingles(Tokenize.simple(text), n)`:
  * lowercase, tokenize `[a-z0-9]+` runs, emit the DISTINCT n-grams joined
  * by a single space, in first-occurrence order; fewer than `n` tokens =>
  * empty array; null text => null.
  *
  * Why a native expression: the equivalent built-in pipeline
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))` +
  * `array_distinct`) is a nest of higher-order functions that Catalyst
  * cannot codegen — it is evaluated interpreted, re-allocating a sliced
  * array per shingle, and it gets re-evaluated inside `Generate` when the
  * shingle column is exploded. Measured at sf0.1 that put `dedup_jaccard`
  * at ~26 s; this kernel is one tight pass per row (~µs) and stays inside
  * whole-stage codegen via a static call, so explode-heavy dedup plans
  * (MinHash LSH banding, Jaccard postings joins — shingling is the inner
  * loop at 100 TB) scan at parquet-read speed.
  *
  * Shingle construction per the reference's word-n-gram dedup shape
  * (cf. comet's tokenizer normalize+segment, bm25_index.go:154-166).
  */
object ShingleUtil {

  /** Kernel entry point — also called from generated code, so the
    * signature must stay `(UTF8String, int) => ArrayData`. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    val len = s.length
    // tokenize: [a-z0-9]+ runs, recorded as (start, end) offsets
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val st = i
        i += 1
        while (i < len && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        starts.add(st)
        ends.add(i)
      } else i += 1
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var t = 0
    while (t <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts.get(t + j), ends.get(t + j))
        j += 1
      }
      seen.add(sb.toString)
      t += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** [[ShingleUtil]] companion kernel: plain tokenization (NON-distinct,
  * in order — BM25 term frequency needs duplicates). Same scanner as
  * [[ShingleUtil.shingles]]: lowercase, `[a-z0-9]+` runs. */
object TokenUtil {
  def tokens(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    val len = s.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val st = i
        i += 1
        while (i < len && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out.add(UTF8String.fromString(s.substring(st, i)))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `text -> ARRAY<STRING>` lowercase alnum-run tokens; codegen'd via a
  * static call. Replaces the `filter(split(regexp_replace(lower(...))))`
  * pipeline (interpreted HOF, pathological inside Generate). */
case class TextTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokenUtil.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenUtil.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TextTokens =
    copy(child = newChild)
}

object TextTokens {
  /** Column API: lowercase `[a-z0-9]+` run tokens of raw text. */
  def apply(text: Column): Column =
    GraftSql.column(TextTokens(GraftSql.expression(text)))
}

/** `text -> ARRAY<STRING>` distinct word n-gram shingles; codegen'd via a
  * static call into [[ShingleUtil.shingles]]. */
case class TextShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TextShingles =
    copy(child = newChild)
}

object TextShingles {
  /** Column API: distinct word n-gram shingles of raw text. */
  def apply(text: Column, n: Int): Column =
    GraftSql.column(TextShingles(GraftSql.expression(text), n))
}
