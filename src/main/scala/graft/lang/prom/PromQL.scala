package graft.lang.prom

import graft.core.{QueryGrid, TsSchema}
import graft.stages._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ListBuffer

/** PromQL subset: parser + compiler.
  *
  * Reference surface (lang/prom/, SURVEY.md §2.3): executable = selectors with
  * `= != =~ !~` matchers, `rate`/`increase` over range selectors, and
  * `sum/avg/min/max/count [by (…)]` (PromSourceBuilderVisitor.java:155-172,
  * 263-270). The reference merely *parses* the rest (FunctionType enum,
  * lang/prom/common/FunctionType.java:27-102); here the `*_over_time` family
  * and the scalar math functions are executable too — each is one window agg
  * or one column expression in Spark.
  */
object PromQL {

  // ---- AST -----------------------------------------------------------------
  sealed trait Expr
  final case class Selector(metric: Option[String],
                            matchers: List[(String, String, String)]) extends Expr
  final case class Range(sel: Selector, durMs: Long) extends Expr
  final case class Call(fn: String, args: List[Expr], scalarArg: Option[Double]) extends Expr
  final case class Agg(op: String, by: List[String], arg: Expr) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class ScalarLit(v: Double) extends Expr

  final case class PromParseError(msg: String) extends RuntimeException(msg)

  // ---- parser --------------------------------------------------------------
  private final class P(in: String) {
    private var i = 0
    private def ws(): Unit = while (i < in.length && in(i).isWhitespace) i += 1
    private def peek: Char = if (i < in.length) in(i) else '\u0000'
    private def eat(c: Char): Unit = { ws(); if (peek == c) i += 1
      else throw PromParseError(s"expected '$c' at $i in: $in") }
    private def tryEat(c: Char): Boolean = { ws(); if (peek == c) { i += 1; true } else false }
    private def ident(): String = {
      ws(); val s = i
      while (i < in.length && (in(i).isLetterOrDigit || in(i) == '_' || in(i) == ':')) i += 1
      if (i == s) throw PromParseError(s"expected identifier at $s in: $in")
      in.substring(s, i)
    }
    private def number(): Double = {
      ws(); val s = i
      while (i < in.length && (in(i).isDigit || ".eE+-".contains(in(i)) &&
        (i > s || in(i) == '-' || in(i) == '+' || in(i).isDigit))) i += 1
      in.substring(s, i).toDouble
    }
    private def quoted(): String = {
      ws(); val q = peek
      if (q != '"' && q != '\'') throw PromParseError(s"expected string at $i")
      i += 1; val s = i
      while (i < in.length && in(i) != q) i += 1
      val out = in.substring(s, i); i += 1; out
    }
    private def duration(): Long = {
      ws(); val s = i
      while (i < in.length && in(i) != ']') i += 1
      graft.lang.m3.Duration.parse(in.substring(s, i).trim)
        .getOrElse(throw PromParseError(s"bad duration '${in.substring(s, i)}'"))
    }

    private val aggOps = Set("sum", "avg", "min", "max", "count")

    def expr(): Expr = {
      val l = primary()
      ws()
      if (i < in.length && "+-*/".contains(peek) && peek != '\u0000') {
        val op = peek.toString; i += 1
        BinOp(op, l, expr())
      } else l
    }

    def primary(): Expr = {
      ws()
      if (peek.isDigit) return ScalarLit(number())
      val name = ident()
      ws()
      if (aggOps(name) && in.substring(i).trim.startsWith("without"))
        // parse-time parity with the reference (PromSourceBuilderVisitor
        // .java:258-259) — never silently degrade to a selector named "sum"
        throw new UnsupportedOperationException("WITHOUT modifier not yet supported")
      if (aggOps(name) && (peek == '(' || in.substring(i).trim.startsWith("by"))) {
        // sum by (a,b) (expr)  |  sum(expr) [by (a,b)]
        var by = List.empty[String]
        ws()
        if (in.substring(i).trim.startsWith("by")) { ws(); i += 2; by = labelList() }
        eat('(')
        val a = expr()
        eat(')')
        ws()
        if (in.substring(i).trim.startsWith("by")) { ws(); i += 2; by = labelList() }
        Agg(name, by, a)
      } else if (peek == '(') {
        // function call
        i += 1
        val args = ListBuffer.empty[Expr]
        var scalar: Option[Double] = None
        var first = true
        while (!tryEat(')')) {
          if (!first) eat(',')
          first = false
          ws()
          if (peek.isDigit || peek == '-') scalar = Some(number())
          else args += expr()
        }
        Call(name, args.toList, scalar)
      } else {
        // selector
        val sel = selectorTail(Some(name))
        ws()
        if (tryEat('[')) { val d = duration(); eat(']'); Range(sel, d) } else sel
      }
    }

    private def labelList(): List[String] = {
      eat('(')
      val out = ListBuffer.empty[String]
      var first = true
      while (!tryEat(')')) {
        if (!first) eat(',')
        first = false
        out += ident()
      }
      out.toList
    }

    private def selectorTail(metric: Option[String]): Selector = {
      ws()
      val ms = ListBuffer.empty[(String, String, String)]
      if (tryEat('{')) {
        var first = true
        while (!tryEat('}')) {
          if (!first) eat(',')
          first = false
          val k = ident()
          ws()
          val op =
            if (in.startsWith("=~", i)) { i += 2; "=~" }
            else if (in.startsWith("!~", i)) { i += 2; "!~" }
            else if (in.startsWith("!=", i)) { i += 2; "!=" }
            else { eat('='); "=" }
          ms += ((k, op, quoted()))
        }
      }
      Selector(metric, ms.toList)
    }

    /** The whole input must be consumed — otherwise `sum without (mode) (m)`
      * would silently degrade to a selector for a metric named "sum" and
      * return wrong data instead of raising. */
    def parseAll(): Expr = {
      val e = expr()
      ws()
      if (i < in.length)
        throw PromParseError(s"unexpected trailing input at $i: '${in.substring(i)}' in: $in")
      e
    }
  }

  def parse(q: String): Expr = new P(q).parseAll()

  // ---- compiler ------------------------------------------------------------
  final class Compiler(spark: SparkSession, samples: DataFrame, grid: QueryGrid) {
    private val S = TsSchema

    private def mapValue(df: DataFrame)(f: Column => Column): DataFrame =
      df.withColumn(S.Value, f(col(S.Value)))

    /** extra scan lookback needed below `e` (range selectors widen the scan). */
    private def lookback(e: Expr): Long = e match {
      case Range(_, d)       => d
      case Call(_, args, _)  => if (args.isEmpty) 0L else args.map(lookback).max
      case Agg(_, _, a)      => lookback(a)
      case BinOp(_, l, r)    => math.max(lookback(l), lookback(r))
      case _                 => 0L
    }

    def compile(e: Expr): DataFrame = {
      val buf = lookback(e)
      val out = eval(e, QueryGrid(grid.startMs - buf, grid.endMs, grid.stepMs))
      if (buf > 0) Temporal.truncate(out, grid) else out
    }

    private def selectorDF(s: Selector, g: QueryGrid): DataFrame = {
      val base = samples.where(col(S.Ts) >= g.startMs && col(S.Ts) <= g.endMs)
      val withMetric = s.metric match {
        case Some(m) => base.where(col(S.LabelsCol).getItem("name") === m)
        case None    => base
      }
      s.matchers.foldLeft(withMetric) { case (df, (k, op, v)) =>
        val tag = col(S.LabelsCol).getItem(k)
        op match {
          case "="  => df.where(tag === v)
          case "!=" => df.where(tag.isNull || tag =!= v)
          case "=~" => df.where(tag.rlike(s"^(?:$v)$$"))
          case "!~" => df.where(tag.isNull || !tag.rlike(s"^(?:$v)$$"))
        }
      }
    }

    private val overTime = "^(avg|min|max|sum|count|last|quantile|stddev)_over_time$".r

    private def eval(e: Expr, g: QueryGrid): DataFrame = e match {
      case s: Selector => selectorDF(s, g)
      case Range(s, _) => selectorDF(s, g)
      case Agg(op, by, a) =>
        val in = eval(a, g)
        op match {
          case "sum"   => Grouping.sum(in, by)
          case "avg"   => Grouping.avg(in, by)
          case "min"   => Grouping.min(in, by)
          case "max"   => Grouping.max(in, by)
          case "count" => Grouping.countAtTimestamp(in, by)
        }
      case BinOp(op, ScalarLit(v), r) =>
        val in = eval(r, g)
        mapValue(in)(c => binCol(op, lit(v), c))
      case BinOp(op, l, ScalarLit(v)) =>
        val in = eval(l, g)
        mapValue(in)(c => binCol(op, c, lit(v)))
      case BinOp(op, l, r) =>
        val (lf, rf) = (eval(l, g), eval(r, g))
        // PromQL vector matching emits a point only where BOTH operands have
        // one, unlike M3 diff's zero-fill default — keepNans=true is that
        // inner behavior
        // `*`/`/` keep the matched left labels untouched — Prometheus never
        // rewrites labels on vector math (no M3 type:ratios injection)
        op match {
          case "/" => SeriesSet.vectorDivide(lf, rf)
          case "-" => SeriesSet.diff(lf, rf, keepNans = true)
          case "*" => SeriesSet.vectorMultiply(lf, rf)
          case "+" => SeriesSet.diff(lf, mapValue(rf)(c => -c), keepNans = true)
        }
      case ScalarLit(_) =>
        throw PromParseError("bare scalar is not a vector expression")

      case Call(fn, args, scalar) => fn match {
        case "rate" =>
          val Range(s, d) = requireRange(args)
          Temporal.perSecondRate(selectorDF(s, g), d)
        case "increase" =>
          val Range(s, d) = requireRange(args)
          mapValue(Temporal.perSecondRate(selectorDF(s, g), d))(_ * (d / 1000.0))
        case "irate" | "delta" | "deriv" =>
          val Range(s, _) = requireRange(args)
          fn match {
            case "irate" => Temporal.perSecond(selectorDF(s, g))
            case _       => mapValue(Temporal.perSecond(selectorDF(s, g)))(_ * (grid.stepMs / 1000.0))
          }
        case overTime(sub) =>
          val Range(s, d) = requireRange(args)
          val in = selectorDF(s, g)
          sub match {
            case "quantile" => Temporal.movingInclusive(in, d, "median")
            case "last"     => Temporal.movingInclusive(in, d, "last")
            case "stddev"   => Temporal.movingInclusive(in, d, "stddev")
            case f          => Temporal.movingInclusive(in, d, f)
          }
        case "abs"   => mapValue(one(args, g))(abs)
        case "ceil"  => mapValue(one(args, g))(ceil(_).cast("double"))
        case "floor" => mapValue(one(args, g))(floor(_).cast("double"))
        case "exp"   => mapValue(one(args, g))(exp)
        case "ln"    => mapValue(one(args, g))(c => log(c))
        case "log2"  => mapValue(one(args, g))(c => log(2.0, c))
        case "log10" => mapValue(one(args, g))(log10)
        case "sqrt"  => mapValue(one(args, g))(sqrt)
        case "sgn"   => mapValue(one(args, g))(signum)
        case "round" => mapValue(one(args, g))(round(_, 0).cast("double"))
        case "clamp_min" => mapValue(one(args, g))(c => greatest(c, lit(scalar.get)))
        case "clamp_max" => mapValue(one(args, g))(c => least(c, lit(scalar.get)))
        case "sort"      => SeriesSet.sortSeries(one(args, g), "current", desc = false)
        case "sort_desc" => SeriesSet.sortSeries(one(args, g), "current", desc = true)
        case "timestamp" => one(args, g).withColumn(S.Value, col(S.Ts) / 1000.0)
        case "histogram_quantile" =>
          Grouping.histogramQuantile(one(args, g), scalar.getOrElse(0.5))
        case "changes" =>
          val Range(s, d) = requireRange(args)
          Temporal.movingInclusive(Temporal.changed(selectorDF(s, g), g), d, "sum")
        case "resets" =>
          val Range(s, d) = requireRange(args)
          val in = selectorDF(s, g)
          val flagged = in.withColumn(S.Value,
            when(col(S.Value) < lag(col(S.Value), 1).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(S.SeriesId).orderBy(S.Ts)), 1.0).otherwise(0.0))
          Temporal.movingInclusive(flagged, d, "sum")
        case other =>
          throw new UnsupportedOperationException(s"PromQL function not implemented: $other")
      }
    }

    private def binCol(op: String, l: Column, r: Column): Column = op match {
      case "+" => l + r
      case "-" => l - r
      case "*" => l * r
      case "/" => l / r
    }

    private def one(args: List[Expr], g: QueryGrid): DataFrame = eval(args.head, g)
    private def requireRange(args: List[Expr]): Range = args.head match {
      case r: Range => r
      case _        => throw PromParseError("expected range selector m[d]")
    }
  }

  def query(spark: SparkSession, samples: DataFrame, grid: QueryGrid, q: String): DataFrame =
    new Compiler(spark, samples, grid).compile(parse(q))
}
