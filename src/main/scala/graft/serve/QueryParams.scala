package graft.serve

import graft.core.QueryGrid

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.{ChronoField, ChronoUnit}

/** OpenSearch-style date-math evaluation for query time parameters
  * (ref: query/rest/BaseTSDBAction.java:48-55 — pattern
  * `strict_date_optional_time||epoch_millis` with date-math, evaluated
  * round-down like parseTimeParam, RestM3QLAction.java:547-551).
  *
  * Grammar: `now` or `<anchor>||`, followed by operations `+Nu`, `-Nu`
  * (arithmetic) and `/u` (round down), with units
  * y M w d h H m s (ref: opensearch common.time.DateMathParser).
  * A bare anchor (ISO-8601 date/date-time or epoch millis) is also accepted.
  */
object DateMath {

  /** Parse a time expression to epoch millis, resolving `now` to `nowMs`. */
  def parse(expr: String, nowMs: Long): Long = {
    val s = expr.trim
    val (anchorMs, rest) =
      if (s == "now" || s.startsWith("now")) (nowMs, s.drop(3))
      else {
        val i = s.indexOf("||")
        if (i >= 0) (parseAnchor(s.substring(0, i)), s.substring(i + 2))
        else (parseAnchor(s), "")
      }
    applyMath(anchorMs, rest)
  }

  private def parseAnchor(a: String): Long =
    // format order is strict_date_optional_time FIRST, then epoch_millis —
    // so "2024" is the year and "2024-01" a month, while longer digit runs
    // (not valid dates) fall through to epoch millis
    if (a.matches("\\d{4}"))
      LocalDate.of(a.toInt, 1, 1).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    else if (a.matches("\\d{4}-\\d{2}"))
      LocalDate.parse(a + "-01", DateTimeFormatter.ISO_LOCAL_DATE)
        .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    else if (a.nonEmpty && a.forall(c => c.isDigit)) a.toLong // epoch_millis
    else {
      // strict_date_optional_time: yyyy-MM-dd['T'HH:mm:ss[.SSS][offset]]
      val t = scala.util.Try(OffsetDateTime.parse(a, DateTimeFormatter.ISO_OFFSET_DATE_TIME)
          .toInstant.toEpochMilli)
        .orElse(scala.util.Try(LocalDateTime.parse(a, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
          .toInstant(ZoneOffset.UTC).toEpochMilli))
        .orElse(scala.util.Try(LocalDate.parse(a, DateTimeFormatter.ISO_LOCAL_DATE)
          .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli))
      t.getOrElse(throw new IllegalArgumentException(s"failed to parse date field [$a]"))
    }

  private val MathOp = """([+\-/])(\d*)([yMwdhHms])""".r

  private def applyMath(anchorMs: Long, math: String): Long = {
    if (math.isEmpty) return anchorMs
    var dt = OffsetDateTime.ofInstant(Instant.ofEpochMilli(anchorMs), ZoneOffset.UTC)
    var consumed = 0
    for (m <- MathOp.findAllMatchIn(math)) {
      if (m.start != consumed)
        throw new IllegalArgumentException(s"invalid date math [$math]")
      consumed = m.end
      val op = m.group(1); val nStr = m.group(2); val unit = m.group(3)
      op match {
        case "/" =>
          if (nStr.nonEmpty)
            throw new IllegalArgumentException(s"invalid date math [$math]")
          dt = roundDown(dt, unit)
        case _ =>
          val n = (if (nStr.isEmpty) 1L else nStr.toLong) * (if (op == "-") -1 else 1)
          dt = unit match {
            case "y"       => dt.plusYears(n)
            case "M"       => dt.plusMonths(n)
            case "w"       => dt.plusWeeks(n)
            case "d"       => dt.plusDays(n)
            case "h" | "H" => dt.plusHours(n)
            case "m"       => dt.plusMinutes(n)
            case "s"       => dt.plusSeconds(n)
          }
      }
    }
    if (consumed != math.length)
      throw new IllegalArgumentException(s"invalid date math [$math]")
    dt.toInstant.toEpochMilli
  }

  private def roundDown(dt: OffsetDateTime, unit: String): OffsetDateTime = unit match {
    case "y"       => dt.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1)
    case "M"       => dt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
    case "w"       => dt.truncatedTo(ChronoUnit.DAYS)
      .`with`(ChronoField.DAY_OF_WEEK, 1)
    case "d"       => dt.truncatedTo(ChronoUnit.DAYS)
    case "h" | "H" => dt.truncatedTo(ChronoUnit.HOURS)
    case "m"       => dt.truncatedTo(ChronoUnit.MINUTES)
    case "s"       => dt.truncatedTo(ChronoUnit.SECONDS)
  }
}

/** The query entry-point parameter surface of the reference's REST layer
  * (ref: query/rest/RestM3QLAction.java:56-140 — start default "now-5m", end
  * default "now", step default 10000 ms; RestPromQLAction.java:290-327 —
  * instant queries evaluate at a single `time`, default now), re-expressed as
  * a library type: `QueryParams(...).grid(nowMs)` yields the QueryGrid the
  * compiler evaluates against. The HTTP transport itself is out of scope —
  * any server can parse its params into this type.
  */
final case class QueryParams(
    query: String,
    start: String = QueryParams.DefaultStart,
    end: String = QueryParams.DefaultEnd,
    stepMs: Long = QueryParams.DefaultStepMs) {

  /** Resolve to an evaluation grid; `start >= end` is rejected exactly like
    * the reference (RestM3QLAction.java:436-440). */
  def grid(nowMs: Long = System.currentTimeMillis()): QueryGrid = {
    val startMs = DateMath.parse(start, nowMs)
    val endMs = DateMath.parse(end, nowMs)
    if (startMs >= endMs)
      throw new IllegalArgumentException(
        s"Invalid time range: start time must be before end time (start=$startMs, end=$endMs)")
    QueryGrid(startMs, endMs, stepMs)
  }
}

object QueryParams {
  val DefaultStart = "now-5m"
  val DefaultEnd = "now"
  val DefaultStepMs = 10000L // ref: RestM3QLAction.DEFAULT_STEP_MS

  /** Instant query: start == end == evaluation time (ref:
    * RestPromQLAction.java:303-313); the grid holds exactly one point. */
  def instant(query: String, time: String = "now", nowMs: Long = System.currentTimeMillis())
      : QueryGrid = {
    val t = DateMath.parse(time, nowMs)
    QueryGrid(t, t + 1, DefaultStepMs)
  }
}
