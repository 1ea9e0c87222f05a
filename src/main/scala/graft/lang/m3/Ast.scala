package graft.lang.m3

import graft.stages.Fetch.LabelFilter

/** M3QL AST — mirrors the reference's parse tree shape (parser nodes
  * Root/Macro/Pipeline/Function, lang/m3/m3ql/parser/m3ql.jj:103-130,221):
  * a query is optional macro bindings followed by a main pipeline; a pipeline
  * is a source stage followed by piped stage calls; binary stages take a macro
  * reference argument.
  */
sealed trait Arg
final case class StrArg(v: String) extends Arg
final case class NumArg(v: Double) extends Arg
final case class DurArg(ms: Long) extends Arg
final case class RefArg(name: String) extends Arg   // macro reference (binary stages)
/** Inline parenthesized sub-pipeline: `divide(fetch a:b | sum)` */
final case class PipeArg(pipeline: Pipeline) extends Arg

final case class StageCall(name: String, args: List[Arg])

sealed trait Source
final case class FetchSource(filters: Seq[LabelFilter]) extends Source
final case class MacroSource(name: String) extends Source
/** `mockFetch v1,v2,… [k:v …]` — synthetic series, values laid sequentially on
  * the query grid (ref: MockFetchStage; default label name:mockFetch). */
final case class MockFetchSource(values: List[Double], tags: Seq[(String, String)]) extends Source
/** Parenthesized pipeline group: `(a) | (b)` unions results (ref:
  * UnionFunctionTransformation — union(x,y) == (x) | (y)). */
final case class GroupSource(pipeline: Pipeline) extends Source

final case class Pipeline(source: Source, stages: List[StageCall])

final case class Query(macros: List[(String, Pipeline)], main: Pipeline)

/** Duration literals `10s 5m 2h 7d` → millis
  * (ref: lang/m3/common/M3Duration.java). */
object Duration {
  private val Re = "^(-?)([0-9]+)(ms|s|m|h|d|w)$".r
  /** Negative durations are accepted and returned as their absolute value —
    * the reference shifts forward regardless of sign
    * (ref: TimeshiftStage.java:35-51 "Both positive and negative values
    * result in forward shifting"). */
  def parse(s: String): Option[Long] = s match {
    case Re(_, n, u) =>
      val mult = u match {
        case "ms" => 1L
        case "s"  => 1000L
        case "m"  => 60000L
        case "h"  => 3600000L
        case "d"  => 86400000L
        case "w"  => 604800000L
      }
      Some(n.toLong * mult)
    case _ => None
  }
}
