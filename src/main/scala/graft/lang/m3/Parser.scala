package graft.lang.m3

import graft.stages.Fetch
import scala.collection.mutable.ListBuffer

/** Hand-rolled recursive-descent M3QL parser.
  *
  * Grammar (ref: lang/m3/m3ql/parser/m3ql.jj — tokens :49-84, root/macros
  * :103-130, fetch :221):
  *
  * {{{
  *   query    := (ident '=' pipeline ';')* pipeline ';'?
  *   pipeline := source ('|' stage)*
  *   source   := 'fetch' labelFilter*            | ident   (macro ref)
  *   stage    := ident arg*                      — Graphite-style, space args
  *             | ident '(' ident ')' arg*        — binary form w/ macro ref
  *             | cmpOp number                    — value filter sugar: `> 5`
  *   arg      := number | duration | quotedStr | ident | ident ':' value
  * }}}
  */
object Parser {
  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at $pos")

  // ---- lexer ---------------------------------------------------------------
  sealed trait Tok { def pos: Int }
  final case class TIdent(s: String, pos: Int) extends Tok   // incl. k:v forms
  final case class TNum(v: Double, pos: Int) extends Tok
  final case class TStr(s: String, pos: Int) extends Tok
  final case class TOp(s: String, pos: Int) extends Tok      // | ; = ( ) , cmp-ops

  private val cmpOps = Set(">", ">=", "<", "<=", "==", "!=")

  def lex(in: String): Vector[Tok] = {
    val out = ListBuffer.empty[Tok]
    var i = 0
    def peek = if (i < in.length) in(i) else '\u0000'
    while (i < in.length) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val q = c; val start = i; i += 1
        val sb = new StringBuilder
        while (i < in.length && in(i) != q) { sb += in(i); i += 1 }
        if (i >= in.length) throw ParseError("unterminated string", start)
        i += 1
        out += TStr(sb.toString, start)
      } else if ("|;=(),".contains(c) && !(c == '=' && i + 1 < in.length && in(i + 1) == '=')) {
        out += TOp(c.toString, i); i += 1
      } else if ("<>!=".contains(c)) {
        val start = i
        val two = in.substring(i, math.min(i + 2, in.length))
        if (two == ">=" || two == "<=" || two == "==" || two == "!=") { out += TOp(two, start); i += 2 }
        else if (c == '>' || c == '<') { out += TOp(c.toString, start); i += 1 }
        else {
          // '!' begins a negated fetch value like !a or !(a,b) — lex as word
          val sb = new StringBuilder
          while (i < in.length && !in(i).isWhitespace && !"|;".contains(in(i))) { sb += in(i); i += 1 }
          out += TIdent(sb.toString, start)
        }
      } else {
        val start = i
        val sb = new StringBuilder
        // words may contain ':' '*' '?' '.' '-' '_' and value-parens
        // "user:(a,b)" — consume until whitespace/pipeline delimiters; parens
        // count only inside k:v values (after a ':'), so a call's closing ')'
        // still terminates the word
        var stop = false
        var depth = 0
        while (i < in.length && !stop) {
          val ch = in(i)
          if (ch.isWhitespace || ch == '|' || ch == ';') stop = true
          else if (ch == '=' && !sb.exists(_ == ':')) stop = true   // macro binding a=fetch
          else if (ch == '(' && !sb.exists(_ == ':')) stop = true
          else if (ch == '(') { depth += 1; sb += ch; i += 1 }
          else if (ch == ')' && depth == 0) stop = true
          else if (ch == ')') { depth -= 1; sb += ch; i += 1 }
          else if (ch == ',' && depth == 0 && !sb.exists(_ == ':')) stop = true
          else { sb += ch; i += 1 }
        }
        val w = sb.toString
        if (w.isEmpty) throw ParseError(s"unexpected char '${in(i)}'", i)
        // NOT a number when it ends in d/D/f/F: Scala's toDoubleOption accepts
        // Java float-literal suffixes, so "1d" would silently lex as the
        // NUMBER 1.0 instead of the one-DAY duration (summarize 1d → 1ms
        // buckets — identity pass-through, wrong answers with no error)
        w.toDoubleOption match {
          case Some(d) if !w.exists(_ == ':') && !"dDfF".contains(w.last) =>
            out += TNum(d, start)
          case _ => out += TIdent(w, start)
        }
      }
    }
    out.toVector
  }

  // ---- parser --------------------------------------------------------------
  private final class P(toks: Vector[Tok]) {
    private var i = 0
    def peek: Option[Tok] = toks.lift(i)
    def next(): Tok = { val t = toks(i); i += 1; t }
    def done: Boolean = i >= toks.length
    def at(op: String): Boolean = peek.exists { case TOp(s, _) => s == op; case _ => false }
    def eat(op: String): Unit =
      if (at(op)) i += 1 else throw ParseError(s"expected '$op'", peek.map(_.pos).getOrElse(-1))

    def query(): Query = {
      val macros = ListBuffer.empty[(String, Pipeline)]
      var main: Option[Pipeline] = None
      while (!done) {
        // lookahead: ident '=' → macro binding
        (peek, toks.lift(i + 1)) match {
          case (Some(TIdent(name, _)), Some(TOp("=", _))) if !name.contains(':') =>
            next(); next()
            macros += name -> pipeline()
            if (at(";")) eat(";")
          case _ =>
            main = Some(pipeline())
            if (at(";")) eat(";")
        }
      }
      Query(macros.toList, main.getOrElse(
        throw ParseError("query has no main pipeline", 0)))
    }

    def pipeline(): Pipeline = {
      val src = source()
      val stages = ListBuffer.empty[StageCall]
      while (at("|")) {
        eat("|")
        if (at("(")) {
          // `a | (b)` — union-by-juxtaposition (UnionFunctionTransformation)
          eat("(")
          val p = pipeline()
          eat(")")
          stages += StageCall("__group", List(PipeArg(p)))
        } else if (peek.exists {
          case TIdent("fetch", _) | TIdent("mockFetch", _) => true
          case _ => false
        }) {
          // bare source in pipe position also unions: `a | mockFetch 1,2`
          stages += StageCall("__group", List(PipeArg(Pipeline(source(), Nil))))
        } else stages += stage()
      }
      Pipeline(src, stages.toList)
    }

    def source(): Source = {
      if (at("(")) {
        eat("(")
        val p = pipeline()
        eat(")")
        return GroupSource(p)
      }
      next() match {
        case TIdent("fetch", _) =>
          val fs = ListBuffer.empty[Fetch.LabelFilter]
          while (peek.exists { case TIdent(s, _) => s.contains(':'); case _ => false }) {
            val TIdent(s, _) = next(): @unchecked
            val idx = s.indexOf(':')
            fs += Fetch.LabelFilter(s.substring(0, idx), s.substring(idx + 1))
          }
          FetchSource(fs.toList)
        case TIdent("mockFetch", _) =>
          // values: numbers separated by commas; then optional k:v tags
          val values = ListBuffer.empty[Double]
          var expectValue = true
          var stop = false
          while (!stop) peek match {
            case Some(TNum(v, _)) if expectValue =>
              next(); values += v; expectValue = false
            case Some(TIdent(s, _)) if expectValue && s.equalsIgnoreCase("nan") =>
              next(); values += Double.NaN; expectValue = false
            case Some(TOp(",", _)) if !expectValue =>
              next(); expectValue = true
            case _ => stop = true
          }
          val tags = ListBuffer.empty[(String, String)]
          while (peek.exists { case TIdent(s, _) => s.contains(':'); case _ => false }) {
            val TIdent(s, _) = next(): @unchecked
            val idx = s.indexOf(':')
            tags += (s.substring(0, idx) -> s.substring(idx + 1))
          }
          MockFetchSource(values.toList, tags.toList)
        case TIdent(name, _) => MacroSource(name)
        case t               => throw ParseError(s"expected source, got $t", t.pos)
      }
    }

    def stage(): StageCall = next() match {
      case TOp(op, pos) if cmpOps(op) =>
        next() match {
          case TNum(v, _) => StageCall("valueFilter", List(StrArg(op), NumArg(v)))
          case t          => throw ParseError(s"expected number after '$op'", t.pos)
        }
      case TIdent(name, _) =>
        val args = ListBuffer.empty[Arg]
        if (at("(")) { // binary call form: name(macroRef) or name(inline | pipeline)
          eat("(")
          val p = pipeline()
          args += (p match {
            case Pipeline(MacroSource(ref), Nil) => RefArg(ref)
            case other                           => PipeArg(other)
          })
          eat(")")
        }
        var stop = false
        while (!stop) peek match {
          case Some(TNum(v, _))   => next(); args += NumArg(v)
          case Some(TStr(s, _))   => next(); args += StrArg(s)
          case Some(TIdent(s, _)) =>
            next()
            args += Duration.parse(s).map(DurArg).getOrElse(StrArg(s))
          case _ => stop = true
        }
        StageCall(name, args.toList)
      case t => throw ParseError(s"expected stage, got $t", t.pos)
    }
  }

  def parse(q: String): Query = new P(lex(q)).query()
}
