package graft.yaml

/** Minimal YAML-subset parser — just enough for the reference's golden-test
  * corpus format (block maps/lists by indentation, inline arrays `[1, null]`,
  * inline maps `{k: "v"}`, quoted/plain scalars, comments). Test-scope only.
  */
object MiniYaml {
  sealed trait Y {
    def apply(k: String): Y = this.asInstanceOf[YMap].m(k)
    def get(k: String): Option[Y] = this match {
      case YMap(m) => m.get(k); case _ => None
    }
    def list: List[Y] = this.asInstanceOf[YList].l
    def str: String = this match {
      case YStr(s) => s; case YNum(d) => if (d == d.floor) d.toLong.toString else d.toString
      case other => throw new IllegalStateException(s"not a string: $other")
    }
    def num: Double = this.asInstanceOf[YNum].d
    def isNull: Boolean = this == YNull
  }
  final case class YMap(m: Map[String, Y]) extends Y
  final case class YList(l: List[Y]) extends Y
  final case class YStr(s: String) extends Y
  final case class YNum(d: Double) extends Y
  case object YNull extends Y
  final case class YBool(b: Boolean) extends Y

  private final case class Line(indent: Int, text: String)

  def parseFile(path: String): Y = parse(
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))

  def parse(src: String): Y = {
    val stripped = src.linesIterator.toVector
      .map { raw =>
        // strip comments not inside quotes
        val sb = new StringBuilder
        var inQ = false; var q = ' '
        var done = false
        for (c <- raw if !done) {
          if (inQ) { sb += c; if (c == q) inQ = false }
          else if (c == '"' || c == '\'') { inQ = true; q = c; sb += c }
          else if (c == '#') done = true
          else sb += c
        }
        sb.toString
      }
      .filter(l => l.trim.nonEmpty && l.trim != "---")
    // fold multi-line quoted scalars (odd quote count continues on next line;
    // YAML folds the newline to a single space)
    val joined = Vector.newBuilder[String]
    var acc: String = null
    for (l <- stripped) {
      if (acc != null) {
        acc = acc + " " + l.trim
        if (l.count(_ == '"') % 2 == 1) { joined += acc; acc = null }
      } else if (l.count(_ == '"') % 2 == 1) acc = l
      else joined += l
    }
    if (acc != null) joined += acc
    val lines = joined.result()
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim))
    val (y, rest) = parseBlock(lines, 0)
    require(rest.isEmpty, s"trailing yaml at: ${rest.headOption}")
    y
  }

  private def parseBlock(lines: Vector[Line], minIndent: Int): (Y, Vector[Line]) = {
    if (lines.isEmpty) return (YNull, lines)
    val indent = lines.head.indent
    if (indent < minIndent) return (YNull, lines)
    if (lines.head.text.startsWith("- ") || lines.head.text == "-") parseList(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseList(lines0: Vector[Line], indent: Int): (Y, Vector[Line]) = {
    var lines = lines0
    val out = List.newBuilder[Y]
    while (lines.nonEmpty && lines.head.indent == indent && lines.head.text.startsWith("-")) {
      val rest = lines.head.text.drop(1).trim
      lines = lines.tail
      if (rest.isEmpty) {
        val (v, rem) = parseBlock(lines, indent + 1)
        out += v; lines = rem
      } else if (rest.contains(":") && !rest.startsWith("[") && !rest.startsWith("{") &&
                 !rest.startsWith("\"")) {
        // inline "key: value" — the item is a map; absorb deeper-indented keys
        val (k, v) = splitKV(rest)
        var m = Map[String, Y](k -> v._1)
        if (v._2) { // value was a block opener ("key:")
          val (bv, rem) = parseBlock(lines, indent + 1)
          m = Map(k -> bv); lines = rem
        }
        while (lines.nonEmpty && lines.head.indent > indent &&
               !lines.head.text.startsWith("- ")) {
          val (mv, rem) = parseMap(lines, lines.head.indent)
          require(rem.length < lines.length,
            s"yaml parser stuck at: ${lines.head}")
          m = m ++ mv.asInstanceOf[YMap].m
          lines = rem
        }
        out += YMap(m)
      } else {
        out += scalar(rest)
      }
    }
    (YList(out.result()), lines)
  }

  private def parseMap(lines0: Vector[Line], indent: Int): (Y, Vector[Line]) = {
    var lines = lines0
    var m = Map.empty[String, Y]
    while (lines.nonEmpty && lines.head.indent == indent &&
           !lines.head.text.startsWith("- ") && lines.head.text.contains(":")) {
      val (k, (v, isBlock)) = splitKV(lines.head.text)
      val keyIndent = lines.head.indent
      lines = lines.tail
      if (v == YStr("|") || v == YStr(">")) {
        // block scalar: deeper-indented lines joined (newline for |, space for >)
        val sepChar = if (v == YStr("|")) "\n" else " "
        val body = scala.collection.mutable.ListBuffer.empty[String]
        while (lines.nonEmpty && lines.head.indent > keyIndent) {
          body += lines.head.text
          lines = lines.tail
        }
        m += k -> YStr(body.mkString(sepChar))
      } else if (isBlock) {
        if (lines.nonEmpty && lines.head.indent > indent) {
          val (bv, rem) = parseBlock(lines, indent + 1)
          m += k -> bv; lines = rem
        } else if (lines.nonEmpty && lines.head.indent == indent &&
                   lines.head.text.startsWith("-")) {
          // YAML block sequences may sit at the key's own indentation
          val (bv, rem) = parseList(lines, indent)
          m += k -> bv; lines = rem
        } else m += k -> YNull
      } else m += k -> v
    }
    (YMap(m), lines)
  }

  /** "key: value" → (key, (value, isBlockOpener)) */
  private def splitKV(s: String): (String, (Y, Boolean)) = {
    val i = s.indexOf(':')
    val k = s.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"")
    val rest = s.substring(i + 1).trim
    if (rest.isEmpty) (k, (YNull, true)) else (k, (scalar(rest), false))
  }

  private def scalar(s0: String): Y = {
    val s = s0.trim
    if (s == "null" || s == "~") YNull
    else if (s == "true") YBool(true)
    else if (s == "false") YBool(false)
    else if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
      YStr(s.substring(1, s.length - 1)
        .replace("\\\"", "\"").replace("\\\\", "\\"))
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      YStr(s.substring(1, s.length - 1))
    else if (s.startsWith("[")) {
      require(s.endsWith("]"), s"bad inline array: $s")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YList(Nil)
      else YList(splitTop(inner).map(scalar))
    } else if (s.startsWith("{")) {
      require(s.endsWith("}"), s"bad inline map: $s")
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YMap(Map.empty)
      else YMap(splitTop(inner).map { kv =>
        val (k, (v, _)) = splitKV(kv)
        k -> v
      }.toMap)
    } else s.toDoubleOption.map(YNum).getOrElse(YStr(s))
  }

  /** split on top-level commas (not inside quotes/brackets) */
  private def splitTop(s: String): List[String] = {
    val out = List.newBuilder[String]
    var depth = 0; var inQ = false; var q = ' '
    val sb = new StringBuilder
    for (c <- s) {
      if (inQ) { sb += c; if (c == q) inQ = false }
      else c match {
        case '"' | '\'' => inQ = true; q = c; sb += c
        case '[' | '{' => depth += 1; sb += c
        case ']' | '}' => depth -= 1; sb += c
        case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
        case other => sb += other
      }
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result()
  }
}
