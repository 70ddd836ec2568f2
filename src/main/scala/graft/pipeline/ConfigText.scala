package graft.pipeline

import scala.collection.mutable

/** Dependency-free parsers for the reference's two config formats —
  * YAML (the subset its demo configs actually use) and JSON — both
  * producing one ordered tree (`config/loader.py:28-58` accepts either
  * suffix and returns the same dict shape).
  *
  * YAML subset (everything in the demos' yaml and `test/test1/config.yaml`):
  *  - block mappings with bare, single- or double-quoted keys
  *    (quoted glob patterns are keys);
  *  - block lists (`- item`), indented deeper than OR equal to the
  *    parent key (both styles appear in the demos);
  *  - flow lists (`["a", "b"]`);
  *  - scalars: quoted/bare strings, ints, floats, booleans
  *    (`true/false/yes/no`, the YAML-1.1 forms the demos use);
  *  - `#` comments (full-line and trailing, quote-aware);
  *  - any consistent indent width.
  * Anchors, multi-docs, flow maps, block scalars are NOT supported —
  * nothing in the reference's configs uses them.
  */
object ConfigText {

  sealed trait CVal {
    def asMap: Seq[(String, CVal)] = this match {
      case CMap(es) => es
      case other => throw new IllegalArgumentException(s"expected mapping, got $other")
    }
    def asList: Seq[CVal] = this match {
      case CList(xs) => xs
      case s: CScalar => Seq(s) // a single scalar where a list is allowed
      case other => throw new IllegalArgumentException(s"expected list, got $other")
    }
    def asString: String = this match {
      case CScalar(s) => s
      case other => throw new IllegalArgumentException(s"expected scalar, got $other")
    }
    def asBool: Boolean = asString.toLowerCase match {
      case "true" | "yes" | "on"  => true
      case "false" | "no" | "off" => false
      case other => throw new IllegalArgumentException(s"not a boolean: $other")
    }
    def asInt: Int = asString.toInt
  }
  final case class CScalar(value: String) extends CVal
  final case class CList(items: Seq[CVal]) extends CVal
  final case class CMap(entries: Seq[(String, CVal)]) extends CVal {
    def get(key: String): Option[CVal] = entries.find(_._1 == key).map(_._2)
  }

  // ---------------------------------------------------------------- YAML

  private final case class Line(indent: Int, text: String)

  /** Strip a trailing comment, respecting single/double quotes. */
  private def stripComment(s: String): String = {
    var inS = false; var inD = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD &&
          (i == 0 || s.charAt(i - 1).isWhitespace) => return s.take(i)
        case _ => ()
      }
      i += 1
    }
    s
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split `key: value` at the first colon outside quotes that is
    * followed by whitespace/EOL (glob keys never contain a colon, but
    * quoted keys make this unambiguous anyway).
    */
  private def splitKey(text: String): Option[(String, String)] = {
    var inS = false; var inD = false; var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case ':' if !inS && !inD &&
          (i + 1 == text.length || text.charAt(i + 1).isWhitespace) =>
          return Some((unquote(text.take(i)), text.drop(i + 1).trim))
        case _ => ()
      }
      i += 1
    }
    None
  }

  private def parseScalarOrFlow(s: String): CVal = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) CList(Nil)
      else CList(splitFlow(inner).map(x => CScalar(unquote(x))))
    } else CScalar(unquote(t))
  }

  /** Split flow-list items on commas outside quotes. */
  private def splitFlow(s: String): Seq[String] = {
    val out = mutable.ListBuffer.empty[String]
    var inS = false; var inD = false; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case ',' if !inS && !inD => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toList.map(_.trim).filter(_.nonEmpty)
  }

  def parseYaml(text: String): CMap = {
    val lines = text.split("\n", -1).toSeq
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { raw =>
        val indent = raw.takeWhile(_ == ' ').length
        require(!raw.trim.startsWith("\t"), "tabs are not valid YAML indentation")
        Line(indent, raw.trim)
      }
    val (v, next) = parseBlock(lines.toIndexedSeq, 0, if (lines.isEmpty) 0 else lines.head.indent)
    require(next == lines.length, s"trailing unparsed config at line ${next + 1}")
    v match {
      case m: CMap => m
      case other => throw new IllegalArgumentException(s"top level must be a mapping, got $other")
    }
  }

  /** Parse one block (mapping or list) whose items sit at `indent`. */
  private def parseBlock(lines: IndexedSeq[Line], start: Int, indent: Int): (CVal, Int) = {
    if (start >= lines.length) return (CMap(Nil), start)
    if (lines(start).text.startsWith("- ") || lines(start).text == "-") {
      // list block
      val items = mutable.ListBuffer.empty[CVal]
      var i = start
      while (i < lines.length && lines(i).indent == indent &&
             (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
        val rest = lines(i).text.drop(1).trim
        if (rest.isEmpty) { // nested block item
          val (v, n) = parseBlock(lines, i + 1, lines(i + 1).indent)
          items += v; i = n
        } else { items += parseScalarOrFlow(rest); i += 1 }
      }
      (CList(items.toList), i)
    } else {
      // mapping block
      val entries = mutable.ListBuffer.empty[(String, CVal)]
      var i = start
      while (i < lines.length && lines(i).indent == indent &&
             !lines(i).text.startsWith("- ")) {
        val line = lines(i)
        splitKey(line.text) match {
          case Some((key, rhs)) if rhs.nonEmpty =>
            entries += key -> parseScalarOrFlow(rhs); i += 1
          case Some((key, _)) =>
            // value is the following block: deeper indent, or a list at
            // the SAME indent (both styles appear in the reference demos)
            if (i + 1 < lines.length &&
                (lines(i + 1).indent > indent ||
                 (lines(i + 1).indent == indent && lines(i + 1).text.startsWith("- ")))) {
              val (v, n) = parseBlock(lines, i + 1, lines(i + 1).indent)
              entries += key -> v; i = n
            } else { entries += key -> CScalar(""); i += 1 }
          case None =>
            throw new IllegalArgumentException(s"unparseable config line: ${line.text}")
        }
      }
      (CMap(entries.toList), i)
    }
  }

  // ---------------------------------------------------------------- JSON

  def parseJson(text: String): CMap = {
    val p = new JsonParser(text)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, "trailing content after JSON document")
    v match {
      case m: CMap => m
      case other => throw new IllegalArgumentException(s"top level must be an object, got $other")
    }
  }

  /** Minimal recursive-descent JSON (objects preserve key order). */
  private final class JsonParser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(i) == c, s"expected '$c' at offset $i")
      i += 1
    }
    def parseValue(): CVal = {
      skipWs()
      require(!eof, "unexpected end of JSON")
      s.charAt(i) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => CScalar(parseString())
        case _   =>
          val start = i
          while (!eof && !",]}".contains(s.charAt(i)) && !s.charAt(i).isWhitespace) i += 1
          CScalar(s.substring(start, i)) // numbers, true/false/null kept textual
      }
    }
    private def parseObject(): CMap = {
      expect('{'); skipWs()
      val entries = mutable.ListBuffer.empty[(String, CVal)]
      if (!eof && s.charAt(i) == '}') { i += 1; return CMap(Nil) }
      var more = true
      while (more) {
        skipWs()
        val k = parseString()
        expect(':')
        entries += k -> parseValue()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      CMap(entries.toList)
    }
    private def parseArray(): CList = {
      expect('['); skipWs()
      val items = mutable.ListBuffer.empty[CVal]
      if (!eof && s.charAt(i) == ']') { i += 1; return CList(Nil) }
      var more = true
      while (more) {
        items += parseValue()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']')
      CList(items.toList)
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'
            case 'r' => sb += '\r'; case 'u' =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 4
            case c => sb += c
          }
          i += 2
        } else { sb += s.charAt(i); i += 1 }
      }
      expect('"')
      sb.toString
    }
  }
}
