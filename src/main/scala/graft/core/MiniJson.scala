package graft.core

/** Minimal recursive-descent JSON parser (no dependencies; the
  * environment ships no JSON library outside Spark's internals). Powers
  * the JPath rule surface — the reference's JSONPath catalog rules
  * (`JObject.SelectTokens`, /root/reference/Source/WebCrawler/Analyzers/
  * HtmlAnalyzer.cs:160-228 JPath branch).
  *
  * Values map to: Map[String, Any], Vector[Any], String, Double,
  * Boolean, null. Lenient where list feeds need it: accepts trailing
  * whitespace and bare top-level arrays/objects.
  */
object MiniJson {

  final class ParseError(msg: String, val pos: Int) extends Exception(s"$msg at $pos")

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.eof) throw new ParseError("trailing content", p.pos)
    v
  }

  def parseOpt(s: String): Option[Any] =
    try Some(parse(s)) catch { case _: Exception => None }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String) = throw new ParseError(msg, pos)

    def value(): Any = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _   => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length; v
    }

    private def obj(): Map[String, Any] = {
      pos += 1 // {
      val b = Map.newBuilder[String, Any]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      while (true) {
        skipWs()
        val k = str()
        skipWs()
        if (eof || s.charAt(pos) != ':') fail("expected :")
        pos += 1
        b += k -> value()
        skipWs()
        if (eof) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; return b.result()
          case _   => fail("expected , or }")
        }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      pos += 1 // [
      val b = Vector.newBuilder[Any]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      while (true) {
        b += value()
        skipWs()
        if (eof) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; return b.result()
          case _   => fail("expected , or ]")
        }
      }
      b.result()
    }

    private def str(): String = {
      if (eof || s.charAt(pos) != '"') fail("expected string")
      pos += 1
      val sb = new java.lang.StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos)
        if (c == '"') { pos += 1; return sb.toString }
        else if (c == '\\') {
          pos += 1
          if (eof) fail("bad escape")
          s.charAt(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              if (pos + 4 >= s.length) fail("bad unicode escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      throw new IllegalStateException
    }

    private def num(): Double = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (Character.isDigit(s.charAt(pos)) || "+-.eE".indexOf(s.charAt(pos)) >= 0))
        pos += 1
      if (pos == start) fail("expected number")
      try s.substring(start, pos).toDouble
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }

  /** Tiny JSONPath subset (the shapes the reference's rules use):
    * `$.a.b` field access, `$.a[*]` / `$[*]` array iteration, `$.a[3]`
    * index. Returns all matching nodes. */
  def select(root: Any, path: String): Vector[Any] = {
    val segs = path.stripPrefix("$").split("[.\\[]").filter(_.nonEmpty)
    var cur: Vector[Any] = Vector(root)
    segs.foreach { seg0 =>
      val seg = seg0.stripSuffix("]")
      cur = cur.flatMap { node =>
        if (seg == "*") node match {
          case v: Vector[_]     => v
          case m: Map[_, _]     => m.values.toVector
          case _                => Vector.empty
        } else if (seg.forall(Character.isDigit)) node match {
          case v: Vector[_] if seg.toInt < v.size => Vector(v(seg.toInt))
          case _                                  => Vector.empty
        } else node match {
          case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]].get(seg).toVector
          case _ => Vector.empty
        }
      }
    }
    cur
  }
}
