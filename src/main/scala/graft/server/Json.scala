package graft.server

/** Minimal JSON codec for the HTTP facade — the dependency budget is
  * zero (Spark's bundled Jackson is shaded-version-fragile across
  * releases, and the facade's payloads are flat: vectors, ids, k).
  *
  * Parse model: object → Map[String, Any], array → Vector[Any],
  * number → Long when the token is integral and fits (else Double),
  * string → String, true/false → Boolean, null → null.
  *
  * Integral tokens MUST come back as Long, not Double: commit-log zone
  * bounds and batch ids are int64, and a Double round-trip silently
  * shifts values above 2^53 — a zone `[lo,hi]` off by a few hundred
  * lets planning-time pruning skip a file that actually holds a
  * candidate id (silent row loss for hash-derived/snowflake ids).
  * Callers that accept either shape use [[asLong]]/[[asDouble]].
  */
object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  /** Exact int64 view of a parsed JSON number (integral tokens arrive
    * as Long and pass through exactly; a Double here can only come
    * from a genuinely fractional/exponent token).
    */
  def asLong(v: Any): Long = v match {
    case l: Long   => l
    case d: Double => d.toLong
    case i: Int    => i.toLong
    case other => throw new IllegalArgumentException(
      s"not a JSON number: $other")
  }

  /** Double view of a parsed JSON number, whichever token shape it had. */
  def asDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case other => throw new IllegalArgumentException(
      s"not a JSON number: $other")
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def ch: Char = {
      require(!eof, "unexpected end of JSON"); s.charAt(pos)
    }
    private def expect(c: Char): Unit = {
      require(ch == c, s"expected '$c' at $pos, got '$ch'"); pos += 1
    }

    def value(): Any = {
      ws()
      ch match {
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
      require(s.regionMatches(pos, word, 0, word.length),
        s"bad literal at $pos")
      pos += word.length; v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (ch == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (ch == ',') pos += 1 else { expect('}'); more = false }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      expect('['); ws()
      if (ch == ']') { pos += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var more = true
      while (more) {
        b += value(); ws()
        if (ch == ',') pos += 1 else { expect(']'); more = false }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        val c = ch
        pos += 1
        if (c == '\\') {
          val e = ch; pos += 1
          e match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos, pos + 4), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(
              s"bad escape '\\$other' at $pos")
          }
        } else sb += c
      }
      pos += 1
      sb.toString
    }

    private def num(): Any = {
      val start = pos
      if (ch == '-') pos += 1
      var integral = true // a '.', 'e', 'E' (or exponent sign) demotes
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) {
        if (!s.charAt(pos).isDigit) integral = false
        pos += 1
      }
      val tok = s.substring(start, pos)
      if (integral)
        try java.lang.Long.parseLong(tok)   // exact int64 round-trip
        catch { case _: NumberFormatException => tok.toDouble } // > 2^63
      else tok.toDouble
    }
  }

  // ------------------------------------------------------------ write

  def write(v: Any): String = {
    val sb = new StringBuilder
    w(v, sb)
    sb.toString
  }

  private def w(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb ++= "null"
    case b: Boolean => sb ++= b.toString
    case i: Int => sb ++= i.toString
    case l: Long => sb ++= l.toString
    case d: Double =>
      if (d == math.floor(d) && math.abs(d) < 1e15 && !d.isInfinite)
        sb ++= d.toLong.toString
      else sb ++= d.toString
    case s: String =>
      sb += '"'
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb += '"'
    case m: collection.Map[_, _] =>
      sb += '{'
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb += ','
        first = false
        w(k.toString, sb); sb += ':'; w(x, sb)
      }
      sb += '}'
    case it: Iterable[_] =>
      sb += '['
      var first = true
      it.foreach { x =>
        if (!first) sb += ','
        first = false
        w(x, sb)
      }
      sb += ']'
    case a: Array[_] => w(a.toSeq, sb)
    case other => throw new IllegalArgumentException(
      s"cannot serialize ${other.getClass}")
  }
}
