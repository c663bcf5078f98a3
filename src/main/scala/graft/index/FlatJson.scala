package graft.index

/**
 * Minimal reader for the FLAT one-level JSON objects the engine's
 * artifacts write as `_meta.json` (dim/metric/counts/fold stamps — see
 * [[FsArtifact.writeMetaJson]] call sites). The previous field extractor
 * string-split on `"k":` and `[,}]`, which mis-parses any value whose
 * quoted string contains a comma or brace (a user-supplied collection or
 * model name can); this is a real tokenizer for the subset the artifacts
 * actually write: string values with standard JSON escapes, and bare
 * number/boolean/null literals returned as their literal text.
 *
 * Deliberately NOT a general JSON parser: nested objects/arrays fail
 * loudly (no artifact writes them, and silently flattening one would be
 * a schema bug worth hearing about). Duplicate keys keep the last value,
 * matching every mainstream parser.
 */
private[graft] object FlatJson {

  /** Last-parse memo: artifact readers fetch several fields from the
    * SAME meta string per operation (`requireFoldCurrent` + each
    * parameter — per micro-batch on admission sinks), and callers hold
    * one string instance per `readMetaJson()`, so an identity-first
    * single-slot cache removes the re-tokenization. The slot is
    * PER-THREAD, not global: two concurrent streams on one SparkSession
    * (each micro-batch loop is its own long-lived execution thread)
    * parse different meta strings, and a shared slot would thrash
    * permanently — re-tokenizing on every call in exactly the
    * per-micro-batch scenario the memo exists for. The memo is an
    * immutable pair, so there is no invalidation concern either way. */
  private val memo = new ThreadLocal[(String, Map[String, String])]

  /** Parse `json` (one flat object) into field → value text. String
    * values are unescaped; non-string values are their literal text. */
  def parse(json: String): Map[String, String] = {
    val m = memo.get()
    if (m != null && ((m._1 eq json) || m._1 == json)) return m._2
    val parsed = parseUncached(json)
    memo.set((json, parsed))
    parsed
  }

  private def parseUncached(json: String): Map[String, String] = {
    val s = json.trim
    require(s.length >= 2 && s.head == '{' && s.last == '}',
      s"not a flat JSON object: $json")
    var i = 1
    val out = Map.newBuilder[String, String]
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"bad flat JSON meta at offset $i ($what): $json")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def quoted(): String = {
      if (s.charAt(i) != '"') fail("expected '\"'")
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => fail(s"unknown escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) fail("unterminated string")
      i += 1 // closing quote
      sb.toString
    }
    var more = { ws(); i < s.length && s.charAt(i) != '}' }
    while (more) {
      {
        ws()
        val k = quoted()
        ws()
        if (i >= s.length || s.charAt(i) != ':') fail("expected ':'")
        i += 1
        ws()
        val v =
          if (i < s.length && s.charAt(i) == '"') quoted()
          else {
            val start = i
            while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != '}') {
              if (s.charAt(i) == '{' || s.charAt(i) == '[')
                fail("nested objects/arrays unsupported in flat meta")
              i += 1
            }
            if (i == start) fail("empty value")
            s.substring(start, i).trim
          }
        out += k -> v
        ws()
        if (i >= s.length) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => more = false
          case _ => fail("expected ',' or '}'")
        }
      }
    }
    out.result()
  }
}
