package graft.tools

/** Section-safe merging for the scale tools' shared artifact
  * (`BENCH_sf1.json`): several tools (ScaleFull, ScaleDml, ScalePrune)
  * each own named top-level sections of one JSON object and re-run
  * independently. The old merge truncated at the tool's own marker and
  * rebuilt to END-OF-OBJECT, so whichever tool ran last silently
  * deleted every section another tool had appended after its marker
  * (a ScaleDml re-run ate ScalePrune's `partition_prune` evidence).
  *
  * `replaceSections` removes ONLY the named sections (balanced-brace
  * scan that skips string literals, so braces inside `criteria` prose
  * can't derail it) and appends the fresh ones, preserving everything
  * else byte-for-byte.
  *
  * Scope: the lookup matches the FIRST occurrence of `"name":`, which
  * is the top-level member in this artifact because base sections are
  * always written before the tool sections that might nest a
  * same-named key (e.g. `dml_queries.queries`). Not a general JSON
  * editor — it exists for this one co-owned file.
  */
object BenchMerge {

  /** End index (exclusive) of the JSON value starting at `start`.
    * Handles objects/arrays (balanced, string-aware), strings, and
    * scalar literals (up to the next top-level `,` or `}`).
    */
  private def valueEnd(s: String, start: Int): Int = {
    var i     = start
    var depth = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"'             => inStr = true
        case '{' | '['       => depth += 1
        case '}' | ']'       =>
          if (depth == 0) return i // closing brace of the PARENT object
          depth -= 1
          if (depth == 0 && s.charAt(start) != '"') return i + 1
        case ',' if depth == 0 => return i
        case _               =>
      }
      i += 1
    }
    i
  }

  /** Remove a top-level `"name":<value>` member (with its separating
    * comma) from a JSON object string; returns the input unchanged if
    * the member is absent.
    */
  def dropSection(json: String, name: String): String = {
    val marker = s""""$name":"""
    val at     = json.indexOf(marker)
    if (at < 0) return json
    val end       = valueEnd(json, at + marker.length)
    val hasTrail  = end < json.length && json.charAt(end) == ','
    val start     = if (hasTrail) at else { // absorb the LEADING comma instead
      var b = at - 1
      while (b >= 0 && json.charAt(b).isWhitespace) b -= 1
      if (b >= 0 && json.charAt(b) == ',') b else at
    }
    json.substring(0, start) + json.substring(if (hasTrail) end + 1 else end)
  }

  /** Replace the named sections of a JSON object string, leaving every
    * other member intact. Each value must already be rendered JSON.
    */
  def replaceSections(json: String, sections: Seq[(String, String)]): String = {
    val t = json.trim
    require(t.startsWith("{") && t.endsWith("}"), "not a JSON object")
    val stripped = sections.map(_._1).foldLeft(t)(dropSection)
    val prefix   = stripped.substring(0, stripped.length - 1).replaceAll("[,\\s]+$", "")
    val sep      = if (prefix == "{") "" else ","
    prefix + sep + sections.map { case (n, v) => s""""$n":$v""" }.mkString(",") + "}\n"
  }
}
