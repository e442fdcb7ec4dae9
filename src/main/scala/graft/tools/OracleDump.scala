package graft.tools

/** Dump [[graft.Oracles.all]] as deterministic JSON (sorted keys) —
  * the refactor guard for oracle-file reorganizations: dump before,
  * dump after, `diff` must be empty. No Spark session needed.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracles_dump.json")
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c    => c.toString
      }
    val body = graft.Oracles.all.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[oracle-dump] ${graft.Oracles.all.size} entries -> $out")
  }
}
