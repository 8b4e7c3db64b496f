package graft

/** Dumps the query Registry as one JSON object per line — the
  * authoritative feed for `tools/gen_queries_md.py` (the generated
  * QUERIES.md index) and `tools/bench_duckdb.py` (the DuckDB comparison
  * artifact). No SparkSession: Registry construction is pure. */
object Meta {
  def main(args: Array[String]): Unit = {
    // Escape EVERYTHING outside printable ASCII: println writes through
    // the JVM default charset, and a bare `java graft.Meta` under a
    // POSIX locale silently turned the q48 oracle's CJK literals into
    // '?' (caught by the r12 oracle_set_hash parity check — the Python
    // and Scala hashes of "the same" oracle set disagreed). Pure-ASCII
    // output is charset-proof; json.loads restores the exact string.
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    graft.queries.Registry.all.foreach { q =>
      val oracle = q.oracle.map(esc).getOrElse("null")
      println(s"""META {"name":${esc(q.name)},"bench":${q.bench},""" +
        s""""oracle":$oracle}""")
    }
  }
}
