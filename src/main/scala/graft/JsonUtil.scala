package graft

/** JSON string escaping shared by the artifact writers ([[Verify]]'s
  * oracle_sql.json, [[Bench]]'s errors map). Escapes backslash, quote,
  * and ALL control chars (<0x20) — a tab or CR in builder-authored SQL
  * or an exception message would otherwise break the driver's
  * json.load and silently zero the round's artifact.
  */
object JsonUtil {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
