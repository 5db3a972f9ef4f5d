package graft.util

/** Minimal JSON string escaping shared by the driver-facing mains
  * (Verify/Bench) so query names and SQL can never corrupt the JSON the
  * driver parses.
  */
object Json {
  /** Quote + escape: backslash, quote, and ALL control chars (<0x20). */
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'          => sb.append("\\\"")
      case '\\'         => sb.append("\\\\")
      case '\n'         => sb.append("\\n")
      case '\r'         => sb.append("\\r")
      case '\t'         => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c            => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
