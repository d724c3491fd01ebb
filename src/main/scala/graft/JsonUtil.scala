package graft

/** Minimal lossless JSON string escaping, shared by the driver-contract
  * mains (`Verify`'s oracle dump and `Bench`'s output line): backslash,
  * quote, and ALL control chars (<0x20) — one unescaped byte would make
  * the driver's `json.load` fail and zero the round's results.
  */
private[graft] object JsonUtil {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
