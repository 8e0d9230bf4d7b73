package graft.common

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal JSON sidecar writer (reference S14: audit / DQ report /
  * metadata JSON files, `src/common/dq.py:95-98`, `labels.py:82-112`).
  * Driver-side only — never on the executor hot path. Flat string/number
  * maps cover every sidecar the pipeline writes; no JSON library exists
  * in the jar set, so emission is hand-rolled (escaping mirrors
  * graft.Verify).
  */
object JsonIO {

  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Inverse of [[escape]] — round-trips any string value emitted by this
    * module (manifest file-stats, sidecar values).
    */
  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Render a flat map; numeric/boolean-looking values stay unquoted. */
  def render(obj: Map[String, Any]): String =
    obj.toSeq.sortBy(_._1).map { case (k, v) =>
      val value = v match {
        case n: Int => n.toString
        case n: Long => n.toString
        // NaN/Infinity are not valid JSON numbers — quote them
        case n: Double if n.isNaN || n.isInfinite =>
          "\"" + n.toString + "\""
        case n: Double => n.toString
        case b: Boolean => b.toString
        case other => "\"" + escape(other.toString) + "\""
      }
      "\"" + escape(k) + "\": " + value
    }.mkString("{", ", ", "}")

  def write(path: String, obj: Map[String, Any]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, render(obj))
  }

  /** Append one JSON line (structured pipeline event log, reference
    * `src/common/pipeline_logging.py:13-25`).
    */
  def appendLine(path: String, obj: Map[String, Any]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, render(obj) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
