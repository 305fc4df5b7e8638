package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Bit-exact port of the reference's hand-rolled CSV dialect
  * (`splitbycomma`, reference `Program/Delay.java:144-162`, duplicated
  * at `Program/Late.java:131-149`) — used only on the fidelity path;
  * the engine mainline reads typed Parquet/CSV (SURVEY.md §1.3).
  *
  * Dialect quirks reproduced deliberately (they are observable in
  * reference output):
  *  1. a field starting with `"` is scanned to the next `"` and the
  *     returned token RETAINS both quotes;
  *  2. escaped quotes (`""`) are not supported;
  *  3. a trailing comma drops the final empty field;
  *  4. the empty string yields an empty array.
  */
object CaaCsv {

  def splitByComma(line: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    var i = 0
    val n = line.length
    while (i < n) {
      if (line.charAt(i) == '"') {
        var end = i + 1
        while (end < n && line.charAt(end) != '"') end += 1
        // token keeps both surrounding quotes, like the reference
        out += line.substring(i, math.min(end + 1, n))
        i = end + 2 // skip closing quote and the comma after it
      } else {
        var end = i
        while (end < n && line.charAt(end) != ',') end += 1
        out += line.substring(i, end)
        i = end + 1
      }
    }
    out.toArray
  }
}
