package graft.functions

/** Version-ordinal comparison (F7) — the reference gates features on
  * DB versions ("11.2.0.4" ≥ "11.2"?) via string-ordinal compare
  * (`common/strings.go:295-323`). Pure driver-side utility.
  */
object VersionUtil {

  /** Compare dotted numeric versions segment-wise; missing segments
    * count as 0 ("5.7" == "5.7.0"). Non-numeric suffixes compare
    * lexicographically after the numeric prefix ("8.0.1a" > "8.0.1").
    */
  def compare(a: String, b: String): Int = {
    val as = a.trim.split("\\.").toSeq
    val bs = b.trim.split("\\.").toSeq
    val n = math.max(as.size, bs.size)
    for (i <- 0 until n) {
      val x = as.lift(i).getOrElse("0")
      val y = bs.lift(i).getOrElse("0")
      val (xn, xs) = x.span(_.isDigit)
      val (yn, ys) = y.span(_.isDigit)
      val numCmp = java.lang.Long.compare(
        if (xn.isEmpty) 0L else xn.toLong,
        if (yn.isEmpty) 0L else yn.toLong)
      if (numCmp != 0) return numCmp
      val sufCmp = xs.compareTo(ys)
      if (sufCmp != 0) return sufCmp
    }
    0
  }

  def atLeast(version: String, minimum: String): Boolean =
    compare(version, minimum) >= 0
}
