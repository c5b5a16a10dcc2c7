package graft.functions

/** Rabin–Karp rolling hash + winnowing fingerprints — the classic
  * document-fingerprinting scheme (Schleimer/Wilkerson/Aiken winnowing):
  * hash every k-char window in O(n) via the rolling recurrence
  * h' = (h - c_out·B^(k-1))·B + c_in, then keep the minimum hash of each
  * w-window of hashes (dedup'd) as the fingerprint set. Robust to edits:
  * a local change perturbs only nearby fingerprints, so shared
  * fingerprints ≈ shared content even after insertions.
  *
  * Complements the shingle-set fingerprints in TextOps.q31 (word-level,
  * oracle-checked): this is the character-level typed lane for
  * plagiarism-style matching where word boundaries can't be trusted.
  */
object RollingHash {

  private val B = 1000003L // odd multiplier, full 64-bit wraparound arithmetic

  /** All k-gram rolling hashes of `text` in one O(n) pass. */
  def hashes(text: String, k: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](text.length - k + 1)
    var h = 0L
    i = 0
    while (i < text.length) {
      h = if (i < k) h * B + text.charAt(i)
          else (h - text.charAt(i - k) * pow) * B + text.charAt(i)
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing: the distinct set of per-window minima over `hashes`,
    * window size w — guarantees any match of length ≥ k + w - 1 shares a
    * fingerprint, while keeping ~2/(w+1) of all hashes.
    */
  def winnow(hs: Array[Long], w: Int): Array[Long] = {
    if (hs.isEmpty) return hs
    if (hs.length <= w) return Array(hs.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + w <= hs.length) {
      var m = hs(i); var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  /** Full fingerprint: k-gram rolling hashes winnowed with window w.
    * Pure JVM function — wrap in `udf(...)` at the call site for ad-hoc
    * column use.
    */
  def fingerprint(text: String, k: Int = 8, w: Int = 4): Array[Long] =
    winnow(hashes(text, k), w)
}
