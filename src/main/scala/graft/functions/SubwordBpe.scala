package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Table-driven subword tokenizer (the "real" successor of
  * [[TextFunctions.subwordCountEstimate]]'s length heuristic).
  *
  * Segmentation is greedy longest-prefix over a checked-in piece
  * vocabulary (`graft/subword_vocab.txt` on the classpath — public
  * high-frequency English subword units), with a one-code-point fallback
  * for unmatched characters, applied per whitespace token of the
  * lowercased text. This is WordPiece-style greedy encoding; the piece
  * COUNT is what the pipeline needs (token budgeting, cost estimation)
  * and — unlike merge-order BPE — it has an exact ANSI-SQL twin: a
  * recursive CTE that strips the longest `starts_with` vocab match per
  * step (see TextOps q61), so the whole operator is oracle-checkable.
  *
  * Determinism: a prefix of a given length is unique, so "longest match"
  * never ties; counts are reproducible across engines and partitionings.
  */
object SubwordBpe {

  /** The piece vocabulary, in file order (ASCII lowercase, no dups). */
  val vocab: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/subword_vocab.txt")
    require(in != null, "subword_vocab.txt missing from classpath")
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      require(lines.distinct == lines, "duplicate pieces in subword_vocab.txt")
      require(lines.forall(p => p.forall(c => c >= 'a' && c <= 'z')),
        "vocab pieces must be ASCII lowercase")
      lines
    } finally in.close()
  }

  // longest-first scan order; grouped nothing fancier — the vocab is
  // ~130 entries and the corpus words are short, so a linear probe per
  // position is cheaper than building a trie per executor
  private val byLenDesc: Array[String] = vocab.sortBy(p => (-p.length, p)).toArray

  // exactly Java-regex \s — the splitter TextFunctions.tokens and every
  // DuckDB twin (string_split_regex '\s+') already standardize on; the
  // broader Character.isWhitespace would diverge on U+2028 etc.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Total subword pieces across all whitespace tokens of `text`
    * (lowercased). Static-forwarded, so generated code can call
    * `graft.functions.SubwordBpe.countPieces(...)` directly.
    */
  def countPieces(text: UTF8String): Long = {
    if (text == null) return 0L
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWs(s.charAt(i))) { i += 1 }
      else {
        // token = [i, end)
        var end = i
        while (end < n && !isWs(s.charAt(end))) end += 1
        var j = i
        while (j < end) {
          var matched = 0
          var k = 0
          while (matched == 0 && k < byLenDesc.length) {
            val p = byLenDesc(k)
            if (p.length <= end - j && s.regionMatches(j, p, 0, p.length)) matched = p.length
            k += 1
          }
          if (matched > 0) j += matched
          else j += Character.charCount(s.codePointAt(j)) // unknown: 1 piece per code point
          total += 1L
        }
        i = end
      }
    }
    total
  }

  /** The vocab as a SQL VALUES list, interpolated into the DuckDB oracle
    * so the two sides can never drift (pieces are ASCII — no quoting
    * hazards).
    */
  def vocabValuesSql: String = vocab.map(p => s"('$p')").mkString(",")
}
