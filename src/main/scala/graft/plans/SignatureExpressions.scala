package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document-signature kernels: tokenize → hash → fold, all inside
  * a single codegen'd projection.
  *
  * The explode+aggregate signature builders in [[graft.operators.Dedup]]
  * exist because nested higher-order expressions re-evaluate their inputs
  * (lambda-bound references defeat common-subexpression elimination — the
  * round-1 lesson recorded in PERF_NOTES). But explode+agg pays a
  * different tax: one posting ROW per token occurrence, `perms`/`nBits`
  * aggregation buffer slots, and a hash-partial-agg pipeline per doc.
  * A signature is a pure per-document function — the right physical shape
  * is a map-side projection: no posting rows, no aggregation, NO SHUFFLE.
  * At 100 TB that difference is structural: signatures computed this way
  * scale embarrassingly-parallel with the scan, and the only exchange in
  * an LSH dedup job is the (band, bucket) candidate join itself.
  *
  * Hash-family parity (spec-pinned by `SignatureParitySpec`):
  *  - portable: token/shingle → first 8 md5 hex chars as unsigned 32-bit
  *    (`conv(substring(md5(s),1,8),16,10)`), permuted `(aᵢ·h+bᵢ) mod 2⁶¹−1`
  *    — byte-for-byte [[graft.operators.Dedup.PortableHashFamily]], so
  *    DuckDB oracles keep reproducing signatures exactly.
  *  - xxhash64: `xxhash64(s)` seed 42, permuted `xxhash64_seeded(h, i)` —
  *    byte-for-byte [[graft.operators.Dedup.XxHashFamily]].
  * Tokenization matches `TextFunctions.tokens` (split `\s+`, drop empty);
  * shingling matches `Dedup.shinglePostings` (w-token windows, short docs
  * emit their single all-token shingle, empty docs emit nothing). The
  * kernels are TOTAL (token-less text → identity signature) so the
  * expressions can be null-intolerant; the bulk builders in Dedup exclude
  * token-less docs with a cheap `\S` text predicate, matching the
  * explode-path behavior of dropping them.
  *
  * Reference anchor: the dedup stage this accelerates is the same
  * MinHash/SimHash family surveyed for the reference's content pipeline
  * (SURVEY.md §2 LLM-data operators); no counterpart exists in the
  * reference itself — it is the 100 TB scale path.
  */
object SigOps {

  val MersenneP: Long = (1L << 61) - 1

  private val ws = java.util.regex.Pattern.compile("\\s+")

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Whitespace tokens, empty dropped — `TextFunctions.tokens` parity
    * (Spark's `split(text, "\\s+")` keeps a leading "" for text starting
    * with whitespace; the length filter drops it in both paths).
    */
  def tokensOf(text: UTF8String): Array[String] =
    ws.split(text.toString, -1).filter(_.nonEmpty)

  /** First 8 md5 hex chars as an unsigned 32-bit value — exactly
    * `conv(substring(md5(s),1,8),16,10)` (the portable first-level hash).
    */
  def md5First4(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def xx64(s: UTF8String): Long = XxHash64Function.hash(s, StringType, 42L)

  private def seeded(tag: String, i: Int): Long =
    XxHash64Function.hash(UTF8String.fromString(s"${tag}_$i"), StringType, 42L)

  /** Portable-family permutation coefficients — the same derivation as
    * `Dedup.PortableHashFamily.aCoef/bCoef` (which delegate here so the
    * two can never drift).
    */
  def aCoef(i: Int): Long = java.lang.Math.floorMod(seeded("a", i), (1L << 30) - 1) + 1
  def bCoef(i: Int): Long = java.lang.Math.floorMod(seeded("b", i), MersenneP)

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coefs(perms: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(perms,
      p => (Array.tabulate(p)(aCoef), Array.tabulate(p)(bCoef)))

  /** Shingle strings fed to the hash — w-token windows over the token
    * array, short docs collapse to one all-token shingle (parity with
    * `shinglePostings`: `pos <= greatest(n − w, 0)`). Duplicates retained;
    * min() downstream is duplicate-insensitive.
    */
  private def eachShingle(toks: Array[String], w: Int)(f: String => Unit): Unit = {
    val n = toks.length
    if (n == 0) return
    val last = math.max(n - w, 0)
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos <= last) {
      sb.setLength(0)
      val end = math.min(pos + w, n)
      var k = pos
      while (k < end) {
        if (k > pos) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      f(sb.toString)
      pos += 1
    }
  }

  /** MinHash signature, portable family. Token-less text folds zero
    * shingles and returns the identity signature (all Long.MaxValue) —
    * the kernels are TOTAL functions so the expressions can be
    * null-intolerant (see [[MinHashSig]]); bulk builders exclude
    * token-less docs with a `\S` predicate instead.
    */
  def minhashPortable(text: UTF8String, w: Int, perms: Int): ArrayData = {
    val toks = tokensOf(text)
    val (as, bs) = coefs(perms)
    val mins = Array.fill(perms)(Long.MaxValue)
    eachShingle(toks, w) { sh =>
      // aᵢ < 2³⁰ and h < 2³² keep aᵢ·h < 2⁶² — exact signed-64 arithmetic,
      // same bound the SQL twin relies on
      val h = md5First4(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < perms) {
        val v = (as(i) * h + bs(i)) % MersenneP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** MinHash signature, xxhash64 family. Total — see [[minhashPortable]]. */
  def minhashXx(text: UTF8String, w: Int, perms: Int): ArrayData = {
    val toks = tokensOf(text)
    val mins = Array.fill(perms)(Long.MaxValue)
    eachShingle(toks, w) { sh =>
      val h = xx64(UTF8String.fromString(sh))
      var i = 0
      while (i < perms) {
        val v = XxHash64Function.hash(h, LongType, i.toLong)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Winnowing fingerprints (the MOSS local-fingerprinting scheme): a
    * Karp–Rabin ROLLING polynomial hash over every k-CODEPOINT gram —
    * O(1) per gram instead of an O(k) digest — then the minimum of every
    * w consecutive gram hashes. Local fingerprints catch PARTIAL
    * overlap/containment (a copied paragraph shares its window minima)
    * that global-similarity signatures like MinHash dilute away.
    *
    * Hash family (exact BIGINT arithmetic, so an ANSI-SQL oracle
    * recomputes each gram directly): h(gram at i) = Σ_j cp_{i+j}·B^{k−1−j}
    * mod P with B=131, P=2³¹−1 — every intermediate stays under 2⁵³.
    * Codepoints match SQL character semantics (`string_split(text,'')` +
    * `unicode`) for SINGLE-CODEPOINT graphemes — DuckDB's `string_split`
    * yields grapheme CLUSTERS, so a combining sequence (e + U+0301) is
    * one oracle "character" but two codepoints here; q65's hash parity
    * is claimed only for single-codepoint-grapheme text (the testdata
    * corpus is ASCII). The kernel's own codepoint behavior on combining
    * marks is pinned in SignatureParitySpec. Total: texts shorter than
    * k yield an empty array; texts
    * with fewer than w grams yield the single min over all grams (the
    * short-doc rule, mirroring shingles). Returns the DISTINCT minima,
    * sorted — adjacent windows mostly share their minimum, so in-kernel
    * dedup shrinks the exploded posting volume ~w× and spares callers a
    * relational dropDuplicates (set semantics are what every consumer
    * wants; the q65 oracle applies DISTINCT on its side too).
    */
  val WinnowP: Long = (1L << 31) - 1
  val WinnowB: Long = 131L

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // bPow = B^(k-1) mod P, the weight of the outgoing codepoint
    var bPow = 1L
    var p = 1
    while (p < k) { bPow = (bPow * WinnowB) % WinnowP; p += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (h * WinnowB + cps(i)) % WinnowP
      if (i >= k - 1) {
        hs(i - k + 1) = h
        // roll: drop cp_{i-k+1} for the next gram
        h = (h - (cps(i - k + 1) * bPow) % WinnowP + WinnowP) % WinnowP
      }
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val out = new Array[Long](nw)
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      var t = j
      val end = math.min(j + w, m)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      out(j) = mn
      j += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    var r = 0
    while (r < nw) {
      if (r == 0 || out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** POSITIONAL winnowing: per window select the RIGHTMOST minimal gram
    * hash and record (fp, pos) only when the selected position changes.
    * This is plain winnowing with rightmost tie-breaking — NOT the MOSS
    * paper's "robust winnowing", whose tie rule prefers re-selecting the
    * PREVIOUS window's fingerprint on equal hashes to minimize recorded
    * positions; on tied hashes this variant can record extra
    * fingerprints, which only ever adds match evidence. Where [[winnow]]
    * answers "do these docs share content" (set semantics), the positions
    * answer "WHERE": a fingerprint matched across two docs pins the
    * shared span — posA − posB is the copy's offset delta, exact for
    * grams interior to the copied region and within w at its edges.
    * `pos` is the gram's starting CODEPOINT offset (same codepoint
    * semantics and caveats as [[winnow]]). Distinct fp VALUES equal
    * [[winnow]]'s output — each window's min value is tie-side-
    * independent — spec-pinned in SignatureParitySpec. Total: shorter-
    * than-k text yields an empty array; fewer than w grams yield the
    * single-window selection. Output ordered by pos.
    */
  def winnowPositions(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    var bPow = 1L
    var p = 1
    while (p < k) { bPow = (bPow * WinnowB) % WinnowP; p += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (h * WinnowB + cps(i)) % WinnowP
      if (i >= k - 1) {
        hs(i - k + 1) = h
        h = (h - (cps(i - k + 1) * bPow) % WinnowP + WinnowP) % WinnowP
      }
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val buf = new scala.collection.mutable.ArrayBuffer[Any](nw / 2 + 1)
    var lastPos = -1
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      var mp = -1
      var t = j
      val end = math.min(j + w, m)
      while (t < end) { if (hs(t) <= mn) { mn = hs(t); mp = t }; t += 1 }
      if (mp != lastPos) {
        buf += new GenericInternalRow(Array[Any](mn, mp))
        lastPos = mp
      }
      j += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** 32-bit SimHash, portable family (per token OCCURRENCE, like the
    * explode path). Total: token-less text yields signature 0.
    */
  def simhashPortable32(text: UTF8String): Long = {
    val toks = tokensOf(text)
    val n = toks.length
    val counts = new Array[Int](32)
    var t = 0
    while (t < n) {
      val h = md5First4(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < 32) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit SimHash, xxhash64 family. Total: token-less text yields 0. */
  def simhashXx64(text: UTF8String): Long = {
    val toks = tokensOf(text)
    val n = toks.length
    val counts = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = xx64(UTF8String.fromString(toks(t)))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** MinHash signature of a text column in one codegen'd pass —
  * `array<long>` of length `perms`. TOTAL and null-intolerant: null text
  * → null, token-less text → the identity signature (all Long.MaxValue).
  * Null-intolerance matters for plan quality: join keys derived from the
  * signature make `InferFiltersFromConstraints` emit `isnotnull(sig)`,
  * and on a null-intolerant expression the optimizer simplifies that to
  * `isnotnull(text)` instead of pushing a SECOND kernel evaluation into
  * the filter below the projection.
  */
case class MinHashSig(child: Expression, perms: Int, shingleW: Int,
    portable: Boolean) extends UnaryExpression {

  require(perms > 0, s"perms must be positive, got $perms")
  require(shingleW > 0, s"shingleW must be positive, got $shingleW")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (portable) "minhash_sig_portable" else "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  private def fn: String = if (portable) "minhashPortable" else "minhashXx"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (portable) SigOps.minhashPortable(t, shingleW, perms)
    else SigOps.minhashXx(t, shingleW, perms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SigOps.$fn($c, $shingleW, $perms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash signature of a text column in one codegen'd pass — a single
  * long (32 significant bits for the portable family, 64 for xxhash64).
  * TOTAL and null-intolerant (token-less text → 0) — see [[MinHashSig]]
  * for why that shape matters to the optimizer.
  */
case class SimHashSig(child: Expression, portable: Boolean)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (portable) "simhash_sig_portable32" else "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  private def fn: String = if (portable) "simhashPortable32" else "simhashXx64"

  override protected def nullSafeEval(input: Any): Any =
    if (portable) SigOps.simhashPortable32(input.asInstanceOf[UTF8String])
    else SigOps.simhashXx64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SigOps.$fn($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Winnowing fingerprint array of a text column in one codegen'd pass —
  * `array<long>` of window minima over k-gram hashes. TOTAL and
  * null-intolerant (shorter-than-k text → empty array) — see
  * [[MinHashSig]] for why that shape matters to the optimizer.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k > 0, s"k must be positive, got $k")
  require(w > 0, s"w must be positive, got $w")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SigOps.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SigOps.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Positional winnowing fingerprints in one codegen'd pass —
  * `array<struct<fp:long, pos:int>>` of robust-winnowing selections
  * ([[SigOps.winnowPositions]]). TOTAL and null-intolerant like
  * [[WinnowFingerprints]].
  */
case class WinnowFingerprintPositions(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k > 0, s"k must be positive, got $k")
  require(w > 0, s"w must be positive, got $w")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprint_positions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SigOps.winnowPositions(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SigOps.winnowPositions($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintPositions =
    copy(child = newChild)
}

object SignatureExpressions {

  /** MinHash signature column over a text column (token-less text → the
    * all-MaxValue identity signature — exclude such docs with a `\S`
    * predicate before banding).
    */
  def minhashSig(text: Column, perms: Int, shingleW: Int = 3,
      portable: Boolean = false): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(text), perms, shingleW, portable))

  /** SimHash signature column over a text column (token-less text → 0). */
  def simhashSig(text: Column, portable: Boolean = false): Column =
    GraftSqlBridge.column(SimHashSig(GraftSqlBridge.expression(text), portable))

  /** Winnowing fingerprint array over a text column (shorter-than-k text
    * → empty array).
    */
  def winnowFps(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(text), k, w))

  /** Positional winnowing fingerprints: array<struct<fp, pos>> of
    * robust-winnowing selections (shorter-than-k text → empty array).
    */
  def winnowFpPositions(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftSqlBridge.column(
      WinnowFingerprintPositions(GraftSqlBridge.expression(text), k, w))
}
