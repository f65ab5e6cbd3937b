package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document text hot path: SimHash,
  * token quality stats, language-marker counts, distinct shingle-hash sets,
  * MinHash signatures, LSH band keys, and set-intersection size.
  *
  * Each computes in ONE pass over the document what the explode-based
  * formulations in TextOps/DedupOps compute with a token/bit fan-out plus a
  * groupBy(doc_id) exchange — e.g. SimHash32 replaces a 32× row explosion
  * and two aggregations with a single projection. The explode forms remain
  * the executable spec (mirrored by the DuckDB oracle; NativeTextSpec pins
  * bit-equality), these are the plans you'd actually run on 100 TB: a pure
  * map stage, no shuffle, inside whole-stage codegen via `doGenCode`.
  *
  * Tokenization parity: tokens are the `split(text, ' ')` segments with
  * limit −1 semantics (empty tokens between consecutive separators and at
  * the ends are KEPT); hashes are the radix-31 code-point fold mod 1e9+7 of
  * Hashing.foldString; token lengths count code points like Spark's
  * `length`.
  */
object TextExprs {

  val P = Hashing.P
  private val EmptyLongs = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  // ---------------------------------------------------------------- helpers

  /** Walk `split(s, ' ')` (limit −1), invoking `f(hash, start, end)` per
    * token where [start, end) are char offsets in `str`. */
  private def foreachToken(str: String, f: (Long, Int, Int) => Unit): Unit = {
    val n = str.length
    var start = 0
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == ' ') { f(acc, start, i); acc = 0L; start = i + 1 }
      else acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    f(acc, start, n)
  }

  /** 32-bit SimHash: bit i of the result is set iff the (+1/−1) sum of bit i
    * over all token-occurrence hashes is > 0 (ties → 0). */
  def simHash(s: UTF8String): Long = {
    val counts = new Array[Int](32)
    foreachToken(s.toString, (h, _, _) => {
      var i = 0
      while (i < 32) { counts(i) += (((h >> i) & 1L).toInt << 1) - 1; i += 1 }
    })
    var fp = 0L
    var i = 0
    while (i < 32) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** One-pass token stats: (n_tokens, n_distinct, sum of code-point lengths,
    * stopword hits). Distinct is over token STRINGS (hash-collision-proof,
    * like countDistinct). */
  def tokenStats(s: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val str = s.toString
    val seen = new java.util.HashSet[String]()
    var nTok = 0L; var sumLen = 0L; var nStop = 0L
    foreachToken(str, (_, a, b) => {
      val tok = str.substring(a, b)
      nTok += 1
      sumLen += tok.codePointCount(0, tok.length)
      if (stop.contains(tok)) nStop += 1
      seen.add(tok)
    })
    new GenericInternalRow(Array[Any](nTok, seen.size.toLong, sumLen, nStop))
  }

  /** Per-marker-set token hit counts, one pass. */
  def markerCounts(s: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](sets.length)
    foreachToken(str, (_, a, b) => {
      val tok = str.substring(a, b)
      var i = 0
      while (i < sets.length) { if (sets(i).contains(tok)) counts(i) += 1; i += 1 }
    })
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** Distinct k-token-shingle hashes (two-level radix-31 fold), in first-
    * occurrence order; empty when the document has < k tokens. */
  def shingleHashSet(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    var th = new Array[Long](16)
    var n = 0
    foreachToken(str, (h, _, _) => {
      if (n == th.length) th = java.util.Arrays.copyOf(th, n * 2)
      th(n) = h; n += 1
    })
    if (n < k) EmptyLongs
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      var out = new Array[Long](n - k + 1)
      var m = 0
      var i = 0
      while (i + k <= n) {
        var acc = 0L
        var j = i
        while (j < i + k) { acc = (acc * 31 + th(j)) % P; j += 1 }
        if (seen.add(acc)) { out(m) = acc; m += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
    }
  }

  /** ALL k-token-shingle hashes in POSITION order, duplicates kept — the
    * positional companion to [[shingleHashSet]] for substring-run analysis
    * (q75's islands need gram START POSITIONS, which a distinct set
    * destroys); empty when the document has < k tokens. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    var th = new Array[Long](16)
    var n = 0
    foreachToken(str, (h, _, _) => {
      if (n == th.length) th = java.util.Arrays.copyOf(th, n * 2)
      th(n) = h; n += 1
    })
    if (n < k) EmptyLongs
    else {
      val out = new Array[Long](n - k + 1)
      var i = 0
      while (i + k <= n) {
        var acc = 0L
        var j = i
        while (j < i + k) { acc = (acc * 31 + th(j)) % P; j += 1 }
        out(i) = acc
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** MinHash signature over a shingle-hash array: sig[j] = min over hashes
    * of (a_j·h + b_j) mod P with a_j = 654435747·(j+1) mod P and
    * b_j = 1779033703·(2j+1) mod P — a pairwise-independent affine family
    * with LARGE per-row multipliers. The original small-multiplier family
    * ((2j+3)·h + (5j+7)) was nearly degenerate: with a_j ≤ 33 the product
    * barely wraps mod P, so every row's minimum was usually attained by
    * the SAME globally-smallest h and the b "independent" bands collapsed
    * to ~one effective band — LSH recall at moderate Jaccard fell from the
    * textbook 1-(1-J^r)^b to roughly a single Bernoulli draw
    * (StreamClusterSpec's J ≈ 0.44 bridge missed all 16 single-row bands).
    * Large multipliers wrap ~a_j times across [0, P), decorrelating the
    * rows; a_j·h stays within int64 (both factors < P ≈ 2³⁰). The DuckDB
    * oracles transcribe this family verbatim. Callers must guard empty
    * inputs (the expression returns null there — a MaxValue sentinel
    * signature would band-collide every empty doc with every other). */
  def minHashSig(sh: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j0 = 0
    while (j0 < k) {
      as(j0) = (654435747L * (j0 + 1)) % P
      bs(j0) = (1779033703L * (2L * j0 + 1)) % P
      j0 += 1
    }
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  private val BandW = Array(1L, 31L, 961L, 29791L)

  /** LSH band keys: key[b] = Σ_{r<rpb} sig[b·rpb + r] · 31^r (the radix-31
    * combination of DedupOps.lshBands; rpb ≤ 4 keeps it in int64). Like the
    * groupBy spec (`j div rpb`), a trailing PARTIAL band is emitted when
    * the signature length is not a multiple of rpb. */
  def lshBandKeys(sig: ArrayData, rowsPerBand: Int): ArrayData = {
    val n = sig.numElements()
    val nb = (n + rowsPerBand - 1) / rowsPerBand
    val keys = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      var acc = 0L
      var r = 0
      val lim = math.min(rowsPerBand, n - b * rowsPerBand)
      while (r < lim) { acc += sig.getLong(b * rowsPerBand + r) * BandW(r); r += 1 }
      keys(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  /** One-pass word k-gram repetition stats over the gram-hash MULTISET
    * (two-level radix-31 fold like [[shingleHashSet]], but counting
    * occurrences): (total, distinct, top_freq). total = n−k+1 grams — 0
    * when the doc has < k tokens; top_freq = the most frequent gram's
    * occurrence count. The Gopher/C4 repetition signals (duplicate-gram
    * and top-gram fractions) are projections of these three numbers. */
  def gramStats(s: UTF8String, k: Int): InternalRow = {
    val str = s.toString
    var th = new Array[Long](16)
    var n = 0
    foreachToken(str, (h, _, _) => {
      if (n == th.length) th = java.util.Arrays.copyOf(th, n * 2)
      th(n) = h; n += 1
    })
    if (n < k) new GenericInternalRow(Array[Any](0L, 0L, 0L))
    else {
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      var i = 0
      while (i + k <= n) {
        var acc = 0L
        var j = i
        while (j < i + k) { acc = (acc * 31 + th(j)) % P; j += 1 }
        counts.merge(acc, 1L, (a, b) => a + b)
        i += 1
      }
      var top = 0L
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next(); if (c > top) top = c }
      new GenericInternalRow(
        Array[Any]((n - k + 1).toLong, counts.size.toLong, top))
    }
  }

  /** |A ∩ B| for two long-array SETS (each side has no internal dups). */
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[java.lang.Long](small.numElements() * 2)
    var i = 0
    val ns = small.numElements()
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var common = 0L
    val nl = large.numElements()
    i = 0
    while (i < nl) { if (set.contains(large.getLong(i))) common += 1; i += 1 }
    common
  }

  /** Token offsets + hashes of `str` in one [[foreachToken]] walk:
    * (starts, ends, hs, n) — arrays may be oversized, read only [0, n). */
  private def tokenArrays(str: String): (Array[Int], Array[Int], Array[Long], Int) = {
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var hs = new Array[Long](16)
    var n = 0
    foreachToken(str, (h, a, b) => {
      if (n == hs.length) {
        starts = java.util.Arrays.copyOf(starts, n * 2)
        ends = java.util.Arrays.copyOf(ends, n * 2)
        hs = java.util.Arrays.copyOf(hs, n * 2)
      }
      starts(n) = a; ends(n) = b; hs(n) = h; n += 1
    })
    (starts, ends, hs, n)
  }

  /** Second-level radix-31 fold over hs[t0, t1). */
  private def foldRange(hs: Array[Long], t0: Int, t1: Int): Long = {
    var acc = 0L
    var j = t0
    while (j < t1) { acc = (acc * 31 + hs(j)) % P; j += 1 }
    acc
  }

  /** One-pass intra-document segment dedup (CurationOps.intraDocDedup's
    * production kernel): consecutive `segTokens`-token segments, first
    * occurrence of each two-level-fold hash kept, survivors' ORIGINAL char
    * spans re-joined by single spaces. Span copying is exact because
    * `split(s, ' ')` tokens are separated by exactly one space char in the
    * source by construction (runs of spaces become empty tokens), so a
    * segment's [firstTokenStart, lastTokenEnd) span IS its tokens joined
    * with ' ' — including empty-token runs.
    *
    * Returns (clean_text, n_tokens, kept_tokens, dropped_segments). */
  def segDedup(s: UTF8String, segTokens: Int): InternalRow = {
    val str = s.toString
    val (starts, ends, hs, n) = tokenArrays(str)
    val nSeg = ((n + segTokens - 1) / segTokens)
    val seen = new java.util.HashSet[java.lang.Long](nSeg * 2)
    val sb = new java.lang.StringBuilder(str.length)
    var keptTokens = 0L
    var dropped = 0L
    // explicit first-kept flag, NOT sb.length: an empty first segment
    // (leading-space doc) leaves sb empty, and the length test would then
    // silently swallow the joining space before the next segment — found
    // by the PropertySpec random-docs equality sweep
    var firstKept = true
    var i = 0
    while (i < nSeg) {
      val t0 = i * segTokens
      val t1 = math.min(t0 + segTokens, n)
      if (seen.add(foldRange(hs, t0, t1))) {
        if (!firstKept) sb.append(' ')
        firstKept = false
        sb.append(str, starts(t0), ends(t1 - 1))
        keptTokens += t1 - t0
      } else dropped += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), n.toLong, keptTokens, dropped))
  }

  /** One-pass consecutive-segment relation kernel (CurationOps.
    * segmentRelation's production path): (seg_idx, h, ntok, txt) per
    * `segTokens`-token segment, spans copied from the source like
    * [[segDedup]]. The HOF form (split → transform/slice → per-token char
    * fold) re-hashes and re-allocates per segment in interpreted lambdas;
    * this touches each char once inside codegen. */
  def segStructs(s: UTF8String, segTokens: Int): ArrayData = {
    val str = s.toString
    val (starts, ends, hs, n) = tokenArrays(str)
    val nSeg = (n + segTokens - 1) / segTokens
    val out = new Array[Any](nSeg)
    var i = 0
    while (i < nSeg) {
      val t0 = i * segTokens
      val t1 = math.min(t0 + segTokens, n)
      out(i) = new GenericInternalRow(Array[Any](
        i, foldRange(hs, t0, t1), t1 - t0,
        UTF8String.fromString(str.substring(starts(t0), ends(t1 - 1)))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass overlapping-window chunk kernel (CurationOps.chunk's
    * production path): (chunk_id, start, ntok, h, txt) per `stride`-spaced
    * `window`-token chunk (last may be shorter), identical hash/text
    * semantics to the HOF form. */
  def chunkStructs(s: UTF8String, window: Int, stride: Int): ArrayData = {
    val str = s.toString
    val (starts, ends, hs, n) = tokenArrays(str)
    // same chunk count as sequence(0, floor((n-1)/stride)): every start
    // index i*stride < n yields a chunk
    val nChunk = (n - 1) / stride + 1
    val out = new Array[Any](nChunk)
    var c = 0
    while (c < nChunk) {
      val t0 = c * stride
      val t1 = math.min(t0 + window, n)
      out(c) = new GenericInternalRow(Array[Any](
        c.toLong, t0.toLong, (t1 - t0).toLong, foldRange(hs, t0, t1),
        UTF8String.fromString(str.substring(starts(t0), ends(t1 - 1)))))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document term frequencies in ONE pass, first-occurrence order:
    * (term, c) per DISTINCT token. Replaces the explode → groupBy(doc,
    * term) shape in TF builders — the per-doc aggregation happens inside
    * the scan stage (map-side, bounded by doc length), so the only
    * exchange left in a TF/DF pipeline is the corpus-level term one. */
  def termCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val order = new java.util.ArrayList[String]()
    val counts = new java.util.HashMap[String, java.lang.Long]()
    foreachToken(str, (_, a, b) => {
      val tok = str.substring(a, b)
      val prev = counts.get(tok)
      if (prev == null) { order.add(tok); counts.put(tok, 1L) }
      else counts.put(tok, prev + 1L)
    })
    val out = new Array[Any](order.size)
    var i = 0
    while (i < order.size) {
      val tok = order.get(i)
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(tok), counts.get(tok).longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val T = "graft.functions.TextExprs"

  // ------------------------------------------------------------ expressions

  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override def nullSafeEval(v: Any): Any = simHash(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.simHash($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class TokenStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stopwords.foreach(s.add)
      s
    }
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("sumlen", LongType, nullable = false),
      StructField("nstop", LongType, nullable = false),
    ))
    override def prettyName: String = "token_stats"
    override def nullSafeEval(v: Any): Any = tokenStats(v.asInstanceOf[UTF8String], stopSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
      defineCodeGen(ctx, ev, c => s"$T.tokenStats($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MarkerCounts(child: Expression, markerSets: Seq[Seq[String]])
      extends UnaryExpression {
    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      markerSets.map { ws =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        s
      }.toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "marker_counts"
    override def nullSafeEval(v: Any): Any = markerCounts(v.asInstanceOf[UTF8String], sets)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
      defineCodeGen(ctx, ev, c => s"$T.markerCounts($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class SegDedup(child: Expression, segTokens: Int) extends UnaryExpression {
    require(segTokens > 0, s"seg_dedup: segTokens must be positive, got $segTokens")
    override def dataType: DataType = StructType(Seq(
      StructField("clean_text", StringType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("kept_tokens", LongType, nullable = false),
      StructField("dropped_segments", LongType, nullable = false),
    ))
    override def prettyName: String = "seg_dedup"
    override def nullSafeEval(v: Any): Any = segDedup(v.asInstanceOf[UTF8String], segTokens)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.segDedup($c, $segTokens)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class SegStructs(child: Expression, segTokens: Int) extends UnaryExpression {
    require(segTokens > 0, s"seg_structs: segTokens must be positive, got $segTokens")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("seg_idx", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("ntok", IntegerType, nullable = false),
      StructField("txt", StringType, nullable = false),
    )), containsNull = false)
    override def prettyName: String = "seg_structs"
    override def nullSafeEval(v: Any): Any = segStructs(v.asInstanceOf[UTF8String], segTokens)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.segStructs($c, $segTokens)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class ChunkStructs(child: Expression, window: Int, stride: Int)
      extends UnaryExpression {
    require(stride > 0 && window >= stride,
      s"chunk_structs: need 0 < stride <= window, got window=$window stride=$stride")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("start", LongType, nullable = false),
      StructField("ntok", LongType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("txt", StringType, nullable = false),
    )), containsNull = false)
    override def prettyName: String = "chunk_structs"
    override def nullSafeEval(v: Any): Any =
      chunkStructs(v.asInstanceOf[UTF8String], window, stride)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.chunkStructs($c, $window, $stride)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class TermCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("c", LongType, nullable = false),
    )), containsNull = false)
    override def prettyName: String = "term_counts"
    override def nullSafeEval(v: Any): Any = termCounts(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.termCounts($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash_set"
    override def nullSafeEval(v: Any): Any = shingleHashSet(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.shingleHashSet($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"
    override def nullSafeEval(v: Any): Any = shingleHashes(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.shingleHashes($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "min_hash_sig"
    override def nullSafeEval(v: Any): Any = {
      val sh = v.asInstanceOf[ArrayData]
      if (sh.numElements() == 0) null else minHashSig(sh, k)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        if ($c.numElements() == 0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $T.minHashSig($c, $k);
        }""")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class LshBandKeys(child: Expression, rowsPerBand: Int) extends UnaryExpression {
    require(rowsPerBand >= 1 && rowsPerBand <= 4,
      "radix-31 band key supports <= 4 rows/band in int64")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "lsh_band_keys"
    override def nullSafeEval(v: Any): Any = lshBandKeys(v.asInstanceOf[ArrayData], rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.lshBandKeys($c, $rowsPerBand)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class GramStats(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"gram_stats k must be >= 1, got $k")
    override def dataType: DataType = StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("uniq", LongType, nullable = false),
      StructField("top_freq", LongType, nullable = false),
    ))
    override def prettyName: String = "gram_stats"
    override def nullSafeEval(v: Any): Any = gramStats(v.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$T.gramStats($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "intersect_size"
    override def nullSafeEval(a: Any, b: Any): Any =
      intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$T.intersectSize($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // --------------------------------------------------------- Column facades

  def simhash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
  def token_stats(c: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(c), stopwords))
  def marker_counts(c: Column, markerSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(MarkerCounts(ColumnBridge.expression(c), markerSets))
  def seg_dedup(c: Column, segTokens: Int): Column =
    ColumnBridge.column(SegDedup(ColumnBridge.expression(c), segTokens))
  def seg_structs(c: Column, segTokens: Int): Column =
    ColumnBridge.column(SegStructs(ColumnBridge.expression(c), segTokens))
  def term_counts(c: Column): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(c)))
  def chunk_structs(c: Column, window: Int, stride: Int): Column =
    ColumnBridge.column(ChunkStructs(ColumnBridge.expression(c), window, stride))
  def shingle_hash_set(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(c), k))
  def shingle_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))
  def min_hash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
  def lsh_band_keys(c: Column, rowsPerBand: Int): Column =
    ColumnBridge.column(LshBandKeys(ColumnBridge.expression(c), rowsPerBand))
  def gram_stats(c: Column, k: Int): Column =
    ColumnBridge.column(GramStats(ColumnBridge.expression(c), k))
  def intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
