package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory heavy hitters: the Space-Saving sketch (Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data streams",
  * ICDT 2005) — the 100 TB path for the vocabulary/top-terms statistic
  * (RetrievalOps.vocabulary, reference notebook's word-count cells).
  *
  * Why this exists when q80 already builds the exact dictionary: the exact
  * path shuffles one row per distinct term. A word-level vocabulary is small,
  * but the same statistic over URLs, hosts, n-grams, or error signatures has
  * cardinality ~corpus size — at 100 TB that term-keyed exchange carries
  * billions of keys to find a top-20. Space-Saving replaces it with a
  * FIXED-size summary per partition (capacity counters), merged pairwise by
  * Spark's partial aggregation: communication is O(capacity × partitions)
  * regardless of cardinality, one job, no term-keyed shuffle at all.
  *
  * Guarantees (with n = total token count, c = capacity):
  *   - estimate(x) >= true(x)                       (never undercounts)
  *   - estimate(x) - err(x) <= true(x)              (err brackets the truth)
  *   - any x with true(x) > n/c is in the summary   (heavy hitters survive)
  * Merging two summaries keeps all three: an absent key's count in the other
  * summary is bracketed by that summary's minimum counter (0 while that side
  * has never evicted), which is added to both the estimate and the error
  * (Berinde et al., PODS 2009 merge rule), then the union is trimmed back to
  * the top-c counters.
  *
  * EXACT regime: while no partial ever TRIMS (drops a counter) the sketch
  * degrades to a plain per-partition count map — estimates are exact, every
  * err is 0, and the result is bit-identical to the exact aggregation under
  * ANY partitioning (SpaceSavingSpec pins this; q88 runs here so the DuckDB
  * oracle hash-matches). Eviction is tracked by an explicit `overflowed`
  * flag set only when a trim actually drops counters — a summary holding
  * exactly `capacity` distinct terms with no eviction still merges exactly
  * (absent-key bound 0), where inferring overflow from size alone would
  * add spurious error mass one key early. Under overflow the summary stays
  * within the bounds above but its exact contents become
  * partitioning-dependent — callers in that regime read it as the
  * approximation it is (the spec asserts the bounds, not the bits).
  *
  * Two forms over one shared core ([[SpaceSaving]]):
  *   - [[SpaceSavingTopK]], the native TypedImperativeAggregate over the
  *     token ARRAY column (house form, like SeriesSlots/CollectCapped):
  *     rows never leave Tungsten for an encoder round-trip — update reads
  *     the ArrayData in place, so at billions of rows the decode no longer
  *     dominates the sketch. This is what RetrievalOps.heavyHitters runs.
  *   - [[SpaceSavingAgg]], the typed Dataset [[Aggregator]] facade for
  *     Dataset[Seq[String]] call sites and direct unit testing.
  *
  * The buffer is three parallel arrays (term, count, err) sorted by term so
  * merges walk both sides linearly, plus the overflow flag.
  */
final case class SSummary(terms: Array[String], counts: Array[Long],
    errs: Array[Long], overflowed: Boolean)

final case class SSItem(term: String, estCf: Long, err: Long)

/** finish() output: a single-row wrapper so the product encoder applies. */
final case class SSTop(items: Seq[SSItem])

/** The sketch core shared by both aggregate forms. */
object SpaceSaving {

  val zero: SSummary =
    SSummary(Array.empty, Array.empty, Array.empty, overflowed = false)

  /** One document's tokens as an exact (term-sorted) mini-summary. */
  def ofDoc(tokens: Iterator[String]): SSummary = {
    val local = scala.collection.mutable.TreeMap.empty[String, Long]
    tokens.foreach(t => local.update(t, local.getOrElse(t, 0L) + 1L))
    if (local.isEmpty) zero
    else SSummary(local.keysIterator.toArray, local.valuesIterator.toArray,
      new Array[Long](local.size), overflowed = false)
  }

  /** Trim to the top-`capacity` counters by (count desc, term asc) —
    * deterministic — restoring term order; marks `overflowed` ONLY when
    * counters were actually dropped. */
  def trim(s: SSummary, capacity: Int): SSummary = {
    if (s.terms.length <= capacity) s
    else {
      val kept = Array.range(0, s.terms.length)
        .sortBy(x => (-s.counts(x), s.terms(x)))(
          Ordering.Tuple2(Ordering.Long, Ordering.String))
        .take(capacity).sorted
      SSummary(kept.map(s.terms), kept.map(s.counts), kept.map(s.errs),
        overflowed = true)
    }
  }

  /** Berinde-style merge of two term-sorted summaries, then trim. The
    * absent-key bound for a side is 0 unless that side has EVICTED
    * (overflowed) — size alone is not evidence of loss. Empty sides still
    * trim the other: a single over-capacity document must not escape the
    * fixed-size buffer bound through the early return. */
  def merge(a: SSummary, b: SSummary, capacity: Int): SSummary = {
    // an empty summary is never overflowed (trim keeps >= 1 counter)
    if (a.terms.isEmpty) return trim(b, capacity)
    if (b.terms.isEmpty) return trim(a, capacity)
    val minA = if (!a.overflowed) 0L else a.counts.min
    val minB = if (!b.overflowed) 0L else b.counts.min
    val n = a.terms.length + b.terms.length
    val ts = new Array[String](n); val cs = new Array[Long](n); val es = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (i < a.terms.length || j < b.terms.length) {
      val cmp =
        if (i >= a.terms.length) 1
        else if (j >= b.terms.length) -1
        else a.terms(i).compareTo(b.terms(j))
      if (cmp == 0) {
        ts(k) = a.terms(i); cs(k) = a.counts(i) + b.counts(j); es(k) = a.errs(i) + b.errs(j)
        i += 1; j += 1
      } else if (cmp < 0) {
        ts(k) = a.terms(i); cs(k) = a.counts(i) + minB; es(k) = a.errs(i) + minB
        i += 1
      } else {
        ts(k) = b.terms(j); cs(k) = b.counts(j) + minA; es(k) = b.errs(j) + minA
        j += 1
      }
      k += 1
    }
    val carried = a.overflowed || b.overflowed
    if (k <= capacity)
      SSummary(ts.take(k), cs.take(k), es.take(k), overflowed = carried)
    else {
      val t = trim(SSummary(ts.take(k), cs.take(k), es.take(k), carried), capacity)
      t.copy(overflowed = true)
    }
  }

  /** Summary entries by (estimate desc, term asc). */
  def ranked(b: SSummary): IndexedSeq[(String, Long, Long)] =
    Array.range(0, b.terms.length)
      .sortBy(x => (-b.counts(x), b.terms(x)))(
        Ordering.Tuple2(Ordering.Long, Ordering.String))
      .map(x => (b.terms(x), b.counts(x), b.errs(x))).toIndexedSeq

  /** `space_saving_topk(tokensArray, capacity)`: array<struct<term, est_cf,
    * err>> ranked by (estimate desc, term asc). */
  def space_saving_topk(tokens: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(tokens), capacity)
        .toAggregateExpression())
}

/** Mutable in-partition buffer for [[SpaceSavingTopK]]: term → [count,
  * err] with amortized-O(1) token upserts. The map may hold up to
  * 2×capacity counters BETWEEN trims (slack so the trim sort amortizes to
  * O(log c) per new key); every boundary the engine sees — serialize (the
  * shuffled partial), merge, eval — trims back to `capacity`, so the
  * communication/state bound stays O(capacity). */
private[functions] final class SSBuf(
    val map: java.util.HashMap[String, Array[Long]],
    var overflowed: Boolean,
    // inherited-counter floor: the smallest KEPT count at the last trim —
    // an upper bound on every count ever dropped, so a (re-)entering key
    // admitted at `floor` can never undercount. Classic Space-Saving's
    // "new key inherits the evicted counter", O(1) per token instead of a
    // per-document min scan.
    var floor: Long) {

  /** Fold one document in: equivalent to core-merging the doc's exact
    * mini-summary (shared keys sum; doc-only keys enter with the floor
    * bound on count AND err). */
  def addDoc(tokens: ArrayData, capacity: Int): Unit = {
    val bon = floor
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      // null elements are skipped, not NPE'd: split() output never has
      // them, but the function is exposed generically over array<string>
      // columns whose containsNull may be true
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i).toString
        val arr = map.get(t)
        if (arr != null) arr(0) += 1L
        else map.put(t, Array(1L + bon, bon))
      }
      i += 1
    }
    if (map.size() > 2 * capacity) trimTo(capacity)
  }

  def trimTo(capacity: Int): Unit = {
    if (map.size() <= capacity) return
    val entries = new Array[(String, Array[Long])](map.size())
    val it = map.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val kept = entries.sortBy(e => (-e._2(0), e._1))(
      Ordering.Tuple2(Ordering.Long, Ordering.String)).take(capacity)
    map.clear()
    kept.foreach(e => map.put(e._1, e._2))
    overflowed = true
    floor = kept.last._2(0)
  }

  def toSummary(capacity: Int): SSummary = {
    trimTo(capacity)
    val terms = new Array[String](map.size())
    map.keySet().toArray(terms)
    java.util.Arrays.sort(terms, Ordering.String)
    val cs = new Array[Long](terms.length); val es = new Array[Long](terms.length)
    var i = 0
    while (i < terms.length) {
      val v = map.get(terms(i)); cs(i) = v(0); es(i) = v(1); i += 1
    }
    SSummary(terms, cs, es, overflowed)
  }
}

private[functions] object SSBuf {
  def empty: SSBuf =
    new SSBuf(new java.util.HashMap[String, Array[Long]], overflowed = false,
      floor = 0L)
  def of(s: SSummary): SSBuf = {
    val m = new java.util.HashMap[String, Array[Long]](s.terms.length * 2)
    var i = 0
    while (i < s.terms.length) {
      m.put(s.terms(i), Array(s.counts(i), s.errs(i))); i += 1
    }
    new SSBuf(m, s.overflowed,
      floor = if (s.overflowed && s.counts.nonEmpty) s.counts.min else 0L)
  }
}

/** Native house form: the sketch as a TypedImperativeAggregate over an
  * array<string> column — no Dataset encoder on the update path, mutable
  * O(1)-upsert buffer on the hot path. */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SSBuf] with UnaryLike[Expression] {

  require(capacity > 0, s"space_saving_topk: capacity must be positive, got $capacity")

  override def createAggregationBuffer(): SSBuf = SSBuf.empty

  override def update(buf: SSBuf, input: InternalRow): SSBuf = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return buf
    buf.addDoc(arr, capacity)
    buf
  }

  override def merge(a: SSBuf, b: SSBuf): SSBuf =
    SSBuf.of(SpaceSaving.merge(a.toSummary(capacity), b.toSummary(capacity), capacity))

  override def eval(buf: SSBuf): Any =
    new GenericArrayData(SpaceSaving.ranked(buf.toSummary(capacity)).map {
      case (t, c, e) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
    }.toArray[Any])

  override def serialize(buf: SSBuf): Array[Byte] = {
    val s = buf.toSummary(capacity)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.terms.length)
    out.writeBoolean(s.overflowed)
    var i = 0
    while (i < s.terms.length) {
      val tb = s.terms(i).getBytes(StandardCharsets.UTF_8)
      out.writeInt(tb.length); out.write(tb)
      out.writeLong(s.counts(i)); out.writeLong(s.errs(i))
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SSBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val overflowed = in.readBoolean()
    val ts = new Array[String](n); val cs = new Array[Long](n); val es = new Array[Long](n)
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](in.readInt()); in.readFully(tb)
      ts(i) = new String(tb, StandardCharsets.UTF_8)
      cs(i) = in.readLong(); es(i) = in.readLong()
      i += 1
    }
    SSBuf.of(SSummary(ts, cs, es, overflowed))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est_cf", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
  override def prettyName: String = "space_saving_topk"
}

/** Typed-Dataset facade over the same core (unit tests, Dataset callers). */
final class SpaceSavingAgg(capacity: Int)
    extends Aggregator[Seq[String], SSummary, SSTop] {
  require(capacity > 0, s"SpaceSavingAgg: capacity must be positive, got $capacity")

  override def zero: SSummary = SpaceSaving.zero

  override def reduce(b: SSummary, tokens: Seq[String]): SSummary =
    if (tokens.isEmpty) b
    else SpaceSaving.merge(b, SpaceSaving.ofDoc(tokens.iterator), capacity)

  override def merge(a: SSummary, b: SSummary): SSummary =
    SpaceSaving.merge(a, b, capacity)

  override def finish(b: SSummary): SSTop =
    SSTop(SpaceSaving.ranked(b).map { case (t, c, e) => SSItem(t, c, e) })

  override def bufferEncoder: Encoder[SSummary] = Encoders.product[SSummary]
  override def outputEncoder: Encoder[SSTop] = Encoders.product[SSTop]
}
