package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory heavy hitters: the Space-Saving sketch (Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data streams",
  * ICDT 2005) as a typed Spark [[Aggregator]] — the 100 TB path for the
  * vocabulary/top-terms statistic (RetrievalOps.vocabulary, reference
  * notebook's word-count cells).
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
  * summary is bracketed by that summary's minimum counter (0 while it is
  * under capacity), which is added to both the estimate and the error
  * (Berinde et al., PODS 2009 merge rule), then the union is trimmed back to
  * the top-c counters.
  *
  * EXACT regime: while every partial summary stays under capacity the min
  * counter is 0, eviction never fires, and the sketch degrades to a plain
  * per-partition count map — estimates are exact, every err is 0, and the
  * result is bit-identical to the exact aggregation under ANY partitioning
  * (SpaceSavingSpec pins this; q88 runs here so the DuckDB oracle
  * hash-matches). Under overflow the summary stays within the bounds above
  * but its exact contents become partitioning-dependent — callers in that
  * regime read it as the approximation it is (the spec asserts the bounds,
  * not the bits).
  *
  * The buffer is three parallel arrays (term, count, err) sorted by term so
  * the product encoder serializes it without Kryo and merges walk both
  * sides linearly.
  */
final case class SSummary(terms: Array[String], counts: Array[Long], errs: Array[Long])

final case class SSItem(term: String, estCf: Long, err: Long)

/** finish() output: a single-row wrapper so the product encoder applies. */
final case class SSTop(items: Seq[SSItem])

final class SpaceSavingAgg(capacity: Int)
    extends Aggregator[Seq[String], SSummary, SSTop] {
  require(capacity > 0, s"SpaceSavingAgg: capacity must be positive, got $capacity")

  override def zero: SSummary =
    SSummary(Array.empty, Array.empty, Array.empty)

  /** Fold one document's tokens into the summary. Tokens are first counted
    * locally (a doc repeats few distinct terms), then merged as a batch —
    * one sorted-merge per row instead of one probe per token. */
  override def reduce(b: SSummary, tokens: Seq[String]): SSummary = {
    if (tokens.isEmpty) return b
    val local = scala.collection.mutable.TreeMap.empty[String, Long]
    tokens.foreach(t => local.update(t, local.getOrElse(t, 0L) + 1L))
    mergeSorted(b, SSummary(local.keysIterator.toArray, local.valuesIterator.toArray,
      new Array[Long](local.size)))
  }

  override def merge(a: SSummary, b: SSummary): SSummary = mergeSorted(a, b)

  /** Berinde-style merge of two term-sorted summaries, then trim to the
    * top-`capacity` counters (ties broken by term so the trim is
    * deterministic). minA/minB are 0 while the side is under capacity —
    * the exact regime — so the union is a plain count sum. */
  private def mergeSorted(a: SSummary, b: SSummary): SSummary = {
    if (a.terms.isEmpty) return b
    if (b.terms.isEmpty) return a
    val minA = if (a.terms.length < capacity) 0L else a.counts.min
    val minB = if (b.terms.length < capacity) 0L else b.counts.min
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
    if (k <= capacity) SSummary(ts.take(k), cs.take(k), es.take(k))
    else {
      // keep the top-`capacity` by (count desc, term asc), restore term order
      val kept = Array.range(0, k)
        .sortBy(x => (-cs(x), ts(x)))(Ordering.Tuple2(Ordering.Long, Ordering.String))
        .take(capacity).sorted
      SSummary(kept.map(ts), kept.map(cs), kept.map(es))
    }
  }

  /** Top counters by (estimate desc, term asc) — rank assignment happens in
    * the caller so the output stays a plain array column. */
  override def finish(b: SSummary): SSTop = {
    val idx = Array.range(0, b.terms.length)
      .sortBy(x => (-b.counts(x), b.terms(x)))(Ordering.Tuple2(Ordering.Long, Ordering.String))
    SSTop(idx.toSeq.map(x => SSItem(b.terms(x), b.counts(x), b.errs(x))))
  }

  override def bufferEncoder: Encoder[SSummary] = Encoders.product[SSummary]
  override def outputEncoder: Encoder[SSTop] = Encoders.product[SSTop]
}
