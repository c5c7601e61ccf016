package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed `Aggregator`: a bounded
  * `slots`-entry counter map with the classic guarantee that any item
  * whose true frequency exceeds `n / (slots + 1)` survives in the summary
  * (its estimate undercounts by at most `n / (slots + 1)`). Partial
  * buffers merge with the Agarwal et al. ("Mergeable Summaries") rule —
  * sum counts, then subtract the (slots+1)-th largest count from all and
  * drop non-positives — which preserves the error bound, so the aggregate
  * is map-side combinable like any Spark partial aggregation.
  *
  * The buffer also carries the total processed count `n`, so one pass
  * yields both the candidate set and the threshold denominator.
  *
  * The summary alone is NOT deterministic (surviving sub-threshold
  * candidates depend on merge order) — consumers must re-check candidates
  * exactly ([[graft.operators.TextOps.heavyHitters]] does), which makes
  * the composed result exact and order-independent. This is the same
  * sketch-prescreen + exact-recheck contract as
  * [[graft.operators.Scale.bloomIncrementalDedup]].
  */
case class MGBuf(counts: Map[String, Long], n: Long)

class MisraGriesAggregator(slots: Int)
    extends Aggregator[String, MGBuf, MGBuf] {

  require(slots >= 1)

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(buf: MGBuf, tok: String): MGBuf = {
    val m = buf.counts
    val next =
      if (m.contains(tok)) m.updated(tok, m(tok) + 1L)
      else if (m.size < slots) m.updated(tok, 1L)
      // Full and new key: the MG decrement step — every counter drops by
      // one (the new item's single occurrence cancels against them),
      // zeros evicted. O(slots) only on eviction, amortized O(1) for
      // skewed streams.
      else m.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    MGBuf(next, buf.n + 1L)
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    val next =
      if (summed.size <= slots) summed
      else {
        // (slots+1)-th largest count, subtracted from all — the merge
        // that keeps the union's undercount within n/(slots+1).
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)
          .apply(slots)
        summed.collect { case (k, v) if v > cut => k -> (v - cut) }
      }
    MGBuf(next, a.n + b.n)
  }

  override def finish(buf: MGBuf): MGBuf = buf

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]

  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
