package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed `Aggregator`: each partial buffer
  * holds at most k (score, payload) entries, merged map-side — O(n log k)
  * with partial aggregation, versus the window `row_number` formulation
  * that shuffles and *fully sorts* every group. At 100 TB with large
  * groups this is the difference between a bounded-memory aggregate and a
  * sort of the whole fact table; the window variant is kept for its
  * oracle-checkable SQL form (`topk_per_category`).
  *
  * Ordering: score descending, payload ascending on ties — total and
  * deterministic.
  */
case class TopKEntry(score: Double, payload: String)
case class TopKBuf(items: Seq[TopKEntry])

class TopKAggregator(k: Int)
    extends Aggregator[(Double, String), TopKBuf, TopKBuf] {

  require(k >= 1)

  private val ord: Ordering[TopKEntry] =
    Ordering.by(e => (-e.score, e.payload))

  override def zero: TopKBuf = TopKBuf(Nil)

  // buf.items is kept sorted by `ord`; when the buffer is full, a row
  // that cannot beat the current k-th entry is rejected in O(1) — the
  // guard that makes the aggregate O(n + hits·k log k) instead of
  // re-sorting the buffer for every input row.
  override def reduce(buf: TopKBuf, in: (Double, String)): TopKBuf = {
    val e = TopKEntry(in._1, in._2)
    if (buf.items.length >= k && ord.gteq(e, buf.items.last)) buf
    else TopKBuf((e +: buf.items).sorted(ord).take(k))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sorted(ord).take(k))

  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAggregator {

  /** Top-k rows per group over a DataFrame: returns
    * (group, rk 1..k, score, payload). Rows whose score or payload is
    * null are excluded — a null score cannot rank, a null payload cannot
    * tie-break (the Ordering would NPE on an equal-score comparison), and
    * the primitive decoder would otherwise fail the job.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   payloadCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k)
    df.select(col(groupCol).cast("string").as("_g"),
        col(scoreCol).cast("double").as("_s"),
        col(payloadCol).cast("string").as("_p"))
      .where(col("_s").isNotNull && col("_p").isNotNull)
      .as[(String, Double, String)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .toDF(groupCol, "top")
      .select(col(groupCol),
        posexplode(col("top.items")).as(Seq("_pos", "_e")))
      .select(col(groupCol), (col("_pos") + 1).cast("long").as("rk"),
        col("_e.score").as(scoreCol), col("_e.payload").as(payloadCol))
  }
}
