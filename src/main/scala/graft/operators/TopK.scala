package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Aggregator` computing per-group top-k WITHOUT sorting each
  * group's full row set — the UDAF shape SURVEY.md §7.3 anticipates for
  * sketch/similarity aggregations.
  *
  * vs the window formulation (`row_number() <= k`): the window sorts
  * every group's rows inside the shuffle; this aggregator's partial
  * buffers cap at k entries per (group, map task), so the shuffle
  * carries O(groups x k), not O(rows) — exactly like the partial
  * aggregation of a sum, but for an ordered sketch.
  */
object TopK {

  /** Aggregator input: (group, id, value); buffer/result: capped list of
    * (value, id), descending value then ascending id. */
  type In = (Long, Long, Double)
  type Entry = (Double, Long)

  /** Buffer invariant: ascending "badness" — the WORST surviving entry
    * is at the head, so the common case (an input that doesn't make the
    * cut once the buffer is full) is an O(1) head comparison, a
    * qualifying insert is O(position), and merging two buffers is one
    * O(k) sorted-list merge. The previous implementation re-sorted the
    * whole buffer on every row (O(k log k) per input) — the wrong shape
    * for the bounded ordered sketch this advertises. A binary heap has
    * the same bounds; the sorted list keeps the buffer a plain
    * `List[Entry]` that Spark's ExpressionEncoder serializes natively. */
  class TopKAggregator(k: Int) extends Aggregator[In, List[Entry], Seq[Entry]] {
    // strict total order: a ranks strictly worse than b
    // (smaller value, or same value with the larger id)
    private def worseThan(a: Entry, b: Entry): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

    private def insert(b: List[Entry], e: Entry): List[Entry] =
      if (k == 0 || (b.lengthCompare(k) >= 0 && worseThan(e, b.head))) b
      else {
        val (worse, better) = b.span(worseThan(_, e))
        val grown = worse ::: e :: better
        if (grown.lengthCompare(k) > 0) grown.tail else grown
      }

    override def zero: List[Entry] = Nil
    override def reduce(b: List[Entry], a: In): List[Entry] =
      insert(b, (a._3, a._2))
    override def merge(b1: List[Entry], b2: List[Entry]): List[Entry] = {
      @annotation.tailrec
      def go(x: List[Entry], y: List[Entry], acc: List[Entry]): List[Entry] =
        (x, y) match {
          case (Nil, r) => acc reverse_::: r
          case (l, Nil) => acc reverse_::: l
          case (xh :: xt, yh :: yt) =>
            if (worseThan(xh, yh)) go(xt, y, xh :: acc) else go(x, yt, yh :: acc)
        }
      val merged = go(b1, b2, Nil)
      merged.drop(math.max(0, merged.length - k))
    }
    override def finish(r: List[Entry]): Seq[Entry] = r.reverse
    override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  /** Top-k rows per group: (group, id, value) for the k largest `value`
    * per `groupCol`, ties broken by id. Runs as a real aggregation
    * (partial buffers before the shuffle), not a windowed sort. */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
                   idCol: String, valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(groupCol).cast("long"), col(idCol).cast("long"),
      col(valueCol).cast("double")).as[In]
    val agg = new TopKAggregator(k)
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("entries"))
      .toDF("group", "entries")
      .select(col("group"), explode(col("entries")).as("e"))
      .select(col("group"), col("e._2").as("id"), col("e._1").as("value"))
  }
}
