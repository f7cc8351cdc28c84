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

  class TopKAggregator(k: Int) extends Aggregator[In, List[Entry], Seq[Entry]] {
    private def ord: Ordering[Entry] =
      Ordering.by[Entry, (Double, Long)] { case (v, id) => (-v, id) }
    private def trim(xs: List[Entry]): List[Entry] = xs.sorted(ord).take(k)
    override def zero: List[Entry] = Nil
    override def reduce(b: List[Entry], a: In): List[Entry] =
      trim((a._3, a._2) :: b)
    override def merge(b1: List[Entry], b2: List[Entry]): List[Entry] =
      trim(b1 ++ b2)
    override def finish(r: List[Entry]): Seq[Entry] = r.sorted(ord)
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
