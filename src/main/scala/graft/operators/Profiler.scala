package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiler: per-column quality stats in one pass (the dataflow
  * version of the reference's ad-hoc runtime guards, SURVEY.md §5.1).
  *
  * One aggregation computes every column's stats simultaneously
  * (single scan, single reduce — NOT one job per column); the long-form
  * result is assembled from the one aggregated row. Values are
  * stringified so heterogeneous column types share one result schema.
  */
object Profiler {

  /** (column, n_rows, n_nulls, n_distinct, min, max) per column.
    * `exact = false` switches the distinct count to HLL — the right
    * default at 100 TB; exact mode exists for oracle-checked runs. */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      val base = i * 5
      (c, row.getLong(base), row.getLong(base) - row.getLong(base + 1),
        row.getLong(base + 2),
        Option(row.getString(base + 3)).getOrElse(""),
        Option(row.getString(base + 4)).getOrElse(""))
    }.toDF("column", "n_rows", "n_nulls", "n_distinct", "min", "max")
  }

  /** Constraint checks returning VIOLATION rows (empty = all good). */
  def checkNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  def checkUnique(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  def checkAccepted(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.filter(!col(c).isin(accepted: _*) || col(c).isNull)
}
