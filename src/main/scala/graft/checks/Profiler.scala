package graft.checks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass column profiler: null counts, approximate distinct counts
  * (HLL), min/max, and numeric means for every column of a table in a
  * SINGLE fused aggregation — the profiling query a data-quality UI runs
  * against a 100 TB table must scan it exactly once.
  *
  * Output: one row per column (column, dtype, n_rows, n_nulls,
  * approx_distinct, min, max, mean) with min/max/mean rendered as strings
  * so heterogeneous column types fit one frame.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType.typeName.startsWith("timestamp"))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_${f.name}"),
        approx_count_distinct(c).as(s"ad_${f.name}"),
        min(c).cast("string").as(s"mn_${f.name}"),
        max(c).cast("string").as(s"mx_${f.name}")) ++
        (if (f.dataType.isInstanceOf[NumericType])
          Seq(avg(c).cast("string").as(s"av_${f.name}")) else Nil)
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    cols.map { f =>
      (f.name, f.dataType.simpleString, n,
        row.getAs[Long](s"nn_${f.name}"),
        row.getAs[Long](s"ad_${f.name}"),
        Option(row.getAs[String](s"mn_${f.name}")),
        Option(row.getAs[String](s"mx_${f.name}")),
        if (f.dataType.isInstanceOf[NumericType])
          Option(row.getAs[String](s"av_${f.name}")) else None)
    }.toSeq.toDF("column", "dtype", "n_rows", "n_nulls", "approx_distinct",
      "min", "max", "mean")
  }
}
