package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization and skew-safe aggregation — the remaining two
  * shapes a large event pipeline leans on constantly.
  */
object Sessions {

  /** Gap-based sessionization (the batch analog of streaming
    * `session_window`, which covers the continuous path in
    * ConsumeStream.sessionAgg): rows of one key whose consecutive `tsCol`
    * values are ≤ `gap` apart share a session; `session_id` is the
    * per-key session ordinal (1-based, in time order).
    *
    * The standard two-window form: flag rows that START a session
    * (previous row absent or gap exceeded), then running-sum the flags.
    * Both windows share one (key, ts) sort — ONE shuffle on the key, no
    * joins. Skew = a hot key's window, as with any per-key sort.
    *
    * `gap` units: the column's natural units for numeric `tsCol`; SECONDS
    * for TimestampType (the gap test compares epoch values via a double
    * cast — a raw TimestampType difference is an interval, which a Long
    * gap cannot compare against). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gap: Long): DataFrame = {
    // same reserved-name contract as Temporal.asofJoin/rangeJoin: a
    // pre-existing `__brk`/`session_id` column would be silently
    // overwritten (and `__brk` then dropped)
    val clash = df.columns.filter(Seq("__brk", "session_id").contains)
    require(clash.isEmpty,
      s"sessionize: reserved column names in input: ${clash.toSeq}")
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol)
    val prev = lag(col(tsCol), 1).over(byKey)
    val brk = when(
      col(tsCol).cast("double") - prev.cast("double") > gap || prev.isNull,
      1L).otherwise(0L)
    df.withColumn("__brk", brk)
      .withColumn("session_id",
        sum(col("__brk")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session summary: bounds + row count per (key, session). */
  def sessionSummary(df: DataFrame, keyCol: String, tsCol: String,
                     gap: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Skew-safe two-phase aggregation: spread each hot key over `salt`
    * sub-keys, partially aggregate, then aggregate the partials. For
    * algebraic aggregates (sum/count/min/max) the result is exactly the
    * plain groupBy's — the salt only caps any single reducer's share of a
    * hot key at roughly 1/salt of its rows.
    *
    * Spark's map-side partial aggregation already handles moderate skew;
    * the salted form is for the pathological case where even the PARTIAL
    * rows of one key (one per map task) overwhelm a reducer, or where an
    * ObjectHashAggregate (no partial merge) sits in the middle. The salt
    * is `spark_partition_id() % salt` — rows of a hot key spread across
    * sub-keys exactly as evenly as they are spread across input
    * partitions, INDEPENDENT of the data (a value-derived hash collapses
    * to one sub-key whenever a hot key carries a constant/low-cardinality
    * measure — the common case — silently reintroducing the skew), and
    * deterministic under task retry for deterministic input partitioning
    * (file scans). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salt: Int = 16): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val partial = df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salt)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"))
  }
}
