package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "First rows in key order until a cumulative WEIGHT budget" without the
  * global sort + full-set window funnel — [[OrderedCap]]'s block-bucket
  * architecture generalized from row counts to weights.
  *
  * The naive form (`sum(weight) over (order by key)` then filter) moves
  * every row through ONE partition — the same scale cliff OrderedCap
  * exists to avoid, now for weighted budgets (token budgets, byte
  * budgets). Instead:
  *
  *   1. bucket rows by coarse key block;
  *   2. aggregate per-block WEIGHT SUMS (map-side combine) and take the
  *      running total over the metadata-sized block table — the only
  *      single-partition step ranks #blocks rows;
  *   3. blocks that fit entirely under the budget pass through where
  *      they sit; ONLY the boundary block (≤ blockSize rows) is ranked
  *      row-by-row to fill the remainder.
  *
  * A row is kept iff the cumulative weight BEFORE it (in `key` order) is
  * < `budget` — the greedy "fill until the budget is reached" rule, so
  * the budget may be overshot by at most the final row's weight, and a
  * zero-or-negative budget keeps nothing. Weights must be non-negative;
  * `key` must be unique for a deterministic fill order (encode composite
  * orders into one numeric key).
  */
object WeightedCap {

  def byKey(df: DataFrame, key: String, weightCol: String, budget: Long,
            blockSize: Long = 1L << 20): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    if (budget <= 0) return df.limit(0)
    val t = df.withColumn("__blk", floor(col(key) / blockSize))
    val sums = t.groupBy("__blk").agg(sum(weightCol).as("__w"))
    // running block-weight totals over the metadata-sized block table
    // (deliberately single-partition: #blocks rows, not data rows)
    val cum = sums.withColumn("__cum",
      sum("__w").over(Window.partitionBy(lit(0)).orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // first block whose running total reaches the budget (NULL = keep
    // everything) and the weight consumed before it
    val info = cum.agg(
        min(when(col("__cum") >= budget, col("__blk"))).as("__cutBlk"))
      .crossJoin(cum.select(col("__blk").as("__b"), col("__cum").as("__c")))
      .groupBy("__cutBlk")
      .agg(coalesce(max(when(col("__b") < col("__cutBlk"), col("__c"))), lit(0L))
        .as("__prevCum"))
    val withInfo = t.crossJoin(broadcast(info))
    val before = withInfo
      .filter(col("__cutBlk").isNull || col("__blk") < col("__cutBlk"))
    // rank ONLY the boundary block; keep rows whose pre-row cumulative
    // (block prefix + within-block prefix) is still under the budget
    val boundary = withInfo
      .filter(col("__blk") === col("__cutBlk"))
      .withColumn("__wcum",
        sum(weightCol).over(Window.partitionBy("__blk").orderBy(key)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__prevCum") + col("__wcum") - col(weightCol) < budget)
      .drop("__wcum")
    before.unionByName(boundary).drop("__blk", "__cutBlk", "__prevCum")
  }
}
