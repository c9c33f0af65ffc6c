package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WeightedCap must keep EXACTLY the rows the naive global cumulative-sum
  * window keeps (pre-row cumulative weight < budget in key order), for
  * every budget position relative to block boundaries.
  */
class WeightedCapSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, key: String,
                    w: String, budget: Long): Set[Long] =
    df.withColumn("__cum", sum(w).over(
        Window.partitionBy(lit(0)).orderBy(key)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") - col(w) < budget)
      .select(key).as[Long].collect().toSet

  private def capped(df: org.apache.spark.sql.DataFrame, key: String,
                     w: String, budget: Long, blockSize: Long): Set[Long] =
    WeightedCap.byKey(df, key, w, budget, blockSize)
      .select(key).as[Long].collect().toSet

  test("matches the naive window for budgets at every block-boundary relation") {
    val rnd = new scala.util.Random(11L)
    // sparse keys so blocks are uneven; weights 0..9 including zeros
    val rows = (1L to 500L).map(i => (i * 7 + rnd.nextInt(5), rnd.nextInt(10).toLong))
      .distinctBy(_._1).toDF("k", "w").repartition(7)
    val total = rows.agg(sum("w")).head().getLong(0)
    for (budget <- Seq(1L, 5L, 37L, total / 2, total - 1, total, total + 100)) {
      assert(capped(rows, "k", "w", budget, blockSize = 64) ===
        naive(rows, "k", "w", budget), s"budget=$budget")
    }
  }

  test("budget <= 0 keeps nothing; huge budget keeps everything") {
    val rows = Seq((1L, 5L), (2L, 5L)).toDF("k", "w")
    assert(capped(rows, "k", "w", 0L, 16) === Set.empty[Long])
    assert(capped(rows, "k", "w", Long.MaxValue / 4, 16) === Set(1L, 2L))
  }

  test("overshoot is bounded by the final kept row (greedy fill rule)") {
    // weights 4,4,4 budget 10: keep rows 1 (cum_before 0), 2 (4), 3 (8 < 10)
    val rows = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)).toDF("k", "w")
    assert(capped(rows, "k", "w", 10L, 2) === Set(1L, 2L, 3L))
    // exact-hit budget 8: row 3's cum_before = 8, NOT < 8 -> excluded
    assert(capped(rows, "k", "w", 8L, 2) === Set(1L, 2L))
  }

  test("zero-weight rows inside the budget region are kept") {
    val rows = Seq((1L, 0L), (2L, 3L), (3L, 0L), (4L, 2L)).toDF("k", "w")
    // budget 3: cum_before = 0,0,3,3 -> rows 1,2 kept; 3,4 excluded? No:
    // cum_before(3) = 3, not < 3 -> excluded; cum_before(4) = 3 -> excluded
    assert(capped(rows, "k", "w", 3L, 2) === Set(1L, 2L))
    // budget 4 keeps the zero-weight row 3 and row 4 (cum_before 3 < 4)
    assert(capped(rows, "k", "w", 4L, 2) === Set(1L, 2L, 3L, 4L))
  }
}
