package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the storage-side
  * lever that makes 100 TB scans cheap. Parquet keeps per-file and
  * per-row-group min/max statistics; a reader prunes any file whose
  * [min, max] misses the predicate. Sorting by ONE column gives perfect
  * pruning on that column and none on any other; interleaving the bits
  * of TWO columns into a Z-value (Morton order) and sorting by that
  * bounds EVERY file's extent in BOTH dimensions — a file covering a
  * Z-range of length L spans only ~√L of each axis — so point and range
  * predicates on either column prune files. This is the technique
  * Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; here it is a plain
  * column expression plus `repartitionByRange` + `sortWithinPartitions`,
  * nothing engine-specific.
  */
object Layout {

  /** The Z-value (Morton code) of two NON-NEGATIVE ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1, for the low `bits`
    * bits of each (values must fit — reduce them first, e.g.
    * `pmod(col, lit(1 << bits))`). Disjoint bit positions mean the
    * interleave is a plain SUM of shifted bits — pure integer algebra
    * any engine reproduces exactly, inside whole-stage codegen. */
  def zValue(a: Column, b: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i).cast("long") +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1).cast("long")
    }.reduce(_ + _)
  }

  /** Write `df` Z-ordered on (`aCol`, `bCol`) into `numFiles` parquet
    * files at `path`: range-partition by the Z-value (contiguous
    * Z-spans per file) and sort within each partition, so every file's
    * parquet min/max footer bounds BOTH columns tightly. The Z column
    * itself is not written — it exists only to arrange rows. */
  def zOrderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
                  bits: Int = 10, numFiles: Int = 16): Unit = {
    require(!df.columns.contains("__z"), "zOrderWrite: __z is reserved")
    df.withColumn("__z",
        zValue(pmod(col(aCol), lit(1 << bits)),
          pmod(col(bCol), lit(1 << bits)), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Persist `df` BUCKETED by `keyCol` into `buckets` buckets as a
    * managed table — the storage layout that makes repeated equi-joins
    * and aggregations on the key SHUFFLE-FREE: two tables bucketed the
    * same way join bucket-to-bucket with no Exchange on either side
    * (LayoutSpec pins the executed plan), which at 100 TB is the
    * difference between re-shuffling the corpus per query and never
    * shuffling it again. Pre-sorting within buckets additionally hands
    * sort-merge joins their order for free. This is `bucketBy`, not
    * `partitionBy`: buckets hash-split WITHIN files (high-cardinality
    * keys stay at a fixed file count), partitions are directories (for
    * low-cardinality pruning — the [[graft.operators.Ivf]] cell
    * layout). */
  def bucketWrite(df: DataFrame, table: String, keyCol: String,
                  buckets: Int = 16): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)
  }
}
