package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — the two classic "Spark lacks the operator"
  * joins (both named in the project brief as custom-operator candidates;
  * both native in the reference's host engine: DuckDB `ASOF JOIN` and
  * inequality joins, which is why each entry here is fully
  * DuckDB-oracle-checked).
  *
  * Both are composed from existing relational operators in the shape a
  * 100 TB run needs — a naive translation of either is a
  * BroadcastNestedLoopJoin (all-pairs per key / full cartesian):
  *
  *   - [[asofJoin]]: union-tag + one per-key ordered window. ONE shuffle
  *     on the key, no row multiplication — never the |L|×|R| per-key
  *     product of "theta-join then argmax".
  *   - [[rangeJoin]]: bin the ranges, hash-equi-join on the bin, post-
  *     filter. Cartesian only within a bin.
  */
object Temporal {

  /** As-of join: for each left row, the single right row with the largest
    * `rightTs` ≤ the row's `leftTs`, per key — DuckDB `ASOF JOIN`
    * semantics, including the tie rule (a right row AT the left timestamp
    * matches) and `joinType`: "inner" (default, like DuckDB) drops left
    * rows with no prior right row; "left" keeps them null-filled.
    *
    * Plan shape: tag both inputs, align schemas, union, then ONE window —
    * `last(right_payload, ignoreNulls)` over (key, ORDER BY ts with right
    * rows sorting before left rows at equal ts) — and keep the left rows.
    * One shuffle on the key, one per-partition sort, zero row
    * multiplication; skew = a hot KEY's window — if one key dominates,
    * use [[asofJoinBucketed]], which bounds every partition by time
    * bucket instead.
    *
    * Left and right non-key column names must be disjoint (checked) —
    * right's timestamp column rides along in the output like DuckDB's.
    *
    * `tolerance`: maximum lookback, inclusive — a matched right row older
    * than `leftTs - tolerance` is treated as NO match (dropped under
    * inner, null-filled under left), the pandas `merge_asof` tolerance
    * semantics a feature-store join needs (a price/feature older than the
    * window is stale, not a match). Units: the timestamp columns' natural
    * units for numeric columns; SECONDS for TimestampType columns (the
    * staleness test compares epoch values via a double cast, which Spark
    * defines as epoch seconds). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               joinType: String = "inner",
               tolerance: Option[Long] = None): DataFrame = {
    val a = alignAsof(left, right, keyCols, leftTs, rightTs, joinType, Nil)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col("__t").asc, col("__side").asc) ++ a.tieCol.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = a.tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    finishAsof(matched0, a, rightTs, joinType, tolerance)
  }

  /** Skew-safe [[asofJoin]]: identical semantics, but no per-KEY window —
    * a hot key is one window partition in the one-pass form, so a key
    * holding 10% of a 100 TB input funnels through one task. Here the
    * heavy window partitions by (key, floor(ts / bucketWidth)), so a hot
    * key's rows spread across its time buckets, and the only per-key pass
    * runs over ONE ROW PER BUCKET (the carry of each bucket's last right
    * row) — bounded by time span / bucketWidth, never by row count.
    *
    *   1. in-bucket as-of: the [[asofJoin]] window, partitioned by
    *      (key, bucket);
    *   2. per (key, bucket), the bucket's LAST right row (row_number=1 on
    *      the reversed order — same tie rule);
    *   3. carry-in: for every (key, bucket) on either side, the last
    *      right row of the nearest earlier non-empty bucket — a per-key
    *      window over the tiny bucket table;
    *   4. match = in-bucket result, else the bucket's carry-in.
    *
    * Pick `bucketWidth` so one bucket of the hottest key fits a task
    * comfortably (e.g. hot key at ~1M rows/hour → bucketWidth of minutes).
    * TemporalSpec pins output equality with [[asofJoin]] on a
    * one-key-dominant fixture across inner/left/tolerance. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String,
                       bucketWidth: Double,
                       joinType: String = "inner",
                       tolerance: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val a = alignAsof(left, right, keyCols, leftTs, rightTs, joinType,
      Seq("__b", "__rn", "__blast", "__carry"))
    // numeric ts buckets in natural units; TimestampType in epoch seconds
    // (same double-cast convention as tolerance)
    val tagged = a.tagged.withColumn("__b",
      floor(col("__t").cast("double") / bucketWidth).cast("long"))
    val keyB = keyCols.map(col) :+ col("__b")
    val wInBucket = Window.partitionBy(keyB: _*)
      .orderBy((Seq(col("__t").asc, col("__side").asc) ++ a.tieCol.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(wInBucket))
      .filter(col("__side") === 1)
    // each bucket's last right row: first row of the REVERSED in-bucket
    // order (desc ties resolve to the same winner the asc last() picks)
    val wLast = Window.partitionBy(keyB: _*)
      .orderBy((Seq(col("__t").desc) ++ a.tieCol.map(_.desc)): _*)
    val bucketLast = tagged.filter(col("__side") === 0)
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(keyB :+ col("__r").as("__blast"): _*)
    // carry-in over one-row-per-(key,bucket): strictly earlier buckets
    // only — an in-bucket right row must NOT leak to earlier left rows
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = tagged.select(keyB: _*).distinct()
      .join(bucketLast, keyCols :+ "__b", "left")
      .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(wCarry))
      .select(keyCols.map(col) :+ col("__b") :+ col("__carry"): _*)
    val matched0 = inBucket.join(carry, keyCols :+ "__b", "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
    finishAsof(matched0, a, rightTs, joinType, tolerance)
  }

  /** Validated, union-tagged asof inputs shared by [[asofJoin]] and
    * [[asofJoinBucketed]]. */
  private case class AsofAligned(tagged: DataFrame, tieCol: Option[Column],
                                 leftCols: Seq[String], rightCols: Seq[String],
                                 keyCols: Seq[String])

  private def alignAsof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                        leftTs: String, rightTs: String, joinType: String,
                        extraReserved: Seq[String]): AsofAligned = {
    require(Seq("inner", "left").contains(joinType),
      s"asofJoin supports inner|left, got $joinType")
    // a key-less as-of would plan ONE global window partition (all rows
    // through a single task) — at any real scale that is a silent
    // bottleneck, so it must be an explicit modeling decision: add a
    // constant key column if a global as-of is genuinely wanted
    require(keyCols.nonEmpty,
      "asofJoin requires at least one key column (a key-less as-of is a " +
        "single global window partition; add a constant key to opt in)")
    val leftCols = left.columns.filterNot(keyCols.contains).toSeq
    val rightCols = right.columns.filterNot(keyCols.contains).toSeq
    val overlap = leftCols.intersect(rightCols)
    require(overlap.isEmpty,
      s"asofJoin: non-key columns must be disjoint, overlap: $overlap")
    val reserved = Seq("__t", "__side", "__l", "__r", "__m") ++ extraReserved
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty, s"asofJoin: reserved column names in input: ${clash.toSeq}")

    val lStruct = left.select(leftCols.map(col): _*).schema
    val rStruct = right.select(rightCols.map(col): _*).schema
    val lAligned = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStruct).as("__r")): _*)
    // DuckDB ASOF JOIN (equi-key) never matches NULL keys, but
    // Window.partitionBy groups NULLs into ONE partition — a null-key left
    // row would silently match a null-key right row. Dropping null-key
    // RIGHT rows restores the semantics exactly: a null-key left row's
    // partition then holds no right rows, so it gets no match (dropped
    // under inner, null-filled under left — DuckDB's behavior for both).
    val rNonNullKeys = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val rAligned = right.filter(rNonNullKeys).select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__t"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)

    // right rows (__side=0) sort before left rows at the same timestamp,
    // so `t_left >= t_right` ties match — DuckDB's ASOF rule. Among right
    // DUPLICATES at the same (key, ts), last() would otherwise pick by
    // physical partition order (nondeterministic across runs); a payload-
    // hash tiebreaker pins one winner whenever the payload is hashable
    // (maps are not — those keep the arbitrary-pick semantics, which is
    // also DuckDB's behavior for ties).
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType  => hasMap(a.elementType)
      case _             => false
    }
    val hashable = rStruct.forall(f => !hasMap(f.dataType))
    val tieCol = if (hashable) Some(xxhash64(col("__r"))) else None
    AsofAligned(lAligned.unionByName(rAligned), tieCol, leftCols, rightCols, keyCols)
  }

  /** Tolerance + join-type + output projection shared by both asof forms. */
  private def finishAsof(matched0: DataFrame, a: AsofAligned, rightTs: String,
                         joinType: String, tolerance: Option[Long]): DataFrame = {
    // tolerance: a match staler than leftTs - tolerance is no match. The
    // double cast makes the same predicate work for numeric AND
    // TimestampType columns (timestamp → epoch seconds; Subtract on a raw
    // TimestampType vs a Long literal has no coercion and fails analysis).
    val matched = tolerance.fold(matched0)(tol =>
      matched0.withColumn("__m",
        when(col(s"__m.$rightTs").cast("double") >=
          col("__t").cast("double") - tol, col("__m"))))
    val kept = if (joinType == "inner") matched.filter(col("__m").isNotNull)
               else matched
    kept.select(
      a.keyCols.map(col) ++
        a.leftCols.map(c => col(s"__l.$c").as(c)) ++
        a.rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Range join: (left, right) pairs where `pointCol` ∈ [loCol, hiCol]
    * (both inclusive), optionally also matching on `keyCols`. Each right
    * range explodes into the ≤ span/binWidth + 1 bins it covers, each
    * left point computes its ONE bin, and the join is a hash equi-join on
    * (bin, keys) with the exact between-filter after — cartesian only
    * within a bin. `binWidth` trades range fan-out (small bins → more bin
    * rows per range) against candidate waste (large bins → more
    * post-filtered pairs); set it near the typical range span.
    *
    * `saltBuckets` is the hot-bin guard: binning is skew-safe in FAN-OUT
    * (a range covers bounded bins), but a pathological POINT distribution
    * — millions of points in one bin — still piles one (bin, key) hash
    * bucket onto one task. With `saltBuckets = S > 1`, each point salts
    * deterministically into one of S sub-buckets (xxhash64 of its point
    * value) and each range-bin row replicates ×S, so the hot bin's
    * candidate work spreads over S tasks at the cost of S× the (small)
    * binned-range shuffle — the same replicate-the-small-side recipe as
    * the salted skew aggregation (agg_salted_skew). Output is provably
    * identical: every point still meets every range of its bin exactly
    * once (its one salt meets the matching replica). Default 1 = no
    * salting, plan unchanged. */
  def rangeJoin(left: DataFrame, pointCol: String,
                right: DataFrame, loCol: String, hiCol: String,
                binWidth: Double, keyCols: Seq[String] = Nil,
                maxBinsPerRange: Long = 10000L,
                saltBuckets: Int = 1): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // same contract as asofJoin: non-key columns must be disjoint, or the
    // equi-join output has ambiguous duplicates that fail (or silently
    // mis-bind) on the first select-by-name
    val overlap = left.columns.filterNot(keyCols.contains)
      .intersect(right.columns.filterNot(keyCols.contains))
    require(overlap.isEmpty,
      s"rangeJoin: non-key columns must be disjoint, overlap: ${overlap.toSeq}")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "rangeJoin: `__bin` is reserved")
    require(saltBuckets == 1 ||
      (!left.columns.contains("__salt") && !right.columns.contains("__salt")),
      "rangeJoin: `__salt` is reserved when saltBuckets > 1")
    // fan-out guard: ONE degenerate range (huge span ÷ small binWidth)
    // would explode into billions of bin rows and take the stage down
    // with an opaque array-size error at best. Checked per row on the
    // executor — no extra action — and raised loudly with the knob to
    // turn: widen binWidth or raise maxBinsPerRange deliberately.
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    // the guard lives INSIDE the bin expression (a dropped side-column
    // would be optimized away and never evaluate). Two degenerate shapes:
    //   - huge forward span: would explode into >= maxBinsPerRange bin
    //     rows — fail loudly with the knob to turn;
    //   - INVERTED range (hi < lo): `sequence` auto-steps -1 and would
    //     still generate |span| descending bin rows (all post-filtered
    //     away, but the fan-out happens first) — an inverted range matches
    //     nothing under BETWEEN, so it gets ZERO bins, not |span|.
    val bins = when(hiBin < loBin, array().cast("array<long>"))
      .when(hiBin - loBin >= maxBinsPerRange,
        raise_error(concat(
          lit(s"rangeJoin: a range spans >= $maxBinsPerRange bins at binWidth=$binWidth (["),
          col(loCol), lit(", "), col(hiCol),
          lit("]); widen binWidth or raise maxBinsPerRange"))).cast("array<long>"))
      .otherwise(sequence(loBin, hiBin))
    val binned0 = right.withColumn("__bin", explode(bins))
    val points0 = left.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val (points, binned, joinCols) =
      if (saltBuckets == 1) (points0, binned0, Seq("__bin") ++ keyCols)
      else (
        points0.withColumn("__salt",
          pmod(xxhash64(col(pointCol)), lit(saltBuckets.toLong)).cast("int")),
        binned0.withColumn("__salt",
          explode(sequence(lit(0), lit(saltBuckets - 1)))),
        Seq("__bin", "__salt") ++ keyCols)
    points.join(binned, joinCols)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin", "__salt")
  }
}
