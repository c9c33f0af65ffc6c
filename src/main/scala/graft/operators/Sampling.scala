package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Random `df.sample()` draws differ per run, per partitioning, and per
  * engine — useless when a sample must be reproducible across reruns or
  * cross-checked between systems. Consistent HASH sampling fixes that:
  * membership depends only on the row's id (first hex digit of md5), so
  * the same rows are selected on every run, every engine, and any
  * partitioning; it composes with incremental loads (new rows sample
  * independently); and it is a pure per-row codegen'd filter — no RNG
  * state, no shuffle, pushdown-friendly.
  */
object Sampling {

  /** Keep rows whose md5(id) first hex digit falls below `sixteenths`
    * (rate = sixteenths/16). Deterministic and engine-portable (md5 of
    * the decimal id string). */
  def hashSample(df: DataFrame, idCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16,
      s"sixteenths must be in [1,16], got $sixteenths")
    df.filter(hashBucket(col(idCol)) < sixteenths)
  }

  /** The 0-15 bucket of a row id: first md5 hex digit as an int. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Per-stratum consistent sampling: rate sixteenths(stratum)/16 for
    * each value of `strataCol` (absent strata keep nothing) — the
    * training-mix primitive ("keep 100% of lang=en, 25% of the rest"
    * style re-weighting), still fully deterministic.
    *
    * The rate lookup is a BROADCAST JOIN against the tiny rate table,
    * not an inlined CASE: predicate pushdown substitutes the strata
    * expression into every CASE branch, and codegen subexpression
    * elimination skips conditional branches — with an expensive strata
    * column (e.g. langId's regex bank) the CASE form re-evaluated it
    * per branch per row (measured 5×). The join evaluates the strata
    * expression exactly once per row; the inner join drops absent
    * strata, preserving the keep-nothing contract. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           sixteenths: Map[String, Int]): DataFrame = {
    require(sixteenths.values.forall(s => s >= 0 && s <= 16),
      "stratum rates must be in [0,16] sixteenths")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = sixteenths.toSeq.toDF("__stratum", "__rate")
    df.join(broadcast(rates), col(strataCol) === col("__stratum"))
      .filter(hashBucket(col(idCol)) < col("__rate"))
      .drop("__stratum", "__rate")
  }

  /** TOKEN-quota mixture sampling — the data-mixing step stated the way
    * mixes actually are ("20k tokens of en, 5k of code"), not as row
    * rates: per stratum, rows are taken in a deterministic md5(id) order
    * until the stratum's token budget is exhausted. A row is kept iff
    * the tokens BEFORE it (exclusive running sum) are under the quota —
    * so the quota may be overshot by at most one document (the standard
    * greedy-fill rule; a pipeline that must not overshoot truncates the
    * boundary doc downstream). Strata without a quota keep nothing.
    *
    * Scale shape: ONE keyed window (partitionBy stratum, orderBy
    * md5(id)) — parallel across strata, never a global sort — plus the
    * broadcast quota join from [[stratifiedHashSample]]. Deterministic
    * and engine-portable: the order key is md5 of the decimal id (ties
    * broken by id), the same expression DuckDB computes. */
  def tokenQuotaSample(df: DataFrame, idCol: String, strataCol: String,
                       tokenCol: String,
                       quotas: Map[String, Long]): DataFrame = {
    require(quotas.values.forall(_ >= 0L), "token quotas must be >= 0")
    val reserved = Seq("__stratum", "__quota", "__before")
    require(reserved.forall(!df.columns.contains(_)),
      s"tokenQuotaSample: ${reserved.mkString("/")} are reserved")
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = quotas.toSeq.toDF("__stratum", "__quota")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(qdf), col(strataCol) === col("__stratum"))
      .withColumn("__before",
        coalesce(sum(col(tokenCol)).over(w).cast("long"), lit(0L)) -
          col(tokenCol))
      .filter(col("__before") < col("__quota"))
      .drop("__stratum", "__quota", "__before")
  }

  /** Per-group DOCUMENT caps — the "at most N pages per domain" rule
    * every crawl-derived corpus applies (a handful of giant hosts would
    * otherwise dominate the training mix; RefinedWeb/C4 cap or
    * down-weight them). Keeps the first `cap` rows of each `strataCol`
    * group in deterministic md5(id) order (ties by id), so WHICH rows
    * survive is reproducible across runs, engines, and partitionings —
    * and stable under incremental re-crawls (a group under its cap
    * admits new rows without evicting old ones unless the new md5 sorts
    * earlier).
    *
    * Scale shape: ONE keyed window (partitionBy group, orderBy md5) —
    * parallel across groups, never a global sort. A group with more
    * rows than one task can sort is exactly the pathological host the
    * cap exists to cut, and the window's per-group sort spills rather
    * than collects; at 100 TB the groups (domains) number in the
    * millions, so tasks stay balanced. */
  def sourceCapSample(df: DataFrame, idCol: String, strataCol: String,
                      cap: Int): DataFrame = {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    require(!df.columns.contains("__rn"),
      "sourceCapSample: __rn is reserved")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
