package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Pipeline, Relational, TierA, TierB}
import graft.sources.FluvioDuck

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator ID from SURVEY.md
  * §2 (Tier A = the reference's own operators, Tier B = its documented
  * host-SQL delegation shapes) plus the relational and training-data-
  * pipeline suites. `oracleSql` carries the DuckDB-equivalent SQL for every
  * oracle-checkable entry; hash-based/approximate/streaming operators are
  * deliberately absent from `oracleSql` (rows-only check) and covered by
  * ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the fixture analog of the reference's
    * README flagship `SELECT route, avg(speed) FROM transit GROUP BY route`
    * (/root/reference/README.md:171-184): consume the events topic, group
    * by the payload key, aggregate. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    // payload key projected via the native one-parse JsonToMap (from_json
    // is CodegenFallback — see graft.functions.JsonPayload)
    FluvioDuck.consume(spark, "events -B --rows 100000000",
        "/root/testdata/sf0.001")
      .withColumn("k",
        element_at(graft.sources.ColumnMapping.parsed(col("value")), "k"))
      .createOrReplaceTempView("transit")
    spark.sql(
      """SELECT k, count(*) AS n,
        |       round(avg(CAST(offset AS DOUBLE)), 6) AS avg_offset
        |FROM transit GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TierA.queries ++ TierB.queries ++ Relational.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TierA.oracleSql ++ TierB.oracleSql ++ Relational.oracleSql ++ Pipeline.oracleSql

  /** Proof map for the entries DELIBERATELY absent from [[oracleSql]]
    * (the driver records them `no_oracle`, which reads as "unchecked" in
    * a gate scan — this map is the machine-readable refutation): each
    * no-oracle id → the hash-checked companion entries that prove its
    * machinery against DuckDB ground truth. Every companion listed here
    * IS in [[oracleSql]]; `Verify` emits this as oracle_proofs.json
    * beside oracle_sql.json, and OracleContractSpec pins the invariants
    * (every no-oracle entry has a proof row; every proof is
    * oracle-checked; no entry is in both maps). */
  // EMPTY since round 12: the last three no-oracle entries
  // (dedup_minhash_lsh / dedup_simhash / dedup_winnow — raw
  // xxhash64/Rabin-Karp signature pipelines) gained REAL DuckDB oracles
  // when graft.queries.XxhSql expressed Spark's XXH64 byte kernel and
  // seed-chained hashLong fold in portable SQL (HUGEINT wraparound
  // arithmetic + recursive CTEs). Every SparkEntry.queries entry is now
  // hash-checked against the DuckDB gate; the map stays as the contract
  // hook (OracleContractSpec pins oracled XOR proofed, no orphans).
  def oracleProofs: Map[String, Seq[String]] = Map.empty
}
