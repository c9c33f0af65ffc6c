package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FluvioDuck

/** SURVEY.md §2 Tier B — the relational shapes the reference's docs run on
  * top of its scans by delegating to DuckDB SQL; here they run on Spark SQL
  * over the same consume() views.
  */
object TierB {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SELECT <cols> FROM fluvio_consume(...) — README.md:100-111
    "sql_projection" -> ((s, dir) =>
      FluvioDuck.consume(s, "events -B --rows 400", dir)
        .select(col("offset"), col("value"))),

    // SELECT sum(leo) FROM fluvio_partitions() — README.md:76-83
    "sql_agg_sum" -> ((s, dir) =>
      FluvioDuck.partitions(s, dir).agg(sum("LEO").as("total_leo"))),

    // flagship: select route, avg(speed) ... group by route — README.md:171-184
    // (events analog: event_type / value through a consume view)
    // from_json-to-map: ONE payload parse per row (get_json_object would
    // re-parse per reference — Spark 4 builds a fresh Jackson reader per
    // call, measured ~1000× slower on a coalesced partition)
    "sql_agg_avg_groupby" -> ((s, dir) => {
      FluvioDuck.consume(s, "events -B --rows 100000000", dir)
        .withColumn("k",
          element_at(graft.sources.ColumnMapping.parsed(col("value")), "k"))
        .createOrReplaceTempView("transit")
      s.sql("""SELECT k,
              |       round(avg(CAST(offset AS DOUBLE)), 6) AS avg_offset,
              |       count(*) AS n
              |FROM transit GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // CREATE VIEW over a consume + SQL on the view — README.md:152-155
    "sql_create_view" -> ((s, dir) => {
      FluvioDuck.consume(s, "events -B --rows 100000000 -c k:i=k", dir)
        .createOrReplaceTempView("transit_k")
      s.sql("SELECT k, count(*) AS n FROM transit_k GROUP BY k ORDER BY k")
    }),

    // COPY (...) TO 'x.parquet' — README.md:186-205: write the consume
    // result as parquet (the sink), read it back, return the round trip.
    "sql_copy_parquet" -> ((s, dir) => {
      val out = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_copy_parquet").getAbsolutePath
      FluvioDuck.consume(s, "events -B --rows 200", dir)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("offset")
    }),

    // WHERE over the materialized view — README.md:169-172
    "sql_filter" -> ((s, dir) =>
      FluvioDuck.consume(s, "events -B --rows 100000000", dir)
        .filter(graft.sources.ColumnMapping.parsed(col("value"))
          .getItem("k").cast("int") > 90)
        .orderBy("offset")),

    // --tail + ordered display of last offsets — README.md:100-111
    "sql_limit_topk" -> ((s, dir) =>
      FluvioDuck.consume(s, "events -T 5", dir).orderBy(desc("offset"))),

    // ---- the reference's actual SQL surface: registered table functions
    // (/root/reference/src/lib.rs:37-39; README.md:76-111). GraftSql
    // registers fluvio_consume/fluvio_topics/fluvio_partitions into the
    // session registry; the query text is the reference's own shape.
    "sql_tvf_consume" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      s.conf.set(graft.sql.GraftSql.DataDirKey, dir)
      s.sql("SELECT * FROM fluvio_consume('events -B --rows 200')")
    }),
    "sql_tvf_topics" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      s.sql(s"SELECT * FROM fluvio_topics('$dir') ORDER BY name")
    }),
    "sql_tvf_partitions" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      s.sql(s"SELECT * FROM fluvio_partitions('$dir') ORDER BY topic")
    }),

    // ---- the table OPERATORS as TVFs (graft_asof_join / graft_range_join
    // / graft_sessionize): same inputs and oracles as the Scala-API
    // entries join_asof / join_range / sessionize — the TVF must
    // hash-match the operator it wraps. Table inputs ride in as temp-view
    // names (registry TVFs take constant args only).
    "sql_tvf_asof" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      val ev = graft.sources.Tables.load(s, dir, "events")
      ev.select(col("event_id"), (col("event_id") % 4).as("k"),
          col("event_id").as("t"))
        .createOrReplaceTempView("graft_asof_l")
      ev.filter(col("event_id") % 7 === 0)
        .select((col("event_id") % 4).as("k"), col("event_id").as("mark_id"))
        .withColumn("mt", col("mark_id"))
        .createOrReplaceTempView("graft_asof_r")
      s.sql("""SELECT event_id, k, mark_id
              |FROM graft_asof_join('graft_asof_l', 'graft_asof_r', 'k', 't', 'mt')
              |ORDER BY event_id""".stripMargin)
    }),
    "sql_tvf_range" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      graft.sources.Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .createOrReplaceTempView("graft_range_l")
      graft.sources.Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("band_id"),
          (col("n_nationkey").cast("double") * 2).as("lo"),
          (col("n_nationkey").cast("double") * 2 + 3).as("hi"))
        .createOrReplaceTempView("graft_range_r")
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity, band_id
              |FROM graft_range_join('graft_range_l', 'l_quantity',
              |                      'graft_range_r', 'lo', 'hi', 4.0)
              |ORDER BY l_orderkey, l_linenumber, l_quantity, band_id""".stripMargin)
    }),
    "sql_tvf_sessionize" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      graft.sources.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"))
        .createOrReplaceTempView("graft_sess_ev")
      s.sql("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              |       CAST(COUNT(*) AS BIGINT) AS n_events,
              |       MIN(event_id) AS session_start, MAX(event_id) AS session_end
              |FROM graft_sessionize('graft_sess_ev', 'user_id', 'event_id', 100)
              |GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin)
    }),
    // the round-9 pipeline TVFs: BM25 / TF-IDF / exact-dedup drops
    // callable from pure SQL, hash-matching the operator entries they wrap
    "sql_tvf_bm25" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      graft.sources.Tables.load(s, dir, "documents")
        .createOrReplaceTempView("graft_docs_v")
      s.sql("""SELECT doc_id, score_micro, rk
              |FROM graft_bm25('graft_docs_v', 'doc_id', 'text', 'spark hash window', 20)
              |ORDER BY rk""".stripMargin)
    }),
    "sql_tvf_tfidf" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      graft.sources.Tables.load(s, dir, "documents")
        .createOrReplaceTempView("graft_docs_v")
      s.sql("""SELECT doc_id, term, score_micro, rk
              |FROM graft_tfidf('graft_docs_v', 'doc_id', 'text', 3)
              |ORDER BY doc_id, rk""".stripMargin)
    }),
    "sql_tvf_pagerank" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      Pipeline.purchaseEdges(s, dir).createOrReplaceTempView("graft_edges_v")
      s.sql("""SELECT node_id, rank_micro
              |FROM graft_pagerank('graft_edges_v', 2)
              |ORDER BY rank_micro DESC, node_id""".stripMargin)
    }),
    "sql_tvf_dedup_drops" -> ((s, dir) => {
      graft.sql.GraftSql.register(s)
      val d = graft.sources.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      d.unionByName(d.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 1000000L))
        .createOrReplaceTempView("graft_docs_cloned_v")
      s.sql("""SELECT drop_id, keep_id
              |FROM graft_dedup_drops('graft_docs_cloned_v', 'doc_id', 'text')
              |ORDER BY drop_id""".stripMargin)
    })
  )

  private def recCols =
    "CAST(event_id AS BIGINT) AS \"offset\", CAST(ts AS TIMESTAMP) AS \"timestamp\", props AS \"value\""

  private val fixtureTopics = Seq("customer", "documents", "embeddings",
    "events", "lineitem", "nation", "orders", "part", "region", "supplier")

  val oracleSql: Map[String, String] = Map(
    "sql_projection" ->
      "SELECT CAST(event_id AS BIGINT) AS \"offset\", props AS \"value\" FROM events ORDER BY event_id LIMIT 400",
    "sql_agg_sum" -> ("SELECT CAST(" +
      Seq("customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier")
        .map(t => s"(SELECT COUNT(*) FROM $t)").mkString(" + ") +
      " AS BIGINT) AS total_leo"),
    "sql_agg_avg_groupby" ->
      ("SELECT json_extract_string(props, '$.k') AS k, " +
        "round(avg(CAST(event_id AS DOUBLE)), 6) AS avg_offset, " +
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY 1"),
    "sql_create_view" ->
      ("SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY k ORDER BY k"),
    "sql_copy_parquet" ->
      s"SELECT $recCols FROM events ORDER BY event_id LIMIT 200",
    "sql_filter" ->
      s"SELECT $recCols FROM events WHERE CAST(json_extract_string(props, '$$.k') AS INTEGER) > 90 ORDER BY event_id",
    "sql_limit_topk" ->
      (s"SELECT $recCols FROM events " +
        "WHERE event_id >= (SELECT MAX(event_id) + 1 - 5 FROM events) ORDER BY event_id DESC"),
    "sql_tvf_consume" ->
      s"SELECT $recCols FROM events ORDER BY event_id LIMIT 200",
    "sql_tvf_topics" -> fixtureTopics
      .map(t => s"SELECT '$t' AS name, 1 AS partitions")
      .mkString("", " UNION ALL ", " ORDER BY name"),
    "sql_tvf_partitions" -> fixtureTopics
      .map(t => s"SELECT '$t' AS topic, '0' AS partition, CAST((SELECT COUNT(*) FROM $t) AS BIGINT) AS \"LEO\"")
      .mkString("", " UNION ALL ", " ORDER BY topic"),
    // the TVFs wrap the same operators with the same inputs — the oracle
    // is literally the operator entries' oracle
    "sql_tvf_asof" -> Relational.oracleSql("join_asof"),
    "sql_tvf_range" -> Relational.oracleSql("join_range"),
    "sql_tvf_sessionize" -> Relational.oracleSql("sessionize"),
    "sql_tvf_bm25" -> Pipeline.oracleSql("text_bm25_rank"),
    "sql_tvf_tfidf" -> Pipeline.oracleSql("text_tfidf_topterms"),
    "sql_tvf_dedup_drops" -> Pipeline.oracleSql("dedup_drops"),
    "sql_tvf_pagerank" -> Pipeline.oracleSql("graph_pagerank")
  )
}
