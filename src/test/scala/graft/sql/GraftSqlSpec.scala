package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL table-valued-function surface: the reference's documented UX
  * (`SELECT * FROM fluvio_consume('...')`) must work on Spark SQL. */
class GraftSqlSpec extends SparkSpec {

  private def registered() = { GraftSql.register(spark); spark }

  test("fluvio_consume TVF matches the Scala API result") {
    val s = registered()
    val viaSql = s.sql(s"SELECT * FROM fluvio_consume('events -B --rows 25', '$sf')")
    val viaApi = graft.sources.FluvioDuck.consume(s, "events -B --rows 25", sf)
    assert(viaSql.columns.toSeq == Seq("offset", "timestamp", "value"))
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("fluvio_consume falls back to spark.graft.dataDir") {
    val s = registered()
    s.conf.set(GraftSql.DataDirKey, sf)
    assert(s.sql("SELECT count(*) AS n FROM fluvio_consume('events -B --rows 10')")
      .head().getLong(0) == 10L)
  }

  test("TVFs compose with SQL (aggregation over consume)") {
    val s = registered()
    val n = s.sql(
      s"""SELECT count(*) AS n FROM fluvio_consume('events -B --rows 100', '$sf')
         |WHERE CAST(get_json_object(value, '$$.k') AS INT) > 50""".stripMargin)
      .head().getLong(0)
    assert(n > 0 && n < 100)
  }

  test("fluvio_topics / fluvio_partitions TVFs") {
    val s = registered()
    val topics = s.sql(s"SELECT * FROM fluvio_topics('$sf')")
    assert(topics.columns.toSeq == Seq("name", "partitions"))
    assert(topics.filter(col("name") === "events").count() == 1)
    val parts = s.sql(s"SELECT * FROM fluvio_partitions('$sf')")
    assert(parts.filter(col("topic") === "events").head().getLong(2) == 1000L)
  }

  test("graft_asof_join TVF matches the Scala operator") {
    val s = registered()
    import s.implicits._
    Seq((1, 5), (1, 10), (2, 7), (1, 2)).toDF("k", "t")
      .createOrReplaceTempView("tvf_asof_l")
    Seq((1, 3, 100), (1, 8, 200), (2, 1, 300)).toDF("k", "rt", "v")
      .createOrReplaceTempView("tvf_asof_r")
    val got = s.sql(
      "SELECT k, t, rt, v FROM graft_asof_join('tvf_asof_l', 'tvf_asof_r', 'k', 't', 'rt')")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set((1, 5, 3, 100), (1, 10, 8, 200), (2, 7, 1, 300)))
    // optional args: joinType + tolerance
    val lj = s.sql("""SELECT count(*) AS n FROM
      graft_asof_join('tvf_asof_l', 'tvf_asof_r', 'k', 't', 'rt', 'left', 2)""")
      .head().getLong(0)
    assert(lj == 4L) // all left rows survive under 'left'
  }

  test("graft_range_join and graft_sessionize TVFs match the Scala operators") {
    val s = registered()
    import s.implicits._
    Seq((1, 2.5), (2, 9.0)).toDF("id", "p").createOrReplaceTempView("tvf_rj_l")
    Seq((10, 0.0, 4.0), (11, 8.0, 12.0)).toDF("rid", "lo", "hi")
      .createOrReplaceTempView("tvf_rj_r")
    val pairs = s.sql(
      "SELECT id, rid FROM graft_range_join('tvf_rj_l', 'p', 'tvf_rj_r', 'lo', 'hi', 4.0)")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((1, 10), (2, 11)))
    Seq((1, 1L), (1, 2L), (1, 50L)).toDF("k", "ts")
      .createOrReplaceTempView("tvf_sess")
    val sess = s.sql(
      "SELECT k, ts, session_id FROM graft_sessionize('tvf_sess', 'k', 'ts', 5)")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sess == Set((1, 1L, 1L), (1, 2L, 1L), (1, 50L, 2L)))
  }

  test("operator TVFs reject wrong arity with the usage string") {
    val s = registered()
    val e = intercept[Exception](
      s.sql("SELECT * FROM graft_asof_join('a', 'b')").collect())
    assert(e.getMessage.contains("graft_asof_join("))
    val e2 = intercept[Exception](
      s.sql("SELECT * FROM graft_sessionize('a', 'k', 'ts', 'oops')").collect())
    assert(e2.getMessage.contains("constant integer"))
  }

  test("consume errors surface through SQL (unknown topic, bad flags)") {
    val s = registered()
    val e1 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume('nosuch -B', '$sf')").collect())
    assert(e1.getMessage.contains("Topic not found"))
    val e2 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume('events -B -T 3', '$sf')").collect())
    assert(e2.getMessage.contains("cannot be used with"))
  }

  test("non-constant argument is rejected with a clear message") {
    val s = registered()
    val e = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume(CAST(rand() AS STRING), '$sf')").collect())
    assert(e.getMessage.contains("constant string"))
  }

  test("missing base dir (no arg, no session conf) raises the bind error") {
    val s = registered()
    s.conf.unset(GraftSql.DataDirKey)
    val e = intercept[Exception](
      s.sql("SELECT * FROM fluvio_consume('events -B')").collect())
    assert(e.getMessage.contains("no base directory"))
    assert(e.getMessage.contains(GraftSql.DataDirKey)) // tells the user the fix
  }

  test("non-string and NULL arguments are rejected") {
    val s = registered()
    val e1 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume(42, '$sf')").collect())
    assert(e1.getMessage.contains("constant string"))
    val e2 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume(CAST(NULL AS STRING), '$sf')").collect())
    assert(e2.getMessage.contains("NULL"))
  }

  test("foldable non-literal string args are accepted (constant folding)") {
    val s = registered()
    val n = s.sql("SELECT count(*) AS n FROM fluvio_consume(" +
      s"concat('events', ' -B --rows 10'), '$sf')").head().getLong(0)
    assert(n == 10L)
  }

  test("wrong arity is rejected with the usage string") {
    val s = registered()
    val e1 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_consume('events -B', '$sf', 'extra')").collect())
    assert(e1.getMessage.contains("fluvio_consume('<topic> <options>'"))
    val e2 = intercept[Exception](
      s.sql(s"SELECT * FROM fluvio_topics('$sf', 'extra')").collect())
    assert(e2.getMessage.contains("fluvio_topics([<baseDir>])"))
  }

  test("scalar kernels are callable from SQL and match the Scala API") {
    val s = registered()
    import s.implicits._
    Seq((1L, "the cat sat on the mat"), (2L, "le chat est dans la maison"))
      .toDF("id", "text").createOrReplaceTempView("t_kernels")
    val viaSql = s.sql(
      """SELECT id, graft_langid(text) AS lang, graft_token_count(text) AS n,
        |graft_fingerprint(text) AS fp, graft_top_gram_frac(text, 2) AS f,
        |graft_simhash(text) AS sh, graft_nfc(text) AS nfc
        |FROM t_kernels ORDER BY id""".stripMargin).collect()
    val viaApi = s.table("t_kernels").select(col("id"),
      graft.operators.TextAnalysis.langId(col("text")).as("lang"),
      graft.operators.TextAnalysis.tokenCount(col("text")).as("n"),
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.operators.TextAnalysis.topGramFrac(col("text"), 2).as("f"),
      graft.functions.SimHashText(col("text")).as("sh"),
      graft.functions.NfcNormalize(col("text")).as("nfc"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // plans as the native expression, not a UDF seat
    val plan = s.sql("SELECT graft_langid(text) FROM t_kernels")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("URL kernels from SQL: canonicalization and PSL domain match the API") {
    val s = registered()
    import s.implicits._
    Seq((1L, "HTTPS://WWW.Site3.COM:443/A/?utm_source=x&id=2#f"),
        (2L, "https://shop.example.co.uk./x?ref=main"))
      .toDF("id", "url").createOrReplaceTempView("t_urls")
    val viaSql = s.sql(
      """SELECT id, graft_canon_url(url) AS c, graft_domain(url) AS d
        |FROM t_urls ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val viaApi = s.table("t_urls").select(col("id"),
      graft.functions.UrlFunctions.canonicalizeUrl(col("url")).as("c"),
      graft.functions.UrlFunctions.urlDomain(col("url")).as("d"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(viaSql.toSeq == viaApi.toSeq)
    // rule 6: the single trailing slash strips from the non-root path
    assert(viaSql(0) == ((1L, "https://site3.com/A?id=2", "site3.com")),
      viaSql(0).toString)
    assert(viaSql(1)._3 == "example.co.uk", viaSql(1).toString)
  }

  test("round-8 kernels from SQL: positional grams and Z-values match the API") {
    val s = registered()
    import s.implicits._
    Seq((1L, "a b c d", 3, 5), (2L, "x y", 1023, 0))
      .toDF("id", "text", "pk", "sk").createOrReplaceTempView("t_r8")
    val viaSql = s.sql(
      """SELECT id, graft_word_grams(text, 2) AS gs,
        |graft_zvalue(pk, sk, 10) AS z
        |FROM t_r8 ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    val viaApi = s.table("t_r8").select(col("id"),
      graft.functions.WordGrams(col("text"), 2).as("gs"),
      graft.operators.Layout.zValue(col("pk"), col("sk"), 10).as("z"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    assert(viaSql.toSeq == viaApi.toSeq)
    val e = intercept[Exception](
      s.sql("SELECT graft_zvalue(pk, sk) FROM t_r8").collect())
    assert(e.getMessage.contains("graft_zvalue(<a>, <b>, <bits>)"), e.getMessage)
  }

  test("sketch aggregates are callable from SQL and match the Scala API") {
    val s = registered()
    import s.implicits._
    Seq((1L, "aa"), (1L, "bb"), (1L, "cc"), (2L, "aa"), (2L, "zz"))
      .toDF("id", "sh").createOrReplaceTempView("t_sketch")
    val viaSql = s.sql(
      """SELECT id, graft_minhash(sh, 8) AS sig, graft_simhash_agg(sh) AS sim
        |FROM t_sketch GROUP BY id ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    val viaApi = s.table("t_sketch").groupBy("id")
      .agg(graft.functions.SketchAggregates.minhash(col("sh"), 8).as("sig"),
        graft.functions.SketchAggregates.simhash(col("sh")).as("sim"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("pipeline TVFs reject wrong arity with their usage strings") {
    val s = registered()
    val e1 = intercept[Exception](s.sql("SELECT * FROM graft_bm25('v')").collect())
    assert(e1.getMessage.contains("graft_bm25('<view>'"), e1.getMessage)
    val e2 = intercept[Exception](s.sql("SELECT * FROM graft_tfidf('v')").collect())
    assert(e2.getMessage.contains("graft_tfidf('<view>'"), e2.getMessage)
    val e3 = intercept[Exception](s.sql("SELECT * FROM graft_dedup_drops('v')").collect())
    assert(e3.getMessage.contains("graft_dedup_drops('<view>'"), e3.getMessage)
  }

  test("graft_bm25 TVF empty term set fails loudly") {
    val s = registered()
    import s.implicits._
    Seq((1L, "a")).toDF("doc_id", "text").createOrReplaceTempView("t_bm25")
    val e = intercept[Exception](
      s.sql("SELECT * FROM graft_bm25('t_bm25', 'doc_id', 'text', '  ', 5)").collect())
    assert(e.getMessage.contains("empty query-term set"), e.getMessage)
  }

  test("graft_cms from SQL matches the Scala aggregate and probes exactly") {
    val s = registered()
    import s.implicits._
    Seq((1L, "aa"), (1L, "aa"), (1L, "bb"), (2L, "aa"), (2L, "cc"))
      .toDF("id", "tok").createOrReplaceTempView("t_cms")
    val viaSql = s.sql(
      "SELECT graft_cms(tok, 4, 32) AS sk FROM t_cms")
      .head().getSeq[Long](0).toArray
    val viaApi = s.table("t_cms")
      .agg(graft.functions.SketchAggregates.cms(col("tok"), 4, 32).as("sk"))
      .head().getSeq[Long](0).toArray
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(graft.functions.SketchAggregates.cmsEstimate(viaSql, 4, 32, "aa") === 3L)
    val e = intercept[Exception](
      s.sql("SELECT graft_cms(tok) FROM t_cms").collect())
    assert(e.getMessage.contains("graft_cms(<token>, <depth>, <width>)"), e.getMessage)
  }

  test("scalar kernels reject non-constant / wrong-arity int args") {
    val s = registered()
    import s.implicits._
    Seq((1L, "x", 2)).toDF("id", "text", "n").createOrReplaceTempView("t_badargs")
    val e1 = intercept[Exception](
      s.sql("SELECT graft_top_gram_frac(text, n) FROM t_badargs").collect())
    assert(e1.getMessage.contains("constant integer"), e1.getMessage)
    val e2 = intercept[Exception](
      s.sql("SELECT graft_shingles(text) FROM t_badargs").collect())
    assert(e2.getMessage.contains("graft_shingles(<text>, <n>)"), e2.getMessage)
  }
}
