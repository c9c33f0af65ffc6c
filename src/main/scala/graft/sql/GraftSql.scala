package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.FluvioDuck

/** The reference's SQL surface, on Spark SQL: its whole documented UX is
  * three table-valued functions registered into the host engine
  * (`/root/reference/src/lib.rs:37-39`; every README example is
  * `SELECT * FROM fluvio_consume('...')`, `README.md:76-111`). Here they
  * are Catalyst table functions:
  *
  *   - `fluvio_consume('<topic> <options>' [, '<baseDir>'])`
  *   - `fluvio_topics([<baseDir>])`
  *   - `fluvio_partitions([<baseDir>])`
  *
  * The base dir falls back to the session conf `spark.graft.dataDir`.
  * Each builder plans the same DataFrame the Scala API returns and hands
  * its logical plan to the analyzer — the TVF is pure declaration; all
  * pushdown/pruning/codegen happens in the one Catalyst plan.
  *
  * Two registration paths:
  *   - [[GraftSql.register]]: into an existing session's function registry;
  *   - [[GraftExtensions]]: `spark.sql.extensions=graft.sql.GraftExtensions`
  *     at session build time (the `register_table_function` analog).
  */
object GraftSql {

  /** Session conf key for the topic base directory. */
  val DataDirKey = "spark.graft.dataDir"

  private def strArg(fn: String, e: Expression): String = e match {
    case Literal(u: UTF8String, StringType) if u != null => u.toString
    case other if other.foldable && other.dataType == StringType =>
      val v = other.eval(null)
      if (v == null) throw new IllegalArgumentException(s"$fn: argument must not be NULL")
      v.toString
    case _ =>
      throw new IllegalArgumentException(
        s"$fn expects constant string arguments, got: ${e.sql}")
  }

  private def baseDir(fn: String, args: Seq[Expression], at: Int): String =
    if (args.length > at) strArg(fn, args(at))
    else {
      val spark = SparkSession.active
      val dir = spark.conf.get(DataDirKey, null)
      if (dir == null)
        throw new IllegalArgumentException(
          s"$fn: no base directory — pass it as the last argument or set $DataDirKey")
      dir
    }

  type TableFunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  /** The three TVF descriptions (name, info, plan builder). */
  def descriptions: Seq[TableFunctionDescription] = Seq(
    (FunctionIdentifier("fluvio_consume"),
      new ExpressionInfo(GraftSql.getClass.getName, "fluvio_consume"),
      (args: Seq[Expression]) => {
        if (args.isEmpty || args.length > 2)
          throw new IllegalArgumentException(
            "fluvio_consume('<topic> <options>' [, '<baseDir>'])")
        val spark = SparkSession.active
        val cmd = strArg("fluvio_consume", args.head)
        shim.logicalPlan(FluvioDuck.consume(spark, cmd, baseDir("fluvio_consume", args, 1)))
      }),
    (FunctionIdentifier("fluvio_topics"),
      new ExpressionInfo(GraftSql.getClass.getName, "fluvio_topics"),
      (args: Seq[Expression]) => {
        if (args.length > 1)
          throw new IllegalArgumentException("fluvio_topics([<baseDir>])")
        val spark = SparkSession.active
        shim.logicalPlan(FluvioDuck.topics(spark, baseDir("fluvio_topics", args, 0)))
      }),
    (FunctionIdentifier("fluvio_partitions"),
      new ExpressionInfo(GraftSql.getClass.getName, "fluvio_partitions"),
      (args: Seq[Expression]) => {
        if (args.length > 1)
          throw new IllegalArgumentException("fluvio_partitions([<baseDir>])")
        val spark = SparkSession.active
        shim.logicalPlan(FluvioDuck.partitions(spark, baseDir("fluvio_partitions", args, 0)))
      }),

    // ---- table operators as TVFs: the reference's UX is SQL-first, so
    // the joins Spark SQL lacks are reachable from pure SQL too. Table
    // inputs are passed as VIEW NAMES (registry table functions take only
    // constant expressions — the same constraint the reference's
    // fluvio_consume('...') string contract lives under); each builder
    // plans the SAME DataFrame the Scala API returns.
    (FunctionIdentifier("graft_asof_join"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_asof_join"),
      (args: Seq[Expression]) => {
        if (args.length < 5 || args.length > 7)
          throw new IllegalArgumentException(
            "graft_asof_join('<leftView>', '<rightView>', '<k1,k2,...>', " +
              "'<leftTs>', '<rightTs>' [, '<inner|left>' [, <toleranceLong>]])")
        val spark = SparkSession.active
        val fn = "graft_asof_join"
        // validate scalar args BEFORE view resolution: a bad constant gets
        // its own clear error, not TABLE_OR_VIEW_NOT_FOUND
        val keys = strArg(fn, args(2)).split(",").map(_.trim).toSeq
        val (lts, rts) = (strArg(fn, args(3)), strArg(fn, args(4)))
        val jt = if (args.length > 5) strArg(fn, args(5)) else "inner"
        val tol = if (args.length > 6) Some(longArg(fn, args(6))) else None
        shim.logicalPlan(graft.operators.Temporal.asofJoin(
          spark.table(strArg(fn, args(0))), spark.table(strArg(fn, args(1))),
          keys, lts, rts, joinType = jt, tolerance = tol))
      }),
    (FunctionIdentifier("graft_range_join"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_range_join"),
      (args: Seq[Expression]) => {
        if (args.length < 6 || args.length > 7)
          throw new IllegalArgumentException(
            "graft_range_join('<leftView>', '<pointCol>', '<rightView>', " +
              "'<loCol>', '<hiCol>', <binWidth> [, '<k1,k2,...>'])")
        val spark = SparkSession.active
        val fn = "graft_range_join"
        val point = strArg(fn, args(1))
        val (lo, hi) = (strArg(fn, args(3)), strArg(fn, args(4)))
        val bw = doubleArg(fn, args(5))
        val keys = if (args.length > 6)
          strArg(fn, args(6)).split(",").map(_.trim).toSeq else Nil
        shim.logicalPlan(graft.operators.Temporal.rangeJoin(
          spark.table(strArg(fn, args(0))), point,
          spark.table(strArg(fn, args(2))), lo, hi,
          binWidth = bw, keyCols = keys))
      }),
    (FunctionIdentifier("graft_sessionize"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_sessionize"),
      (args: Seq[Expression]) => {
        if (args.length != 4)
          throw new IllegalArgumentException(
            "graft_sessionize('<view>', '<keyCol>', '<tsCol>', <gapLong>)")
        val spark = SparkSession.active
        val fn = "graft_sessionize"
        val (key, ts) = (strArg(fn, args(1)), strArg(fn, args(2)))
        val gap = longArg(fn, args(3))
        shim.logicalPlan(graft.operators.Sessions.sessionize(
          spark.table(strArg(fn, args(0))), key, ts, gap))
      }),
    (FunctionIdentifier("graft_bm25"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_bm25"),
      (args: Seq[Expression]) => {
        if (args.length != 5)
          throw new IllegalArgumentException(
            "graft_bm25('<view>', '<idCol>', '<textCol>', '<terms ws-separated>', <topN>)")
        val spark = SparkSession.active
        val fn = "graft_bm25"
        val terms = strArg(fn, args(3)).trim.split("\\s+").toSeq.filter(_.nonEmpty)
        shim.logicalPlan(graft.operators.TextAnalysis.bm25Rank(
          spark.table(strArg(fn, args(0))), strArg(fn, args(1)),
          strArg(fn, args(2)), terms, intArg(fn, args(4))))
      }),
    (FunctionIdentifier("graft_pagerank"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_pagerank"),
      (args: Seq[Expression]) => {
        if (args.length < 2 || args.length > 3)
          throw new IllegalArgumentException(
            "graft_pagerank('<edgesView(src,dst,w)>', <iters> [, '<seedsView(id)>'])")
        val spark = SparkSession.active
        val fn = "graft_pagerank"
        val seeds =
          if (args.length > 2) Some(spark.table(strArg(fn, args(2)))) else None
        shim.logicalPlan(graft.operators.Graphs.pagerank(
            spark.table(strArg(fn, args(0))), intArg(fn, args(1)), seeds)
          .select(org.apache.spark.sql.functions.col("id").as("node_id"),
            org.apache.spark.sql.functions.col("r").as("rank_micro")))
      }),
    (FunctionIdentifier("graft_tfidf"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_tfidf"),
      (args: Seq[Expression]) => {
        if (args.length != 4)
          throw new IllegalArgumentException(
            "graft_tfidf('<view>', '<idCol>', '<textCol>', <k>)")
        val spark = SparkSession.active
        val fn = "graft_tfidf"
        shim.logicalPlan(graft.operators.TextAnalysis.tfIdfTopTerms(
          spark.table(strArg(fn, args(0))), strArg(fn, args(1)),
          strArg(fn, args(2)), intArg(fn, args(3))))
      }),
    (FunctionIdentifier("graft_dedup_drops"),
      new ExpressionInfo(GraftSql.getClass.getName, "graft_dedup_drops"),
      (args: Seq[Expression]) => {
        if (args.length != 3)
          throw new IllegalArgumentException(
            "graft_dedup_drops('<view>', '<idCol>', '<textCol>')")
        val spark = SparkSession.active
        val fn = "graft_dedup_drops"
        shim.logicalPlan(graft.operators.Dedup.exactDrops(
          spark.table(strArg(fn, args(0))), strArg(fn, args(1)),
          strArg(fn, args(2))))
      }))

  private def longArg(fn: String, e: Expression): Long = e match {
    case other if other.foldable &&
      (other.dataType == org.apache.spark.sql.types.IntegerType ||
        other.dataType == org.apache.spark.sql.types.LongType) =>
      other.eval(null) match {
        case i: Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case null => throw new IllegalArgumentException(s"$fn: argument must not be NULL")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn expects a constant integer argument, got: ${e.sql}")
  }

  private def doubleArg(fn: String, e: Expression): Double = e match {
    // SQL decimal literals parse as DecimalType (4.0 -> DECIMAL(2,1)), so
    // accept any foldable numeric and convert through its string form
    case other if other.foldable &&
      other.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      other.eval(null) match {
        case null => throw new IllegalArgumentException(s"$fn: argument must not be NULL")
        case v    => v.toString.toDouble
      }
    case _ => throw new IllegalArgumentException(
      s"$fn expects a constant numeric argument, got: ${e.sql}")
  }

  type ScalarFunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intArg(fn: String, e: Expression): Int = e match {
    case other if other.foldable &&
      (other.dataType == org.apache.spark.sql.types.IntegerType ||
        other.dataType == org.apache.spark.sql.types.LongType) =>
      other.eval(null) match {
        case i: Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case null => throw new IllegalArgumentException(s"$fn: argument must not be NULL")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn expects a constant integer argument, got: ${e.sql}")
  }

  /** The operator kernels as SQL scalar functions — the reference's UX is
    * SQL-first (a DuckDB extension), so the text/dedup kernels are
    * reachable from pure SQL too:
    *
    *   `SELECT graft_langid(text), graft_quality(text) FROM docs`
    *
    * Each builder returns the SAME native Catalyst expression the Scala
    * API plans (whole-stage codegen'd, no UDF seat); constant int args
    * (shingle length, winnow k/w) are required foldable, like the TVF
    * string args. */
  def scalarDescriptions: Seq[ScalarFunctionDescription] = {
    import graft.operators.TextAnalysis
    def viaColumn(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
    : ScalarFunctionDescription =
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getName, name),
        (args: Seq[Expression]) => {
          if (args.length != 1)
            throw new IllegalArgumentException(s"$name(<text>)")
          // EAGER conversion: a deferred ColumnNodeExpression would reach
          // codegen unresolved from a registry builder (see shim)
          shim.resolvedExpression(f(shim.column(args.head)))
        })
    def textInt(name: String, f: (Expression, Int) => Expression)
    : ScalarFunctionDescription =
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getName, name),
        (args: Seq[Expression]) => {
          if (args.length != 2)
            throw new IllegalArgumentException(s"$name(<text>, <n>)")
          f(args.head, intArg(name, args(1)))
        })
    Seq(
      viaColumn("graft_langid", TextAnalysis.langId),
      viaColumn("graft_quality", TextAnalysis.qualityScore),
      viaColumn("graft_token_count", TextAnalysis.tokenCount),
      viaColumn("graft_fingerprint", TextAnalysis.fingerprint),
      viaColumn("graft_scrub_pii", TextAnalysis.scrubPii),
      viaColumn("graft_nfc", graft.functions.NfcNormalize.apply),
      viaColumn("graft_canon_url", graft.functions.UrlFunctions.canonicalizeUrl(_)),
      viaColumn("graft_domain", graft.functions.UrlFunctions.urlDomain),
      viaColumn("graft_simhash", c => shim.column(
        graft.functions.SimHashText(shim.expression(c)))),
      textInt("graft_top_gram_frac", (e, n) => graft.functions.TopGramFrac(e, n)),
      textInt("graft_shingles", (e, n) => graft.functions.WordShingles(e, n)),
      textInt("graft_word_grams", (e, n) => graft.functions.WordGrams(e, n)),
      (FunctionIdentifier("graft_zvalue"),
        new ExpressionInfo(GraftSql.getClass.getName, "graft_zvalue"),
        (args: Seq[Expression]) => {
          if (args.length != 3)
            throw new IllegalArgumentException("graft_zvalue(<a>, <b>, <bits>)")
          shim.resolvedExpression(graft.operators.Layout.zValue(
            shim.column(args.head), shim.column(args(1)),
            intArg("graft_zvalue", args(2))))
        }),
      (FunctionIdentifier("graft_winnow"),
        new ExpressionInfo(GraftSql.getClass.getName, "graft_winnow"),
        (args: Seq[Expression]) => {
          if (args.length != 3)
            throw new IllegalArgumentException("graft_winnow(<text>, <k>, <w>)")
          graft.functions.WinnowFingerprint(args.head,
            intArg("graft_winnow", args(1)), intArg("graft_winnow", args(2)))
        }),
      // sketch AGGREGATES: a builder may return a bare AggregateFunction —
      // the analyzer wraps it in an AggregateExpression like any built-in
      // SQL aggregate (SUM et al. register the same way)
      textInt("graft_minhash", (e, n) => graft.functions.MinHashAgg(e, n)),
      (FunctionIdentifier("graft_simhash_agg"),
        new ExpressionInfo(GraftSql.getClass.getName, "graft_simhash_agg"),
        (args: Seq[Expression]) => {
          if (args.length != 1)
            throw new IllegalArgumentException("graft_simhash_agg(<token>)")
          graft.functions.SimHashAgg(args.head)
        }),
      (FunctionIdentifier("graft_cms"),
        new ExpressionInfo(GraftSql.getClass.getName, "graft_cms"),
        (args: Seq[Expression]) => {
          if (args.length != 3)
            throw new IllegalArgumentException("graft_cms(<token>, <depth>, <width>)")
          graft.functions.CmsAgg(args.head,
            intArg("graft_cms", args(1)), intArg("graft_cms", args(2)))
        }))
  }

  /** Register the TVFs + scalar kernels into a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = shim.tableFunctionRegistry(spark)
    descriptions.foreach { case (name, info, builder) =>
      reg.registerFunction(name, info, builder)
    }
    val sreg = shim.functionRegistry(spark)
    scalarDescriptions.foreach { case (name, info, builder) =>
      sreg.registerFunction(name, info, builder)
    }
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions` — registers the TVFs
  * at session build time, the analog of the reference extension's
  * `register_table_function` calls (`/root/reference/src/lib.rs:37-39`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftSql.descriptions.foreach(e.injectTableFunction)
    GraftSql.scalarDescriptions.foreach(e.injectFunction)
  }
}
