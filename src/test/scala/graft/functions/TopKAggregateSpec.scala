package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The window-replacement proof for [[TopKAgg]]: on randomized inputs —
  * score ties, null scores, null payloads, groups smaller than k — the
  * aggregate's exploded output must be ROW-IDENTICAL (same rows, same
  * rank order) to `row_number() OVER (PARTITION BY g ORDER BY score DESC,
  * id ASC) <= k`. This is what lets the knn/label-noise/hard-negative
  * entries swap their pair-set windows for map-side top-k without the
  * oracle hash moving. */
class TopKAggregateSpec extends SparkSpec {

  private def compare(rows: Seq[(Int, java.lang.Double, Long, java.lang.Long)],
                      k: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.LongType))))
      .repartition(7) // several partitions so partial/merge paths both run
    val win = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rk") <= k)
      .select("g", "score", "id", "p", "rk")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getInt(4))).toSet
    val agg = df.groupBy("g")
      .agg(TopKAggregates.topk(col("score"), col("id"), col("p"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.score"), col("col.id"), col("col.payload"),
        (col("pos") + 1).as("rk"))
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getInt(4))).toSet
    assert(agg == win, s"topk != window\nagg:  $agg\nwin:  $win")
  }

  test("randomized parity with the window formulation (ties, small groups)") {
    val rnd = new scala.util.Random(7)
    // few distinct scores => dense ties; ids unique
    val rows = (0L until 2000L).map { id =>
      (rnd.nextInt(13), java.lang.Double.valueOf(rnd.nextInt(5) / 10.0),
        id, java.lang.Long.valueOf(rnd.nextInt(3).toLong))
    }
    compare(rows, 5)
    compare(rows, 1)
  }

  test("null scores rank last, null payloads survive, groups < k kept whole") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map { id =>
      val score: java.lang.Double =
        if (rnd.nextInt(5) == 0) null else java.lang.Double.valueOf(rnd.nextDouble())
      val p: java.lang.Long =
        if (rnd.nextInt(4) == 0) null else java.lang.Long.valueOf(rnd.nextInt(9).toLong)
      (rnd.nextInt(40), score, id, p) // 40 groups over 300 rows => tiny groups
    }
    compare(rows, 5)
  }

  test("string-keyed variant: randomized parity with the (long DESC, string ASC) window") {
    val rnd = new scala.util.Random(13)
    import scala.jdk.CollectionConverters._
    val toks = Seq("alpha", "beta", "beta2", "gamma", "", "zz", "émile", "中文", "a b")
    val rows = (0 until 3000).map { _ =>
      org.apache.spark.sql.Row(rnd.nextInt(17),
        if (rnd.nextInt(7) == 0) null else java.lang.Long.valueOf(rnd.nextInt(4).toLong),
        toks(rnd.nextInt(toks.length)) + rnd.nextInt(5))
    }
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType, nullable = false))))
      .distinct() // unique (g, score, tok) so the window rank order is total
      .repartition(5)
    val win = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("tok").asc)))
      .filter(col("rk") <= 3).select("g", "score", "tok", "rk")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2), r.getInt(3))).toSet
    val agg = df.groupBy("g")
      .agg(TopKAggregates.topkStr(col("score"), col("tok"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.score"), col("col.key"), (col("pos") + 1).as("rk"))
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2), r.getInt(3))).toSet
    assert(agg == win, s"topkStr != window; agg: $agg ; win: $win")
  }

  test("plan shape: grouped top-k is an ObjectHashAggregate, no Window, no sort of the pair set") {
    val df = spark.range(0, 10000).select(
      (col("id") % 50).as("g"), rand(3).as("score"), col("id"), lit(1L).as("p"))
    val out = df.groupBy("g")
      .agg(TopKAggregates.topk(col("score"), col("id"), col("p"), 5).as("top"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("wrong input types fail at ANALYSIS time, not as an executor cast") {
    // r15 (advisor): update() casts eval results straight to Double/Long —
    // a float score or int id used to surface as an executor-side
    // ClassCastException; checkInputDataTypes must reject it up front
    val df = spark.range(0, 10).select(
      (col("id") % 2).as("g"), col("id").cast("float").as("fscore"),
      col("id").cast("int").as("iid"), col("id").as("lid"),
      col("id").cast("double").as("dscore"))
    val floatScore = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(TopKAggregates.topk(
        col("fscore"), col("lid"), lit(null).cast("long"), 3)).collect()
    }
    assert(floatScore.getMessage.contains("topk"), floatScore.getMessage)
    val intId = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(TopKAggregates.topk(
        col("dscore"), col("iid"), lit(null).cast("long"), 3)).collect()
    }
    assert(intId.getMessage.contains("topk"), intId.getMessage)
    val strScore = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(TopKAggregates.topkStr(
        col("dscore"), col("g").cast("string"), 3)).collect()
    }
    assert(strScore.getMessage.contains("topkstr"), strScore.getMessage)
  }
}
