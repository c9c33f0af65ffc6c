package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits, per-key ordinals, boundary is inclusive") {
    // key 1: ts 1,2,8 with gap 5 → {1,2}, {8}; key 2: one session
    val df = Seq((1, 1L), (1, 2L), (1, 8L), (2, 100L), (2, 105L))
      .toDF("k", "ts")
    val got = Sessions.sessionize(df, "k", "ts", gap = 5L)
      .select("k", "ts", "session_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1, 1L, 1L), (1, 2L, 1L), (1, 8L, 2L),
      (2, 100L, 1L), (2, 105L, 1L))) // 105-100 = 5 = gap → same session
  }

  test("sessionize works on TimestampType columns (gap in seconds)") {
    def tstamp(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq((1, tstamp(0)), (1, tstamp(4)), (1, tstamp(20)))
      .toDF("k", "ts")
    val got = Sessions.sessionize(df, "k", "ts", gap = 5L)
      .select("ts", "session_id").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (4L, 1L), (20L, 2L)))
  }

  test("sessionize rejects reserved column names instead of silently overwriting") {
    val df = Seq((1, 1L)).toDF("k", "ts")
    val e1 = intercept[IllegalArgumentException](
      Sessions.sessionize(df.withColumn("session_id", lit(9L)), "k", "ts", 5L))
    assert(e1.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException](
      Sessions.sessionize(df.withColumn("__brk", lit(1)), "k", "ts", 5L))
    assert(e2.getMessage.contains("reserved"))
  }

  test("sessionSummary aggregates bounds and counts per session") {
    val df = Seq((1, 1L), (1, 2L), (1, 50L), (1, 52L)).toDF("k", "ts")
    val got = Sessions.sessionSummary(df, "k", "ts", gap = 10L)
      .orderBy("session_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 2L), (2L, 2L, 50L, 52L)))
  }

  test("saltedSum equals the plain groupBy exactly (decimal values)") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,4)").as("qty"))
    val salted = Sessions.saltedSum(li, Seq("l_returnflag"), "qty", salt = 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val plain = li.groupBy("l_returnflag").agg(sum("qty").as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == plain)
  }

  test("saltedSum spreads a constant-valued hot key (value-derived salt would collapse)") {
    // one hot key, CONSTANT measure — the case a value-hash salt
    // reintroduces skew on. The partition-id salt must spread it.
    val hot = spark.range(0, 10000).repartition(8)
      .select(lit("hot").as("k"), lit(java.math.BigDecimal.valueOf(1))
        .cast("decimal(18,4)").as("v"))
    val salts = hot
      .select(pmod(spark_partition_id(), lit(16)).as("s"))
      .distinct().count()
    assert(salts > 1, s"constant-value hot key collapsed to $salts sub-key(s)")
    val total = Sessions.saltedSum(hot, Seq("k"), "v", salt = 16)
      .head().getDecimal(1)
    assert(total == java.math.BigDecimal.valueOf(10000).setScale(4))
  }

  test("saltedSum plan: two aggregation exchanges, none keyed on the raw hot key alone in phase 1") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,4)").as("qty"))
    val plan = Sessions.saltedSum(li, Seq("l_returnflag"), "qty", salt = 16)
      .queryExecution.optimizedPlan.toString
    // phase-1 grouping includes the salt, so one reducer never owns a
    // whole hot key
    assert(plan.contains("__salt"), plan)
  }
}
