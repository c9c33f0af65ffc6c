package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Packing.chunkAssign]] (two-phase distributed prefix sum) and
  * [[Sampling.tokenQuotaSample]] (keyed greedy token fill). The property
  * that matters for the prefix sum is PARTITION-INDEPENDENCE: Spark
  * samples range boundaries nondeterministically, so the result must be
  * provably the same under any input partitioning and any shuffle
  * parallelism. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def toyDocs(n: Int) =
    (0 until n).map(i => (i.toLong, (i % 7) + 1)).toDF("id", "toks")

  test("chunkAssign equals the sequential concat-and-chunk reference") {
    val df = toyDocs(100)
    val got = Packing.chunkAssign(df, "id", "toks", budget = 10L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-side sequential reference: running start offset in id order
    var start = 0L
    val exp = (0 until 100).map { i =>
      val t = (i % 7) + 1L
      val row = (i.toLong, t, start / 10L, start % 10L)
      start += t
      row
    }
    assert(got.toSeq == exp, "distributed prefix sum != sequential reference")
  }

  test("chunkAssign is partition-independent (the nondeterministic-ranges hazard)") {
    val df = toyDocs(500)
    def run(parts: Int, shufflePartitions: String) = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try Packing.chunkAssign(df.repartition(parts), "id", "toks", budget = 16L)
        .orderBy("id").collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    val base = run(1, "4")
    assert(run(7, "4") == base, "7 input partitions changed the assignment")
    assert(run(3, "11") == base, "11 shuffle partitions changed the assignment")
  }

  test("chunkAssign materializes ONE partitioning for both phases (r13 sf0.1 bug)") {
    // the range partitioner SAMPLES split points per job; without the
    // eager checkpoint the offsets job and the windows job can land on
    // DIFFERENT boundaries and the prefix sums silently shift (caught
    // at sf0.1 by the full oracle gate: 3710/5000 pack_chunks rows
    // wrong). Pin the structure: the output plan must read the
    // checkpointed RDD, not re-evaluate the range exchange.
    val out = Packing.chunkAssign(toyDocs(100), "id", "toks", budget = 16L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      "chunkAssign no longer checkpoints the partitioned frame - the " +
        "two prefix-sum phases can resample different range boundaries:\n" + plan)
    assert(!plan.contains("RangePartitioning"),
      "the final job re-ran the range exchange instead of reading the " +
        "materialized partitioning:\n" + plan)
  }

  test("chunkAssign contracts: positive budget, reserved names") {
    intercept[IllegalArgumentException](
      Packing.chunkAssign(toyDocs(5), "id", "toks", budget = 0L))
    intercept[IllegalArgumentException](
      Packing.chunkAssign(toyDocs(5).withColumn("__pid", lit(1)),
        "id", "toks", budget = 8L))
  }

  test("tokenQuotaSample: greedy md5-order fill, boundary-doc overshoot only") {
    val df = (0 until 60).map(i => (i.toLong, if (i % 2 == 0) "en" else "und", 10))
      .toDF("id", "lang", "toks")
    val kept = Sampling.tokenQuotaSample(df, "id", "lang", "toks",
      Map("en" -> 95L, "und" -> 0L)).collect()
    // en: 10-token docs fill greedily; doc 10 starts at 90 < 95 and
    // overshoots to 100 — the boundary-doc rule; doc 11 starts at 100
    assert(kept.forall(_.getString(1) == "en"), "und quota 0 must keep nothing")
    assert(kept.length == 10, s"expected 10 en docs (90 tokens + boundary), got ${kept.length}")
    // determinism: the kept SET is the md5-least ids, stable across runs
    val again = Sampling.tokenQuotaSample(df, "id", "lang", "toks",
      Map("en" -> 95L, "und" -> 0L)).collect().map(_.getLong(0)).sorted.toSeq
    assert(again == kept.map(_.getLong(0)).sorted.toSeq)
  }

  test("chunkOverlap: full coverage, overlap preserved, no redundant tail chunk") {
    // 10 tokens, window 4, stride 3: chunks start at 0,3,6 — the c=6
    // chunk reaches token 10, so c=9 (which the naive start<n rule would
    // emit, adding only token 10 it already covered) must NOT appear.
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Packing.chunkOverlap(df, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0, 1, 4, "t1 t2 t3 t4"),
      (1, 4, 4, "t4 t5 t6 t7"),
      (2, 7, 4, "t7 t8 t9 t10")), got.toSeq.toString)
  }

  test("chunkOverlap: short docs yield exactly one whole-doc chunk") {
    val df = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = Packing.chunkOverlap(df, "doc_id", "text", window = 4, stride = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getString(4)))
    // empty text normalizes to one "" token — one chunk of one empty token
    assert(got.toSeq == Seq((1L, 0, 2, "a b"), (2L, 0, 1, "")), got.toSeq.toString)
    intercept[IllegalArgumentException](
      Packing.chunkOverlap(df, "doc_id", "text", window = 4, stride = 5))
  }

  test("tokenQuotaSample: strata without a quota keep nothing; reserved names") {
    val df = Seq((1L, "fr", 5)).toDF("id", "lang", "toks")
    assert(Sampling.tokenQuotaSample(df, "id", "lang", "toks",
      Map("en" -> 100L)).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.tokenQuotaSample(df.withColumn("__quota", lit(1)),
        "id", "lang", "toks", Map("en" -> 1L)))
  }
}
