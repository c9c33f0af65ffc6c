package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits; z-adjacent points are axis-close") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (1023, 1023))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 10).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got((0, 0)) == 0L)
    assert(got((1, 0)) == 1L)      // bit 0 of a -> z bit 0
    assert(got((0, 1)) == 2L)      // bit 0 of b -> z bit 1
    assert(got((1, 1)) == 3L)
    // 3 = 0b011, 5 = 0b101 -> interleave a@even/b@odd:
    // z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 1+2+4+0+0+32 = 39
    assert(got((3, 5)) == 39L)
    assert(got((1023, 1023)) == (1L << 20) - 1)
  }

  test("bucketed tables join and aggregate with ZERO shuffle exchanges") {
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val scores = (0L until 1000L).map(i => (i, i % 7)).toDF("doc_id", "score")
    // disable broadcast so the join actually exercises the bucket layout
    // (a broadcast join would sidestep bucketing on this tiny fixture —
    // at real scale neither side broadcasts and bucketing is the lever)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.bucketWrite(docs, "ls_docs", "doc_id", buckets = 8)
      Layout.bucketWrite(scores, "ls_scores", "doc_id", buckets = 8)
      val joined = spark.table("ls_docs").join(spark.table("ls_scores"), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // bucket-to-bucket: a merge join with NO shuffle on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles\n$plan")
      // keyed aggregation rides the bucketing too
      val agg = spark.table("ls_docs").groupBy("doc_id").count()
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy still shuffles\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ls_docs")
      spark.sql("DROP TABLE IF EXISTS ls_scores")
    }
  }

  test("z-ordered files bound BOTH dimensions; single-column sort does not") {
    // uniform 64x64 grid; the pruning claim is about per-FILE extents
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec_")
    try {
      val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
        .toDF("a", "b")
      val zPath = dir.resolve("z").toString
      Layout.zOrderWrite(grid, "a", "b", zPath, bits = 6, numFiles = 16)
      def spreads(path: String) = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).collect()(0)
      val z = spreads(zPath)
      // 16 files over a 2^12 z-space: each file spans ~2^8 of z, i.e.
      // ~2^4 = 16 of each 64-wide axis. Generously assert < half range.
      assert(z.getDouble(0) < 32.0, s"a-spread ${z.getDouble(0)}")
      assert(z.getDouble(1) < 32.0, s"b-spread ${z.getDouble(1)}")
      // contrast: sort by a alone -> b spread stays ~full range
      val aPath = dir.resolve("a").toString
      grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
        .write.mode("overwrite").parquet(aPath)
      val s = spreads(aPath)
      assert(s.getDouble(1) > 32.0, s"single-col b-spread ${s.getDouble(1)}")
    } finally {
      import java.nio.file.{Files, Path}
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach((p: Path) => { Files.deleteIfExists(p); () })
    }
  }
}
