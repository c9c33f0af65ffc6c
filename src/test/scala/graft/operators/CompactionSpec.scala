package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The streaming-lifecycle maintenance ops: appended stores accumulate
  * one small file per trigger; compaction must shrink the file count
  * while changing NOTHING observable — identical query results,
  * identical candidate sets, partition-filter pruning still active. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.load(spark, sf, "embeddings")

  test("indexCompact: appended IVF index -> 1 file/cell, identical top-k, pruning intact") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_compact_")
    try {
      val path = dir.resolve("index").toString
      val cents = Ivf.centroidsRefined(embs, "vec_id", "embedding", nCells = 4)
      // simulate a streaming lifecycle: base write + 3 append triggers
      val base = embs.filter("vec_id % 4 = 0")
      Ivf.indexTable(base, "embedding", cents)
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      for (r <- 1 to 3)
        Ivf.indexTable(embs.filter(s"vec_id % 4 = $r"), "embedding", cents)
          .write.mode("append").partitionBy("cell").parquet(path)
      val before = Compaction.dataFileCount(path)
      assert(before >= 8, s"append lifecycle should fragment; files=$before")

      val query = Array.fill(64)(1.0)
      def topk() = Ivf.ivfTopKFromIndex(spark.read.parquet(path), "vec_id",
          "embedding", cents, query, k = 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val want = topk()
      Ivf.indexCompact(spark, path)
      val after = Compaction.dataFileCount(path)
      // <= nCells files: exactly one per non-empty cell partition
      assert(after <= 4 && after < before, s"files $before -> $after")
      assert(topk() == want, "compaction changed query results")
      // row set preserved exactly
      assert(spark.read.parquet(path).count() == embs.count())
      // partition pruning still active on the compacted layout
      val probed = spark.read.parquet(path).filter(col("cell").isin(0, 1))
      probed.collect()
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    } finally Compaction.deleteRecursively(dir)
  }

  test("minhashStoreCompact: appended store -> 1 clustered file, identical candidates") {
    val dir = java.nio.file.Files.createTempDirectory("mh_compact_")
    try {
      val path = dir.resolve("bands").toString
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "completely different historical content nothing like the rest here"),
        (3L, "a third document with its own unrelated words entirely")
      ).toDF("doc_id", "text")
      Dedup.minhashStoreWrite(docs.filter("doc_id = 1"), "doc_id", "text", path)
      Dedup.minhashStoreAppend(docs.filter("doc_id = 2"), "doc_id", "text", path)
      Dedup.minhashStoreAppend(docs.filter("doc_id = 3"), "doc_id", "text", path)
      val before = Compaction.dataFileCount(path)
      assert(before >= 3, s"three writes should leave >= 3 files; files=$before")

      val batch = Seq(
        (100L, "the quick brown fox jumps over the lazy dog again and again"),
        (101L, "utterly novel text sharing no shingles with anything stored")
      ).toDF("doc_id", "text")
      def candidates() =
        Dedup.minhashStoreCandidates(batch, "doc_id", "text", path)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val want = candidates()
      assert(want == Set((100L, 1L)), want.toString)
      Dedup.minhashStoreCompact(spark, path)
      val after = Compaction.dataFileCount(path)
      assert(after == 1, s"files $before -> $after")
      assert(candidates() == want, "compaction changed the candidate set")
      // store row set preserved
      assert(spark.read.parquet(path).count() ==
        3 * 4, "3 docs x 4 bands expected") // components=8, rowsPerBand=2
    } finally Compaction.deleteRecursively(dir)
  }

  test("rewriteInPlace staging: a failed transform leaves the original store untouched") {
    val dir = java.nio.file.Files.createTempDirectory("swap_crash_")
    try {
      val path = dir.resolve("store").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)
      val before = spark.read.parquet(path).collect().toSet
      intercept[RuntimeException] {
        Compaction.rewriteInPlace(spark, path) { (_, _) =>
          throw new RuntimeException("simulated mid-compaction failure")
        }
      }
      assert(spark.read.parquet(path).collect().toSet == before,
        "original store must survive a failed compaction")
    } finally Compaction.deleteRecursively(dir)
  }
}
