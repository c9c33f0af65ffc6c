package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The IVF persistent-index path: the index table written out
  * partitioned by `cell` lets a probe filter prune whole partitions at
  * the storage layer — the mechanism that makes IVF a 100 TB scale path
  * (a query touches nProbe/nCells of the files, not the corpus). */
class IvfIndexSpec extends SparkSpec {

  test("index written partitionBy(cell): probe filter prunes partitions at the scan") {
    val embs = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toFile
    Ivf.indexTable(embs, "vec_id", "embedding", nCells = 8)
      .write.mode("overwrite").partitionBy("cell").parquet(dir.getAbsolutePath)

    val idx = spark.read.parquet(dir.getAbsolutePath)
    val cents = Ivf.centroids(embs, "vec_id", "embedding", 8)
    val probes = Ivf.probeCells(cents, Array.fill(64)(1.0), 2)

    val probed = idx.filter(col("cell").isin(probes: _*))
    // the probed rows are exactly the rows assigned to those cells
    // (collect() executes probed's own QueryExecution — count() would
    // build a new one and leave probed's scan metrics unpopulated)
    val expected = idx.collect().count(r => probes.contains(r.getAs[Int]("cell")))
    assert(probed.collect().length == expected)
    // storage-level pruning: after execution the scan's numFiles metric
    // counts only the probe cells' files, a strict subset of the index
    // (DataFrame.inputFiles would NOT show this — it lists the relation's
    // files before partition pruning)
    val probedFiles = scanOf(probed.queryExecution.executedPlan).metrics("numFiles").value
    val allFiles = idx.inputFiles.length
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"expected pruning: $probedFiles of $allFiles files")
  }

  test("ivfTopKFromIndex: exact at full probe, partition-pruned below it") {
    val embs = Tables.load(spark, sf, "embeddings")
    val ones = Array.fill(64)(1.0)
    val cents = Ivf.centroidsRefined(embs, "vec_id", "embedding", 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index_q").toFile
    Ivf.indexTable(embs, "embedding", cents)
      .write.mode("overwrite").partitionBy("cell").parquet(dir.getAbsolutePath)
    val idx = spark.read.parquet(dir.getAbsolutePath)

    // probing every cell through the materialized index is exact
    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Ivf.ivfTopKFromIndex(idx, "vec_id", "embedding", cents,
      ones, k = 20, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)

    // below full probe the query matches the in-memory assignment path
    // AND its executed scan read a strict subset of the index files
    val pruned = Ivf.ivfTopKFromIndex(idx, "vec_id", "embedding", cents,
      ones, k = 20, nProbe = 4)
    val prunedRows = pruned.collect().map(_.getLong(0)).toSeq
    val mem = Ivf.indexTable(embs, "embedding", cents)
      .filter(col("cell").isin(Ivf.probeCells(cents, ones, 4): _*))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"),
          graft.functions.VectorFunctions.vecLit(ones)).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSeq
    assert(prunedRows == mem)
    val prunedFiles = scanOf(pruned.queryExecution.executedPlan).metrics("numFiles").value
    assert(prunedFiles > 0 && prunedFiles < idx.inputFiles.length,
      s"expected pruning: $prunedFiles of ${idx.inputFiles.length} files")
  }

  private def scanOf(plan: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.FileSourceScanExec = plan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scanOf(a.executedPlan)
    case p => p.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        scanOf(q.plan)
    }.get
  }
}
