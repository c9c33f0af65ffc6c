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
    def scanOf(plan: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.FileSourceScanExec = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanOf(a.executedPlan)
      case p => p.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          scanOf(q.plan)
      }.get
    }
    val probedFiles = scanOf(probed.queryExecution.executedPlan).metrics("numFiles").value
    val allFiles = idx.inputFiles.length
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"expected pruning: $probedFiles of $allFiles files")
  }
}
