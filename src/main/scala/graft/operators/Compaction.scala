package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Offline bin-packing for the persistent stores the streaming faces
  * grow one small file per trigger — the classic small-file death at
  * 100 TB: an IVF index appended hourly accumulates 8,760 files per
  * `cell=N` partition a year, and every probe pays file-open cost per
  * tiny file. Compaction rewrites the SAME rows into few large files,
  * preserving the partition layout (so `PartitionFilters` pruning is
  * untouched — spec-pinned in CompactionSpec) and the row set exactly.
  *
  * Contract: run compaction OFFLINE (no concurrent reader/appender of
  * the store — the same maintenance-window contract as Delta/Iceberg
  * OPTIMIZE without a transaction log). The rewrite is staged: the
  * compacted copy is fully written to `<path>.compact-tmp` first, the
  * old directory is moved aside, the new one moved into place, and only
  * then the old one deleted — a crash at any step leaves at least one
  * complete copy on disk (at `<path>`, `<path>.compact-tmp`, or
  * `<path>.compact-old`; recover by renaming).
  */
object Compaction {

  /** Rewrite the dataset at `path` as `transform(read)` written by
    * `write`, with the staged swap described above. */
  private[operators] def rewriteInPlace(spark: SparkSession, path: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val tmp = path + ".compact-tmp"
    val old = path + ".compact-old"
    deleteRecursively(Paths.get(tmp))
    deleteRecursively(Paths.get(old))
    write(spark.read.parquet(path), tmp)
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(path))
    deleteRecursively(Paths.get(old))
  }

  private[operators] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  /** Parquet data files under `path` (recursive; excludes _SUCCESS and
    * hidden files) — the before/after metric a compaction spec asserts. */
  def dataFileCount(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          !f.getFileName.toString.startsWith(".") &&
          !f.getFileName.toString.startsWith("_")).count()
      finally s.close()
    }
  }

  /** Compact a `partitionBy(partCol)` parquet dataset (e.g. an IVF index
    * grown by streaming append) down to `filesPerPartition` files per
    * partition directory. One shuffle keyed by (partCol [, salt]); every
    * task writes at most one file per partition value it holds, so the
    * post-compaction file count per partition is ≤ filesPerPartition.
    * Row set is preserved exactly; partition layout (and therefore
    * partition-filter pruning) is preserved by writing with the same
    * `partitionBy`. */
  def compactPartitioned(spark: SparkSession, path: String,
                         partCol: String,
                         filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    rewriteInPlace(spark, path) { (df, out) =>
      val keyed =
        if (filesPerPartition == 1) df.repartition(col(partCol))
        else df.repartition(col(partCol),
          pmod(xxhash64(struct(df.columns.map(col): _*)),
            lit(filesPerPartition)))
      keyed.write.mode("overwrite").partitionBy(partCol).parquet(out)
    }
  }

  /** Compact an UNPARTITIONED parquet store (e.g. the banded minhash
    * signature store grown by [[Dedup.minhashStoreAppend]]) into
    * `numFiles` files, clustered by `clusterCols` so each output file
    * holds a contiguous key range (row-group pruning + join locality —
    * the "bucket the store by bkey" note on minhashStoreWrite made
    * real). */
  def compactClustered(spark: SparkSession, path: String,
                       clusterCols: Seq[String],
                       numFiles: Int = 1): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    rewriteInPlace(spark, path) { (df, out) =>
      df.repartitionByRange(numFiles, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
        .write.mode("overwrite").parquet(out)
    }
  }
}
