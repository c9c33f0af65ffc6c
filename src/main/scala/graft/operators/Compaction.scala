package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Offline bin-packing for the persistent stores the streaming faces
  * grow one small file per trigger — the classic small-file death at
  * 100 TB: an IVF index appended hourly accumulates 8,760 files per
  * `cell=N` partition a year, and every probe pays file-open cost per
  * tiny file. Compaction rewrites the SAME rows into few large files,
  * preserving the partition layout (so `PartitionFilters` pruning is
  * untouched — spec-pinned in CompactionSpec) and the row set exactly.
  *
  * Contract: run compaction with no concurrent APPENDER of the store
  * (the same maintenance-window contract as Delta/Iceberg OPTIMIZE
  * without a transaction log). Concurrent READERS are safe: the rewrite
  * is generation-versioned (see [[Manifest]]) — the compacted copy is
  * fully written to a NEW `gen-N` directory, the tiny `_current` pointer
  * file is swapped atomically, and the previous generation is RETAINED
  * until vacuumed, so a reader that resolved the store before the swap
  * keeps reading its complete old generation and a reader that resolves
  * after sees the complete new one. Nothing ever renames or rewrites the
  * data tree in place, which is what makes the op correct on object
  * stores where rename is a non-atomic copy+delete: the only "atomic"
  * step is publishing one small pointer object (a single-key PUT). A
  * crash at any step leaves `_current` naming a complete generation.
  */
object Compaction {

  /** Generation-pointer store layout — the object-store-safe swap.
    *
    * A versioned store is a directory holding `gen-NNNNNNNN/` data
    * directories plus a one-line `_current` file naming the LIVE one.
    * Every store reader resolves through [[resolve]]; a store without
    * `_current` is a legacy flat store and resolves to itself, so the
    * layout is adopted lazily by the first versioned rewrite and
    * pre-existing flat stores keep working unchanged.
    *
    * Why a pointer file instead of the r08 rename-staged directory swap:
    * POSIX `Files.move` of the data directory is atomic on the fixture
    * filesystem, but on an object store (the real 100 TB substrate)
    * directory rename is per-key copy+delete — non-atomic and O(data).
    * Here the data tree is immutable once written; the only mutation is
    * publishing `_current`, a single small object whose PUT is atomic on
    * every store (locally: write-tmp + single-file ATOMIC_MOVE). This is
    * the Delta/Iceberg "pointer to the current snapshot" shape reduced
    * to its minimum: one generation live at a time, previous generation
    * retained for in-flight readers, older ones pruned by [[vacuum]]. */
  object Manifest {
    val PointerFile = "_current"

    /** The live data directory: `path/<gen>` named by `_current`, or
      * `path` itself for a legacy flat store. Every store reader goes
      * through this (one tiny file read; a long-lived service caches it
      * per query, not per row). */
    def resolve(path: String): String =
      liveGen(path).map(g => Paths.get(path, g).toString).getOrElse(path)

    def liveGen(path: String): Option[String] = {
      val ptr = Paths.get(path, PointerFile)
      if (Files.exists(ptr))
        Some(new String(Files.readAllBytes(ptr), "UTF-8").trim)
      else None
    }

    /** Atomically repoint `_current` at `gen`: stage to `_current.tmp`,
      * then one single-file ATOMIC_MOVE — the local analog of an
      * object-store single-key PUT. */
    private[operators] def publish(path: String, gen: String): Unit = {
      val tmp = Paths.get(path, PointerFile + ".tmp")
      Files.write(tmp, (gen + "\n").getBytes("UTF-8"))
      Files.move(tmp, Paths.get(path, PointerFile),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    private[operators] def genNumber(name: String): Long =
      name.stripPrefix("gen-").toLong

    private[operators] def genName(n: Long): String = f"gen-$n%08d"

    private[operators] def listGens(path: String): Seq[String] = {
      val p = Paths.get(path)
      if (!Files.exists(p)) Seq.empty
      else {
        val s = Files.list(p)
        try s.iterator().asScala
          // {8,}: %08d pads but does NOT truncate, so gen 10^8+ writes 9
          // digits — an exact {8} would make those invisible to partial
          // cleanup/vacuum while _current still resolves them
          .filter(f => Files.isDirectory(f) &&
            f.getFileName.toString.matches("gen-\\d{8,}"))
          .map(_.getFileName.toString).toSeq
        finally s.close()
      }
    }

    /** Delete generations other than the live one and (by default) its
      * immediate predecessor — the VACUUM step, separated from the swap
      * so in-flight readers of the previous generation never lose their
      * files mid-query. (At 100 TB this is "retain for the max query
      * runtime + clock skew" exactly as Delta VACUUM's retention window;
      * one predecessor is the minimal honest version of that.)
      *
      * FLAT LEFTOVERS from the legacy migration (data at the store root,
      * below every `gen-*`) are the pseudo-generation preceding gen-1:
      * retained exactly while they ARE the live generation's immediate
      * predecessor (live = gen-1, no versioned predecessor — in-flight
      * readers that resolved the flat root pre-migration keep their
      * files), deleted once a versioned predecessor supersedes them or
      * when retention is off. Directories (a partitioned flat store's
      * `cell=N/` trees) are removed recursively — deleting only root
      * files would orphan the whole old dataset forever. */
    def vacuum(path: String, retainPrevious: Boolean = true): Unit =
      liveGen(path).foreach { live =>
        val gens = listGens(path)
        val prevGens = gens.filter(genNumber(_) < genNumber(live))
          .sortBy(genNumber)
        val keep = Set(live) ++ (if (retainPrevious) prevGens.lastOption else None)
        gens.filterNot(keep).foreach(g =>
          deleteRecursively(Paths.get(path, g)))
        val flatIsPredecessor =
          retainPrevious && genNumber(live) == 1L && prevGens.isEmpty
        if (!flatIsPredecessor) deleteFlatLeftovers(path)
      }

    /** Direct children of the store root that are neither `gen-*`
      * directories nor the pointer file(s): the legacy flat store's
      * data, dead once a generation is live. */
    private def deleteFlatLeftovers(path: String): Unit = {
      val p = Paths.get(path)
      if (Files.exists(p)) {
        val s = Files.list(p)
        try s.iterator().asScala
          .filter { f =>
            val n = f.getFileName.toString
            !n.matches("gen-\\d{8,}") && !n.startsWith(PointerFile)
          }
          .toSeq.foreach(deleteRecursively)
        finally s.close()
      }
    }
  }

  /** Rewrite the store at `path` as `write(read(live), newGenDir)` under
    * the [[Manifest]] generation protocol:
    *
    *   1. delete any UNPUBLISHED partial generations (every `gen-*`
    *      numbered above the live generation — publish immediately
    *      follows a complete write, so a higher-numbered directory can
    *      only be the debris of a crashed earlier rewrite; with no
    *      `_current` at all, every `gen-*` is such debris). This is the
    *      documented crash recovery, and it must happen BEFORE choosing
    *      the next number: deriving nextN from max(listGens) would let
    *      the partial inflate the sequence, survive forever, and be
    *      mistaken for the vacuum predecessor;
    *   2. resolve the live data directory (flat `path` on first call)
    *      and write the full transformed copy to `gen-(live+1)` (a
    *      sibling tree — the live directory is never touched);
    *   3. atomically publish `_current` = `gen-N`;
    *   4. vacuum: retain the immediate predecessor (the flat root's
    *      data plays that role right after a legacy migration — see
    *      [[Manifest.vacuum]]) so in-flight readers keep their files.
    *
    * A crash before (3) leaves the live generation untouched and
    * `_current` unmoved — the next rewrite's step (1) clears the
    * partial. */
  private[operators] def rewriteVersioned(spark: SparkSession, path: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val live = Manifest.liveGen(path)
    val liveN = live.map(Manifest.genNumber).getOrElse(0L)
    Manifest.listGens(path)
      .filter(Manifest.genNumber(_) > liveN)
      .foreach(g => deleteRecursively(Paths.get(path, g)))
    val src = Manifest.resolve(path)
    val gen = Manifest.genName(liveN + 1L)
    val genDir = Paths.get(path, gen)
    // Spark materializes the read lazily inside `write`; the source is
    // either the flat root (whose reader listed its files before gen-N
    // gains any) or a sibling gen directory — never the output tree.
    write(spark.read.parquet(src), genDir.toString)
    Manifest.publish(path, gen)
    Manifest.vacuum(path, retainPrevious = true)
  }

  private[operators] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  /** Parquet data files a READER of the store pays for (the live
    * generation for a versioned store; recursive; excludes _SUCCESS and
    * hidden files) — the before/after metric a compaction spec asserts. */
  def dataFileCount(path: String): Long = {
    val p = Paths.get(Manifest.resolve(path))
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

  /** Read the live generation of the store at `path` (legacy flat stores
    * resolve to themselves). The reader every store consumer uses. */
  def readLive(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(Manifest.resolve(path))

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
    rewriteVersioned(spark, path) { (df, out) =>
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
    rewriteVersioned(spark, path) { (df, out) =>
      df.repartitionByRange(numFiles, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
        .write.mode("overwrite").parquet(out)
    }
  }
}
