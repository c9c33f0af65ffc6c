package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The streaming-lifecycle maintenance ops: appended stores accumulate
  * one small file per trigger; compaction must shrink the file count
  * while changing NOTHING observable — identical query results,
  * identical candidate sets, partition-filter pruning still active.
  *
  * Round-9: compaction swaps generations via the [[Compaction.Manifest]]
  * pointer protocol (object-store-safe: the only "atomic" step is
  * publishing the one-line `_current` file), so the spec additionally
  * pins the generation lifecycle — mid-swap readers, post-compaction
  * appends, crash survival, vacuum retention. */
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
      def topk() = Ivf.ivfTopKFromIndex(Compaction.readLive(spark, path),
          "vec_id", "embedding", cents, query, k = 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val want = topk()
      Ivf.indexCompact(spark, path)
      val after = Compaction.dataFileCount(path)
      // <= nCells files: exactly one per non-empty cell partition
      assert(after <= 4 && after < before, s"files $before -> $after")
      assert(topk() == want, "compaction changed query results")
      // row set preserved exactly
      assert(Compaction.readLive(spark, path).count() == embs.count())
      // partition pruning still active on the compacted layout
      val probed = Compaction.readLive(spark, path)
        .filter(col("cell").isin(0, 1))
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
      assert(Compaction.readLive(spark, path).count() ==
        3 * 4, "3 docs x 4 bands expected") // components=8, rowsPerBand=2

      // ---- post-compaction APPEND lands in the live generation: the
      // lifecycle keeps working after the layout flips to versioned
      Dedup.minhashStoreAppend(
        Seq((7L, "utterly novel text sharing no shingles with anything stored"))
          .toDF("doc_id", "text"), "doc_id", "text", path)
      assert(candidates() == want + ((101L, 7L)),
        "append after compaction must be visible to candidate queries")

      // ---- second compaction: versioned -> versioned, candidates stable
      Dedup.minhashStoreCompact(spark, path)
      assert(candidates() == want + ((101L, 7L)),
        "re-compaction changed the candidate set")
    } finally Compaction.deleteRecursively(dir)
  }

  test("pq codes store: append fragments, compactClustered preserves ADC top-k exactly") {
    val dir = java.nio.file.Files.createTempDirectory("pq_compact_")
    try {
      val path = dir.resolve("codes").toString
      val base = embs.filter("vec_id % 2 = 0")
      val cbs = Pq.codebooks(base, "vec_id", "embedding", m = 16,
        codeBits = 8, iters = 3, maxSample = 1024)
      Pq.encodedTable(base, "embedding", cbs).drop("embedding")
        .write.mode("overwrite").parquet(path)
      Pq.encodedTable(embs.filter("vec_id % 2 = 1"), "embedding", cbs)
        .drop("embedding")
        .write.mode("append").parquet(path)
      val before = Compaction.dataFileCount(path)
      assert(before >= 2, s"append should fragment; files=$before")

      val query = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -0.5)
      def topk() = Pq.pqTopKFromEncoded(Compaction.readLive(spark, path),
          embs, "vec_id", "embedding", cbs, query, k = 10, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val want = topk()
      Compaction.compactClustered(spark, path, Seq("vec_id"), numFiles = 1)
      assert(Compaction.dataFileCount(path) == 1)
      assert(topk() == want, "compaction changed the ADC-reranked top-k")
      assert(Compaction.readLive(spark, path).count() == embs.count())
    } finally Compaction.deleteRecursively(dir)
  }

  test("sq8 codes store: compactClustered preserves quantized top-k exactly") {
    val dir = java.nio.file.Files.createTempDirectory("sq_compact_")
    try {
      val path = dir.resolve("codes").toString
      val p = Sq.params(embs, "vec_id", "embedding")
      Sq.encodedTable(embs.filter("vec_id % 2 = 0"), "embedding", p)
        .drop("embedding").write.mode("overwrite").parquet(path)
      Sq.encodedTable(embs.filter("vec_id % 2 = 1"), "embedding", p)
        .drop("embedding").write.mode("append").parquet(path)
      assert(Compaction.dataFileCount(path) >= 2)

      val query = Array.fill(64)(0.7)
      def topk() = Sq.sqTopKFromEncoded(Compaction.readLive(spark, path),
          embs, "vec_id", "embedding", p, query, k = 10, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val want = topk()
      Compaction.compactClustered(spark, path, Seq("vec_id"), numFiles = 1)
      assert(Compaction.dataFileCount(path) == 1)
      assert(topk() == want, "compaction changed the quantized top-k")
      assert(Compaction.readLive(spark, path).count() == embs.count())
    } finally Compaction.deleteRecursively(dir)
  }

  test("manifest swap: a reader that resolved mid-swap sees exactly one complete generation") {
    val dir = java.nio.file.Files.createTempDirectory("gen_swap_")
    try {
      val path = dir.resolve("store").toString
      val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      rows.write.parquet(path)
      // first compaction: flat -> gen-00000001
      Compaction.compactClustered(spark, path, Seq("id"))
      val genA = Compaction.Manifest.resolve(path)
      assert(genA.endsWith("gen-00000001"), genA)

      // a reader resolves NOW (pre-swap) and holds its resolved path,
      // exactly as an executor holds file splits for an in-flight query
      val preSwapResolved = genA

      // second compaction swaps the pointer to gen-00000002
      Compaction.compactClustered(spark, path, Seq("id"))
      val genB = Compaction.Manifest.resolve(path)
      assert(genB.endsWith("gen-00000002"), genB)

      // the PRE-swap reader still reads its complete old generation
      // (retained until vacuum), bit-identical row set:
      assert(spark.read.parquet(preSwapResolved).collect().toSet ==
        rows.collect().toSet, "in-flight reader lost its generation")
      // a POST-swap reader resolves to the complete new generation:
      assert(spark.read.parquet(genB).collect().toSet ==
        rows.collect().toSet, "post-swap reader sees incomplete data")
      // and never a mix: the two resolved paths are disjoint trees
      assert(preSwapResolved != genB)

      // vacuum(retainPrevious=false) reclaims the old generation; the
      // live one is untouched
      Compaction.Manifest.vacuum(path, retainPrevious = false)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(preSwapResolved)),
        "vacuum should reclaim the dead generation")
      assert(Compaction.readLive(spark, path).count() == 100)
    } finally Compaction.deleteRecursively(dir)
  }

  test("versioned rewrite crash: failed transform leaves pointer and live data untouched") {
    val dir = java.nio.file.Files.createTempDirectory("swap_crash_")
    try {
      val path = dir.resolve("store").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)
      val before = Compaction.readLive(spark, path).collect().toSet
      // crash on the FLAT store: no pointer is ever published
      intercept[RuntimeException] {
        Compaction.rewriteVersioned(spark, path) { (_, _) =>
          throw new RuntimeException("simulated mid-compaction failure")
        }
      }
      assert(Compaction.Manifest.liveGen(path).isEmpty,
        "crash before publish must not install a pointer")
      assert(Compaction.readLive(spark, path).collect().toSet == before,
        "original store must survive a failed compaction")

      // crash on a VERSIONED store: pointer still names the old complete gen
      Compaction.compactClustered(spark, path, Seq("id"))
      val liveBefore = Compaction.Manifest.liveGen(path)
      intercept[RuntimeException] {
        Compaction.rewriteVersioned(spark, path) { (_, _) =>
          throw new RuntimeException("simulated mid-compaction failure")
        }
      }
      assert(Compaction.Manifest.liveGen(path) == liveBefore,
        "crash must leave the pointer on the previous generation")
      assert(Compaction.readLive(spark, path).collect().toSet == before)
    } finally Compaction.deleteRecursively(dir)
  }

  test("crashed partial generation is recovered: next rewrite deletes it and reuses its number") {
    val dir = java.nio.file.Files.createTempDirectory("partial_gen_")
    try {
      val path = dir.resolve("store").toString
      val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      rows.write.parquet(path)
      Compaction.compactClustered(spark, path, Seq("id")) // live = gen-1
      // simulate a crash AFTER some gen-2 data landed but BEFORE publish:
      // a partial, unpublished generation directory with bogus content
      intercept[RuntimeException] {
        Compaction.rewriteVersioned(spark, path) { (df, out) =>
          df.limit(1).write.parquet(out) // partial data committed
          throw new RuntimeException("crash after partial write")
        }
      }
      val partial = dir.resolve("store/gen-00000002")
      assert(java.nio.file.Files.exists(partial), "fixture: partial must exist")
      // the next rewrite must (a) delete the partial BEFORE numbering —
      // the partial may not inflate the sequence and survive — and
      // (b) produce a complete, correct gen-2
      Compaction.compactClustered(spark, path, Seq("id"))
      assert(Compaction.Manifest.resolve(path).endsWith("gen-00000002"),
        "recovered rewrite must reuse the partial's number, not skip past it")
      assert(Compaction.readLive(spark, path).collect().toSet ==
        rows.collect().toSet, "recovered generation must be complete")
      // and vacuum's retained predecessor is the real one (gen-1), which
      // must still exist for in-flight readers
      assert(java.nio.file.Files.exists(dir.resolve("store/gen-00000001")),
        "true predecessor must survive the recovery rewrite's vacuum")
    } finally Compaction.deleteRecursively(dir)
  }

  test("legacy migration retains flat data for in-flight readers; second rewrite reclaims it, partitioned dirs included") {
    val dir = java.nio.file.Files.createTempDirectory("flat_migrate_")
    try {
      val path = dir.resolve("store").toString
      val rows = (1L to 40L).map(i => (i, i % 4)).toDF("id", "cell")
      rows.write.partitionBy("cell").parquet(path)
      // an in-flight reader resolved the FLAT root before any migration
      val preMigration = Compaction.Manifest.resolve(path)
      assert(preMigration == path)
      // first compaction migrates flat -> gen-1; the flat data is the
      // pseudo-predecessor and MUST survive for the in-flight reader
      Compaction.compactPartitioned(spark, path, "cell")
      assert(spark.read.parquet(preMigration + "/cell=0").count() == 10,
        "in-flight flat reader must keep its files after migration")
      // second compaction: the flat leftovers are now two generations
      // old — reclaimed, INCLUDING the cell=N partition directories
      // (deleting only root files would orphan the whole old dataset)
      Compaction.compactPartitioned(spark, path, "cell")
      val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(path))
        .iterator().asScala.map(_.getFileName.toString)
        .filterNot(n => n.matches("gen-\\d{8}") || n.startsWith("_current"))
        .toSeq
      assert(leftovers.isEmpty, s"flat leftovers must be reclaimed: $leftovers")
      assert(Compaction.readLive(spark, path).count() == 40)
    } finally Compaction.deleteRecursively(dir)
  }

  test("generation numbers past 8 digits stay visible to listing/vacuum (width rollover)") {
    // %08d pads but does not truncate: gen 10^8 writes 9 digits. The
    // listing regex must match it, or partial-cleanup/vacuum/flat-
    // leftover logic silently stops seeing generations _current still
    // resolves — retention and crash recovery break at the rollover.
    val dir = java.nio.file.Files.createTempDirectory("gen_rollover_")
    try {
      val path = dir.toString
      val wide = Compaction.Manifest.genName(100000000L)
      assert(wide == "gen-100000000", wide)
      java.nio.file.Files.createDirectory(dir.resolve(wide))
      java.nio.file.Files.createDirectory(dir.resolve("gen-00000007"))
      val gens = Compaction.Manifest.listGens(path)
      assert(gens.toSet == Set("gen-100000000", "gen-00000007"), gens.toString)
      // numeric, not lexicographic, ordering: 9-digit gen is the max
      assert(gens.maxBy(Compaction.Manifest.genNumber) == "gen-100000000")
      // vacuum keyed off the wide live gen must reclaim the old one,
      // not mistake the wide dir for flat-store debris
      Compaction.Manifest.publish(path, wide)
      Compaction.Manifest.vacuum(path, retainPrevious = false)
      assert(Compaction.Manifest.listGens(path) == Seq("gen-100000000"))
    } finally Compaction.deleteRecursively(dir)
  }
}
