package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Pins `Ivf.deriveOperatingPoint` — the r09 de-pinning of the label-
  * noise audit's hand-tuned (nCells=8, depth=2, nProbe=7) constants.
  * The derivation must (a) reproduce full exact-recall configs on the
  * fixture, (b) discover that this weakly-clustering corpus has no
  * sub-corpus full-recall point (converging to depth=1/nProbe=nCells,
  * candidate volume exactly 1.0 — strictly cheaper than the r08 pinned
  * point's 1.75 corpus-reads), and (c) make the ANN deployment entry
  * reproduce the brute-force audit bit-for-bit end-to-end. */
class OperatingPointSpec extends SparkSpec {

  private lazy val embs = Tables.load(spark, sf, "embeddings")

  test("derivation on the fixture: min-volume full-coverage config is depth=1, nProbe=nCells") {
    val nCells = Similarity.nCellsFor(embs.count(), targetClusterSize = 64L)
    assert(nCells == 8, s"500-row fixture at cluster size 64 should give 8 cells, got $nCells")
    val cents = Ivf.centroidsRefined(embs, "vec_id", "embedding", nCells)
    val op = Ivf.deriveOperatingPoint(embs, "vec_id", "embedding", cents, k = 5)
    // the near-random fixture does not cluster: the sweep must discover
    // that probing everything at single assignment is the cheapest exact
    // config (volume 1.0), not silently keep a redundant-assignment
    // point that reads more than the corpus
    assert(op == Ivf.OperatingPoint(8, 1, 8, 64, 1.0), op.toString)
    // strictly cheaper than the r08 hand-pinned point (depth 2, nProbe 7
    // at nCells 8 = 1.75 corpus-reads)
    assert(op.volume < 2.0 * 7 / 8, op.toString)
  }

  test("derived point round-trips through the artifact-dir properties file") {
    val dir = java.nio.file.Files.createTempDirectory("op_point_")
    try {
      val op = Ivf.OperatingPoint(32, 2, 27, 64, 2.0 * 27 / 32)
      Ivf.saveOperatingPoint(dir.toString, op)
      assert(Ivf.loadOperatingPoint(dir.toString) == op)
      // a volume with no finite decimal expansion (7/24) must round-trip
      // bit-exactly too — volume is recomputed from the integer fields on
      // load, never parsed from a formatted decimal
      val lossy = Ivf.OperatingPoint(24, 1, 7, 64, 7.0 / 24)
      Ivf.saveOperatingPoint(dir.toString, lossy)
      assert(Ivf.loadOperatingPoint(dir.toString) == lossy)
      // the persisted file must be decimal-free: under a comma-decimal
      // default locale a %.4f float field would write `1,0000` and break
      // the space-separated k=v grammar on reload
      val raw = new String(java.nio.file.Files.readAllBytes(
        dir.resolve("operating_point")), "UTF-8")
      assert(!raw.contains(".") && !raw.contains(","), raw)
      // pre-existing artifact dirs carry the retired volume= field;
      // loaders must ignore it rather than crash
      java.nio.file.Files.write(dir.resolve("operating_point"),
        "nCells=8 depth=1 nProbe=8 sampleSize=64 volume=1.0000\n".getBytes("UTF-8"))
      assert(Ivf.loadOperatingPoint(dir.toString) ==
        Ivf.OperatingPoint(8, 1, 8, 64, 1.0))
    } finally Compaction.deleteRecursively(dir)
  }

  test("ANN audit with derived parameters reproduces the brute-force audit exactly") {
    val ann = graft.queries.Pipeline.queries("emb_label_noise_ann")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val brute = graft.queries.Pipeline.queries("emb_label_noise")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(ann.nonEmpty, "fixture should surface at least one suspect label")
    assert(ann == brute,
      s"derived ANN shortlist diverged from brute force: ${ann.size} vs ${brute.size} rows")
  }
}
