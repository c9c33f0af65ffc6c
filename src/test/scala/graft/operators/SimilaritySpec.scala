package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions.{col, lit}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.load(spark, sf, "embeddings")
  private val ones = Array.fill(64)(1.0)

  test("cosineTopK: scores in [-1,1], descending, k rows") {
    val top = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 10).collect()
    assert(top.length == 10)
    val scores = top.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("cosineTopK on a known geometry") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(df, "vec_id", "embedding", Array(1.0, 0.0), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head._1 == 1L && math.abs(top.head._2 - 1.0) < 1e-12)
    assert(top(1)._1 == 3L && math.abs(top(1)._2 - math.sqrt(0.5)) < 1e-12)
  }

  test("nearDupPairs finds planted duplicate vectors") {
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq(
      (1L, base), (2L, base.map(_ * 2.0f)), // colinear → cosine 1
      (3L, base.map(x => -x)),              // opposite → -1
      (4L, Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupPairs refuses inputs above the O(n^2) guard, loudly") {
    val big = spark.range(0, 101).selectExpr("id AS vec_id",
      "array(cast(id AS float), 1.0F) AS embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.nearDupPairs(big, "vec_id", "embedding", 0.9, maxRows = 100))
    assert(e.getMessage.contains("O(n^2)"), e.getMessage)
    assert(e.getMessage.contains("annNearDupPairs"), e.getMessage)
    // explicit opt-in raises the guard — same call succeeds
    assert(Similarity.nearDupPairs(big, "vec_id", "embedding", 0.9999,
      maxRows = 200).count() >= 0)
  }

  test("annTopK recall vs brute force >= 0.8 at tuned planes/probes") {
    // measured on the fixtures: (8 planes, radius 5) = 0.95 recall at
    // sf0.001 and 1.00 at sf0.01 — the assertion has real margin
    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.annTopK(embs, "vec_id", "embedding", ones, 20,
      nPlanes = 8, probeRadius = 5).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("multi-table annTopK: recall 1 at the measured operating point, OR-probe supersets one table") {
    // RecallTune: 4 tables x 8 planes, radius 3 => recall 1.000 at
    // sf0.001, sf0.01 AND sf0.1 (the basis for emb_ann_topk_recall)
    val exact = Similarity.cosineTopK(embs, "vec_id", "embedding", ones, 20)
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.annTopK(embs, "vec_id", "embedding", ones, 20,
      nPlanes = 8, probeRadius = 3, nBands = 4)
      .collect().map(_.getLong(0)).toSet
    assert(multi == exact, s"missed: ${exact -- multi}")
    // the OR over tables can only widen the candidate set
    val one = Similarity.annCandidates(embs, "vec_id", "embedding", ones,
      nPlanes = 8, probeRadius = 3, nBands = 1)
      .collect().map(_.getLong(0)).toSet
    val four = Similarity.annCandidates(embs, "vec_id", "embedding", ones,
      nPlanes = 8, probeRadius = 3, nBands = 4)
      .collect().map(_.getLong(0)).toSet
    assert(one.subsetOf(four))
    assert(four.size > one.size, "extra tables added no candidates")
  }

  test("annTopK is seed-deterministic: identical rows across invocations") {
    def run() = Similarity.annTopK(embs, "vec_id", "embedding", ones, 20,
      nPlanes = 8, probeRadius = 3, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run() == run())
    // the hyperplanes themselves are frozen by seed — a generator change
    // would silently reshuffle every bucket across session restarts
    val p = graft.functions.VectorFunctions.randomPlanes(2, 3, seed = 42L)
    assert(math.abs(p(0)(0) - 0.4147197504315306) < 1e-12, p(0)(0).toString)
  }

  test("annNearDupPairs finds colinear pairs (signature-identical)") {
    val base = Array.tabulate(64)(i => (i % 7 + 1).toFloat)
    val df = Seq(
      (1L, base), (2L, base.map(_ * 3.0f)),
      (3L, Array.tabulate(64)(i => ((i * 13) % 11 - 5).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.annNearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("annNearDupPairs hot-bucket cap: over-cap buckets emit a verified star; sub-cap identical to uncapped") {
    // 7 identical embeddings (ids 10..16 — one hot bucket per band) next
    // to a colinear pair and a distinct vector; cap at 4
    val base = Array.tabulate(64)(i => (i % 7 + 1).toFloat)
    val other = Array.tabulate(64)(i => ((i * 13) % 11 - 5).toFloat)
    val rows = Seq((1L, other), (2L, other.map(_ * 2.0f))) ++
      (10L to 16L).map(i => (i, base))
    val df = rows.toDF("vec_id", "embedding")
    val capped = Similarity.annNearDupPairs(df, "vec_id", "embedding", 0.99,
        maxBucket = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val isClique = (id: Long) => id >= 10L
    // star around the clique min, every pair exact-cosine verified at 1.0
    val star = (11L to 16L).map(i => (10L, i)).toSet
    assert(capped.keySet.filter(p => isClique(p._1) || isClique(p._2)) == star,
      capped.toString)
    star.foreach(p => assert(math.abs(capped(p) - 1.0) < 1e-9, capped(p).toString))
    // sub-cap pairs identical to the uncapped join (the colinear pair)
    val uncapped = Similarity.annNearDupPairs(df, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.keySet.filterNot(p => isClique(p._1) || isClique(p._2)) ==
      uncapped.filterNot(p => isClique(p._1) || isClique(p._2)))
    assert(uncapped.filter(p => isClique(p._1) && isClique(p._2)).size == 21) // C(7,2)
  }

  test("semanticDedup: planted clones dropped, originals kept, nothing else at 0.999") {
    import org.apache.spark.sql.functions.max
    val offset = embs.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val clones = embs.filter(col("vec_id") < 40)
      .withColumn("vec_id", col("vec_id") + offset)
    val dropped = Similarity.semanticDedup(
        embs.unionByName(clones), "vec_id", "embedding",
        nCells = 16, threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    // identical vectors ALWAYS share a cell (deterministic NearestCell),
    // so every clone pairs with its original and the clone id (larger)
    // drops; random 64-dim cosines never reach 0.999, so nothing else
    assert(dropped == (0L until 40L).map(_ + offset).toSet, dropped.toString)
  }

  test("nCellsFor holds mean cell size constant across scale factors") {
    // the two fixture scales: ceil-division of the corpus size by the
    // default 100-vector target cluster
    assert(Similarity.nCellsFor(500L) == 5)    // sf0.001/sf0.01 embeddings
    assert(Similarity.nCellsFor(2000L) == 20)  // sf0.1 embeddings
    // recipe shape: k grows linearly with n (constant ⟨cluster⟩) ...
    assert(Similarity.nCellsFor(100L * 1000L) == 1000)
    // ... with the floor and the driver-budget cap at the ends
    assert(Similarity.nCellsFor(1L) == 1)
    assert(Similarity.nCellsFor(100L * 100000L) == 65536)
    intercept[IllegalArgumentException](Similarity.nCellsFor(0L))
    intercept[IllegalArgumentException](Similarity.nCellsFor(10L, 0L))
  }

  test("semanticDedupAuto: derived cell count, same planted-clone drop set") {
    import org.apache.spark.sql.functions.max
    val offset = embs.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val clones = embs.filter(col("vec_id") < 40)
      .withColumn("vec_id", col("vec_id") + offset)
    val dropped = Similarity.semanticDedupAuto(
        embs.unionByName(clones), "vec_id", "embedding", threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    // cell-count independence of the planted proof: identical vectors
    // share a cell at ANY derived k, so auto-tuning changes the partition
    // of the space but never the drop set
    assert(dropped == (0L until 40L).map(_ + offset).toSet, dropped.toString)
  }

  test("semanticDedup rejects reserved column names") {
    val bad = embs.withColumn("__cell", lit(1))
    val e = intercept[IllegalArgumentException](
      Similarity.semanticDedup(bad, "vec_id", "embedding"))
    assert(e.getMessage.contains("reserved"))
  }

  test("semanticDecontaminate flags only corpus rows cloned into the eval set") {
    import org.apache.spark.sql.functions.max
    val offset = embs.agg(max(col("vec_id"))).head().getLong(0) + 1L
    // eval = clones of corpus ids < 25, shifted past the corpus id space
    val evalSet = embs.filter(col("vec_id") < 25)
      .withColumn("vec_id", col("vec_id") + offset)
    val dropped = Similarity.semanticDecontaminate(
        embs, evalSet, "vec_id", "embedding", nCells = 16, threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    // the CORPUS side is flagged (train-set rows to drop), never the
    // eval ids; random non-clone pairs stay far below 0.999
    assert(dropped == (0L until 25L).toSet, dropped.toString)
  }
}
