package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import java.lang.Double.doubleToRawLongBits

/** [[AnnModels]] — the persisted models must come back BIT-identical
  * (doubleToRawLongBits equality, not ==): a reloaded model that differs by
  * one ulp would decode the persisted codes differently than the session
  * that wrote them, silently shifting shortlists. Also pins the
  * loud-failure contract for missing/corrupt model dirs. */
class AnnModelsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_models_spec").toFile.getAbsolutePath

  private lazy val e = Tables.load(spark, sf, "embeddings")

  test("IVF centroids round-trip bit-exactly") {
    val cents = Ivf.centroidsRefined(e, "vec_id", "embedding", nCells = 8)
    val dir = tmp()
    AnnModels.saveCentroids(spark, dir, cents)
    val back = AnnModels.loadCentroids(spark, dir)
    assert(back.length == cents.length)
    for (c <- cents.indices) {
      assert(back(c).length == cents(c).length)
      assert(back(c).map(doubleToRawLongBits)
        .sameElements(cents(c).map(doubleToRawLongBits)),
        s"centroid $c not bit-identical after reload")
    }
  }

  test("PQ codebooks round-trip bit-exactly") {
    val cbs = Pq.codebooks(e, "vec_id", "embedding", m = 8, codeBits = 4,
      iters = 2, maxSample = 256)
    val dir = tmp()
    AnnModels.saveCodebooks(spark, dir, cbs)
    val back = AnnModels.loadCodebooks(spark, dir)
    assert(back.length == cbs.length)
    for (mi <- cbs.indices; j <- cbs(mi).indices)
      assert(back(mi)(j).map(doubleToRawLongBits)
        .sameElements(cbs(mi)(j).map(doubleToRawLongBits)),
        s"codeword ($mi, $j) not bit-identical after reload")
  }

  test("SQ8 params round-trip bit-exactly") {
    val p = Sq.params(e, "vec_id", "embedding", maxSample = 256)
    val dir = tmp()
    AnnModels.saveSq8(spark, dir, p)
    val back = AnnModels.loadSq8(spark, dir)
    assert(back.mins.map(doubleToRawLongBits)
      .sameElements(p.mins.map(doubleToRawLongBits)))
    assert(back.scales.map(doubleToRawLongBits)
      .sameElements(p.scales.map(doubleToRawLongBits)))
  }

  test("a reloaded PQ model + persisted codes answer queries with no training") {
    val dir = tmp()
    val cbs = Pq.codebooks(e, "vec_id", "embedding", m = 16, codeBits = 8,
      iters = 3, maxSample = 1024)
    Pq.encodedTable(e, "embedding", cbs).drop("embedding")
      .write.mode("overwrite").parquet(s"$dir/codes")
    AnnModels.saveCodebooks(spark, dir, cbs)
    // "later session": only `dir` crosses the line — no codebooks in scope
    val query = Array.tabulate(64)(i => math.sin(i + 1.0))
    val got = Pq.pqTopKFromEncoded(spark.read.parquet(s"$dir/codes"), e,
        "vec_id", "embedding", AnnModels.loadCodebooks(spark, dir),
        query, k = 10, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(e, "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(exact),
      "reloaded-model PQ top-10 differs from brute force")
  }

  test("index append with a frozen reloaded model: cells consistent, no dupes/holes, exact query") {
    import org.apache.spark.sql.functions.{col, desc}
    val dir = tmp()
    val base = e.filter(col("vec_id") % 2 === 0)
    val cents = Ivf.centroidsRefined(base, "vec_id", "embedding", nCells = 8)
    Ivf.indexTable(base, "embedding", cents)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
    AnnModels.saveCentroids(spark, dir, cents)
    // "append session": only `dir` crosses the line — assign the new rows
    // with the RELOADED model, no retraining
    Ivf.indexTable(e.filter(col("vec_id") % 2 === 1), "embedding",
        AnnModels.loadCentroids(spark, dir))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/index")
    val combined = spark.read.parquet(s"$dir/index")
    // no dupes, no holes
    assert(combined.count() == e.count())
    assert(combined.select("vec_id").distinct().count() == e.count())
    // every row's cell — base generation and appended generation alike —
    // equals a fresh assignment of the full table under the same model
    val fresh = Ivf.indexTable(e, "embedding", cents)
      .select(col("vec_id"), col("cell"))
    assert(combined.select(col("vec_id"), col("cell").cast("int"))
      .exceptAll(fresh).isEmpty, "appended index cells diverge from model")
    // exact query over both generations matches brute force
    val query = Array.tabulate(64)(i => math.cos(i + 1.0))
    val got = Ivf.ivfTopKFromIndex(combined, "vec_id", "embedding",
        AnnModels.loadCentroids(spark, dir), query, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(e, "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(exact),
      "appended-index IVF top-10 differs from brute force")
  }

  test("PQ code append with a frozen reloaded codebook: codes consistent, " +
    "no dupes/holes, reranked query exact") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    val base = e.filter(col("vec_id") % 2 === 0)
    val cbs = Pq.codebooks(base, "vec_id", "embedding", m = 16, codeBits = 8,
      iters = 3, maxSample = 1024)
    Pq.encodedTable(base, "embedding", cbs).drop("embedding")
      .write.mode("overwrite").parquet(s"$dir/codes")
    AnnModels.saveCodebooks(spark, dir, cbs)
    // "append session": only `dir` crosses the line — encode the new rows
    // with the RELOADED codebooks, no retraining, no rewrite of old files
    Pq.encodedTable(e.filter(col("vec_id") % 2 === 1), "embedding",
        AnnModels.loadCodebooks(spark, dir)).drop("embedding")
      .write.mode("append").parquet(s"$dir/codes")
    val combined = spark.read.parquet(s"$dir/codes")
    // no dupes, no holes
    assert(combined.count() == e.count())
    assert(combined.select("vec_id").distinct().count() == e.count())
    // every row's code — base and appended generations alike — equals a
    // fresh encode of the full table under the same codebooks (a model
    // drift here would silently corrupt ADC scores for one generation)
    val fresh = Pq.encodedTable(e, "embedding", cbs).drop("embedding")
    assert(combined.exceptAll(fresh).isEmpty,
      "appended codes diverge from a fresh same-model encode")
    // reranked query over both generations matches brute force
    val query = Array.tabulate(64)(i => math.cos(i + 1.0))
    val got = Pq.pqTopKFromEncoded(combined, e, "vec_id", "embedding",
        AnnModels.loadCodebooks(spark, dir), query, k = 10, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(e, "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(exact),
      "appended-codes PQ top-10 differs from brute force")
  }

  test("loading a missing model fails loudly with the save-side hint") {
    val err = intercept[IllegalArgumentException] {
      AnnModels.loadCentroids(spark, tmp())
    }
    assert(err.getMessage.contains("no IVF centroid model"))
    assert(err.getMessage.contains("saved beside this index"))
  }

  test("a corrupt (non-contiguous) model fails loudly") {
    val dir = tmp()
    val cents = Ivf.centroids(e, "vec_id", "embedding", nCells = 4)
    AnnModels.saveCentroids(spark, dir, cents)
    // damage: drop cell 1 and rewrite
    val damaged = spark.read.parquet(s"$dir/ivf_centroids")
      .filter(org.apache.spark.sql.functions.col("cell") =!= 1)
    val d2 = tmp()
    damaged.write.parquet(s"$d2/ivf_centroids")
    val err = intercept[IllegalArgumentException] {
      AnnModels.loadCentroids(spark, d2)
    }
    assert(err.getMessage.contains("not contiguous"))
  }
}
