package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistence for the ANN *models* — the driver-side training artifacts
  * that must ride with a materialized index: IVF coarse centroids
  * ([[Ivf.indexTable]]), PQ codebooks ([[Pq.encodedTable]]) and SQ8
  * quantization params ([[Sq.encodedTable]]). The index tables persist the
  * DATA (codes, cells, norms); without the model that wrote them they are
  * unreadable — `ivfTopKFromIndex`/`pqTopKFromEncoded`/`sqTopKFromEncoded`
  * all take the model back as an argument. This object closes the
  * deployment lifecycle: train once, `save*` beside the index, and any
  * later session `load*`s and queries WITHOUT retraining (training is a
  * seeded sample collect — rerunning it on a grown corpus would yield a
  * DIFFERENT model that silently mis-decodes the old codes; persisting is
  * correctness, not just convenience).
  *
  * Format: one small parquet dataset per model type under
  * `<dir>/{ivf_centroids,pq_codebooks,sq8_params}`. Parquet stores IEEE-754
  * doubles bit-exactly, so a load returns the SAME model to the last bit
  * (pinned in AnnModelsSpec via doubleToRawLongBits) — which is what makes
  * a reloaded-model query hash-identical to the training session's. Row
  * counts are model-sized (nCells / m·2^codeBits / dim), so `coalesce(1)`
  * keeps each model a single file and the load collect is bounded by the
  * model size, the same driver budget class as training itself.
  */
object AnnModels {

  private val IvfSub = "ivf_centroids"
  private val PqSub = "pq_codebooks"
  private val SqSub = "sq8_params"

  private def sub(dir: String, name: String): String =
    s"${dir.stripSuffix("/")}/$name"

  private def loadOrExplain(spark: SparkSession, path: String,
                            what: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"AnnModels: no $what model at $path — was the model saved " +
            s"beside this index? (save* writes it at index-build time)", e)
    }

  /** Persist IVF coarse centroids as (cell INT, centroid ARRAY<DOUBLE>). */
  def saveCentroids(spark: SparkSession, dir: String,
                    cents: Array[Array[Double]]): Unit = {
    require(cents.nonEmpty, "saveCentroids: empty centroid set")
    val schema = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val rows = cents.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(sub(dir, IvfSub))
  }

  /** Load IVF centroids saved by [[saveCentroids]]: result(cell) is the
    * centroid vector, bit-exact. */
  def loadCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val rows = loadOrExplain(spark, sub(dir, IvfSub), "IVF centroid")
      .orderBy("cell").collect()
    val cents = rows.map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    require(cents.map(_._1).sameElements(cents.indices),
      s"loadCentroids: cell ids not contiguous 0..${cents.length - 1} — " +
        "corrupt or partially-written model")
    cents.map(_._2)
  }

  /** Persist PQ codebooks as (subspace INT, code INT, codeword
    * ARRAY<DOUBLE>) — m·2^codeBits rows. */
  def saveCodebooks(spark: SparkSession, dir: String,
                    cbs: Array[Array[Array[Double]]]): Unit = {
    require(cbs.nonEmpty && cbs.head.nonEmpty, "saveCodebooks: empty codebooks")
    val schema = StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("codeword", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val rows = for {
      (book, mi) <- cbs.zipWithIndex
      (cw, j) <- book.zipWithIndex
    } yield Row(mi, j, cw.toSeq)
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(sub(dir, PqSub))
  }

  /** Load PQ codebooks saved by [[saveCodebooks]]: result(subspace)(code)
    * is the codeword, bit-exact. */
  def loadCodebooks(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val rows = loadOrExplain(spark, sub(dir, PqSub), "PQ codebook")
      .orderBy("subspace", "code").collect()
    require(rows.nonEmpty, "loadCodebooks: model dataset is empty")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * k,
      s"loadCodebooks: ${rows.length} rows != m=$m x k=$k — corrupt model")
    val out = Array.ofDim[Array[Double]](m, k)
    for (r <- rows) out(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    out
  }

  /** Persist SQ8 params as (dim INT, vmin DOUBLE, scale DOUBLE) — one row
    * per vector dimension. */
  def saveSq8(spark: SparkSession, dir: String, p: Sq.Sq8Params): Unit = {
    require(p.mins.length == p.scales.length && p.mins.nonEmpty,
      "saveSq8: mins/scales must be same non-zero length")
    val schema = StructType(Seq(
      StructField("dim", IntegerType, nullable = false),
      StructField("vmin", DoubleType, nullable = false),
      StructField("scale", DoubleType, nullable = false)))
    val rows = p.mins.indices.map(i => Row(i, p.mins(i), p.scales(i)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(sub(dir, SqSub))
  }

  /** Load SQ8 params saved by [[saveSq8]], bit-exact. */
  def loadSq8(spark: SparkSession, dir: String): Sq.Sq8Params = {
    val rows = loadOrExplain(spark, sub(dir, SqSub), "SQ8 params")
      .orderBy("dim").collect()
    require(rows.nonEmpty, "loadSq8: model dataset is empty")
    require(rows.map(_.getInt(0)).sameElements(rows.indices),
      s"loadSq8: dims not contiguous 0..${rows.length - 1} — corrupt model")
    Sq.Sq8Params(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }
}
