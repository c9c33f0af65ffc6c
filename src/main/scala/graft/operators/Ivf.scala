package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF-flat approximate nearest neighbor — the coarse-quantizer companion
  * to the random-hyperplane LSH in [[Similarity]] (the brief's "IVF or
  * LSH-bucketed variant"; having both covers the two standard ANN scale
  * paths).
  *
  *   - Index: `nCells` centroids picked as a seed-deterministic sample
  *     (top-k by xxhash64(id, seed) — a per-partition TakeOrdered of k
  *     VECTORS, never a driver scan of the data), then every row is
  *     assigned to its nearest centroid by a codegen'd argmin.
  *   - Query: rank only the rows whose cell is among the `nProbe`
  *     centroids closest to the query (driver-side math over nCells
  *     vectors), exact cosine within the probed cells.
  *
  * At corpus scale the assignment is materialized once and the table is
  * bucketed/partitioned by `cell`, so a query's probe-filter prunes file
  * groups instead of scanning; assignment cost is one VectorDot per cell
  * per row, all inside whole-stage codegen. Recall is tuned by
  * nCells/nProbe; nProbe = nCells degenerates to exact brute force.
  */
object Ivf {

  /** Seed-deterministic centroid sample: the k vectors with the smallest
    * xxhash64(id, seed). Accepts array<float> or array<double> vector
    * columns (same contract as the NearestCell/VectorDot kernels). */
  def centroids(df: DataFrame, idCol: String, vecCol: String,
                nCells: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rows = df.select(col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(nCells)
      .collect()
    if (rows.isEmpty)
      throw new IllegalArgumentException(
        s"IVF centroids: input has no rows — cannot sample $nCells centroids")
    rows.map(_.getSeq[Double](0).toArray)
  }

  /** Nearest-centroid id for each row's vector, via the native
    * [[graft.functions.NearestCell]] expression — one codegen'd kernel
    * over the centroid matrix. (The composed form — per-cell VectorDots +
    * `array_min` over (score, cell) structs — compares struct elements
    * through an interpreted ordering per row×cell: the round-1 perf-cliff
    * pattern, measured poisoning the whole bench JVM.) */
  def assignCell(vecCol: Column, cents: Array[Array[Double]]): Column =
    graft.functions.NearestCell(vecCol, cents)

  /** The nProbe cells closest to the query vector. */
  def probeCells(cents: Array[Array[Double]], query: Array[Double],
                 nProbe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      val d = c.map(x => x * x).sum -
        2.0 * c.zip(query).map { case (x, y) => x * y }.sum
      (d, i)
    }.sortBy(_._1).take(nProbe).map(_._2).toSeq

  /** IVF top-k: probe the closest cells, rank by exact cosine.
    * Output: (id, score), highest first. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Double], k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "need 1 <= nProbe <= nCells")
    val cents = centroids(df, idCol, vecCol, nCells, seed)
    val probes = probeCells(cents, query, nProbe)
    df.withColumn("__cell", assignCell(col(vecCol), cents))
      .filter(col("__cell").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** The materialized index table: input columns + `cell` — what a
    * persistent deployment writes out partitioned/bucketed by cell so
    * probe filters prune storage. */
  def indexTable(df: DataFrame, idCol: String, vecCol: String,
                 nCells: Int = 16, seed: Long = 42L): DataFrame =
    df.withColumn("cell",
      assignCell(col(vecCol), centroids(df, idCol, vecCol, nCells, seed)))
}
