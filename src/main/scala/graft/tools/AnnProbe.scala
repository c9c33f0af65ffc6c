package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnModels, Compaction, Ivf, Similarity}
import graft.sources.Tables

/** Decomposition probe for the emb_label_noise_ann regression (VERDICT
  * r14 task 3): times the entry's sub-shapes solo, min-of-N in one
  * window, so the suspect (candidate generation vs top-k formulation vs
  * vote tail) is identified by measurement instead of archaeology.
  *
  *   sbt "runMain graft.tools.AnnProbe [sfDir] [reps]"
  *
  * Shapes (bench session config; the index artifact builds once per JVM
  * and is excluded via a warm-up rep, exactly like the entry itself):
  *   candidates  — probed (qid,cell) join + cosine scoring, no ranking
  *   agg_topk    — candidates + the shipped TopKAgg ranking
  *   win_topk    — candidates + the r13 window ranking (row_number<=k)
  *   entry       — the full declared query
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    // build the same artifact the entry builds (outside the timed reps)
    val tmp = java.nio.file.Files.createTempDirectory("annprobe_").toString
    val nCells = Similarity.nCellsFor(e.count(), targetClusterSize = 64L)
    val cents = Ivf.centroidsRefined(e, "vec_id", "embedding", nCells)
    val op = Ivf.deriveOperatingPoint(e, "vec_id", "embedding", cents, k = 5)
    Ivf.indexTableMulti(e, "vec_id", "embedding", cents, depth = op.depth)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/index")
    AnnModels.saveCentroids(spark, tmp, cents)
    println(s"[annprobe] nCells=$nCells depth=${op.depth} nProbe=${op.nProbe} " +
      s"volume=${op.volume}")

    val index = Compaction.readLive(spark, s"$tmp/index")
    val q = e
      .filter(substring(md5(col("vec_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3"))
      .select(col("vec_id").as("qid2"), col("label").as("qlabel"),
        col("embedding").as("qv"))

    // the candidate subtree exactly as ivfBatchTopK builds it
    def candidates(): DataFrame = {
      import graft.functions.VectorFunctions._
      val centTable = broadcast(
        cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
          .toDF("__cell", "__cvec")
          .withColumn("__c2", expr("aggregate(__cvec, 0d, (a, x) -> a + x * x)")))
      val probed = q.select(col("qid2").as("qid"), col("qv")).crossJoin(centTable)
        .withColumn("__d", col("__c2") - lit(2.0) * dot(col("__cvec"), col("qv")))
        .withColumn("__pr", row_number().over(
          Window.partitionBy("qid").orderBy(col("__d").asc, col("__cell").asc)))
        .filter(col("__pr") <= op.nProbe)
        .select(col("qid"), col("qv"), col("__cell").as("cell"))
      val cand = probed.join(index, "cell")
      cand.filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("embedding"), col("qv")), 6).as("score"))
    }

    def aggTopK(): DataFrame =
      candidates().groupBy("qid")
        .agg(graft.functions.TopKAggregates.topk(
          col("score"), col("vec_id"), lit(null).cast("long"), 5).as("__top"))
        .select(col("qid"), posexplode(col("__top")))
        .select(col("qid"), col("col.id").as("vec_id"),
          col("col.score").as("score"), (col("pos") + 1).as("rk"))

    def winTopK(): DataFrame =
      candidates()
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)))
        .filter(col("rk") <= 5)

    def entry(): DataFrame =
      graft.SparkEntry.queries("emb_label_noise_ann")(spark, sfDir)

    val all: Seq[(String, () => DataFrame)] = Seq(
      "candidates" -> (() => candidates()),
      "agg_topk" -> (() => aggTopK()),
      "win_topk" -> (() => winTopK()),
      "cal" -> (() => graft.Bench.calibrationDf(spark)),
      "entry" -> (() => entry()),
      "entry_full" -> (() => entry()),
      "win_full" -> (() => winTopK()),
      "agg_full" -> (() => aggTopK()))
    // optional third arg: comma list restricting/ordering the shapes
    val shapes = args.lift(2) match {
      case Some(spec) =>
        val want = spec.split(",").map(_.trim)
        want.flatMap(n => all.find(_._1 == n)).toSeq
      case None => all
    }
    // warm-up (codegen + the entry's own artifactDir build)
    shapes.foreach { case (_, f) => graft.Bench.timeNoop(f()) }
    // NOTE the timing split: plain shapes time EXECUTION only (f() is
    // evaluated before timeNoop starts the clock); the `_full` variants
    // time construction + execution — the bench/MoversCheck contract,
    // which includes the entry's per-invocation setup jobs (centroid
    // parquet load, operating-point read, index dir listing, analysis).
    def timeFull(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, f) <- shapes) {
      val t = if (name.endsWith("_full")) timeFull(f)
              else graft.Bench.timeNoop(f())
      times(name) = t :: times.getOrElse(name, Nil)
    }
    for ((name, _) <- shapes) {
      val ts = times(name).reverse
      println(f"[annprobe] $name%-12s min=${ts.min}%6.3f  " +
        ts.map(t => f"$t%5.2f").mkString(" "))
    }
    spark.stop()
  }
}
