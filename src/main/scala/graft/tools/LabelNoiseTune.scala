package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ivf
import graft.sources.Tables

/** Operating-point probe for the batch-kNN label-noise audit: for each
  * (nCells, nProbe, assign-depth) config, how many md5-quarter-sample
  * queries have their ENTIRE exact top-5 inside the probed cells — the
  * condition for the ANN entry to hash-match the brute-force oracle.
  * Assign-depth d > 1 indexes every vector under its d nearest cells
  * (redundant coarse quantization): candidate volume scales ×d, recall
  * at fixed nProbe jumps — the standard spill-tree/multi-assign trade.
  * Usage: `runMain graft.tools.LabelNoiseTune [sfDir]` */
object LabelNoiseTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val qs = e.filter { case (id, _) =>
      "0123".contains(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString.head) }
    println(s"n=${e.length} queries=${qs.length}")

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // exact top-5 per query (round to 1e-6 like the entry; ties by id)
    val top5 = qs.map { case (qid, qv) =>
      qid -> e.filter(_._1 != qid)
        .map { case (tid, tv) => (math.rint(cosine(tv, qv) * 1e6) / 1e6, tid) }
        .sortBy { case (s, tid) => (-s, tid) }.take(5).map(_._2).toSet
    }.toMap

    val df = Tables.load(spark, sfDir, "embeddings")
    for (nCells <- Seq(8, 16, 32); depth <- Seq(1, 2, 3)) {
      val cents = Ivf.centroidsRefined(df, "vec_id", "embedding", nCells)
      def nearestCells(v: Array[Double], k: Int): Seq[Int] =
        Ivf.probeCells(cents, v, k)
      // vector -> its depth assigned cells
      val assigned: Map[Long, Set[Int]] =
        e.map { case (id, v) => id -> nearestCells(v, depth).toSet }.toMap
      val line = (1 to nCells).map { nProbe =>
        val nOk = qs.count { case (qid, qv) =>
          val probed = nearestCells(qv, nProbe).toSet
          top5(qid).forall(t => assigned(t).exists(probed.contains))
        }
        s"$nProbe:$nOk"
      }.mkString(" ")
      println(s"nCells=$nCells depth=$depth  (nProbe:queriesFullyCovered/${qs.length})  $line")
    }
    spark.stop()
  }
}
