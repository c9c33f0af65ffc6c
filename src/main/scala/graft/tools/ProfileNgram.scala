package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** A/B the ngramJaccard shuffle-key width at sf1: string shingle keys
  * vs xxhash64(shingle) long keys through census + self-join + pair agg
  * (the dedup_clusters / dedup_ngram_jaccard cost center). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark,
      args.headOption.getOrElse("/root/repo/fixtures/sf1"), "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def run(hashKeys: Boolean): Long = {
      val sh0 = Dedup.shingles(docs, "doc_id", "text", 3)
      val sh = if (hashKeys) sh0.select(col("id"), xxhash64(col("shingle")).as("fp"))
               else sh0.select(col("id"), col("shingle").as("fp"))
      val stop = sh.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000L).select("fp")
      val filtered = sh.join(broadcast(stop), Seq("fp"), "left_anti")
      val sizes = filtered.groupBy("id").agg(count(lit(1)).as("sz"))
      val inter = filtered.as("l").hint("shuffle_hash")
        .join(filtered.as("r"), Seq("fp"))
        .filter(col("l.id") < col("r.id"))
        .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      val scored = inter
        .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
        .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      scored.count()
    }
    // min-of-N discipline: the host has roaming stall windows that
    // inflate single passes 2-10x; alternate variants and report mins
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    var rows = (0L, 0L)
    for (i <- 1 to 5) {
      println(s"== pass $i")
      val t0 = System.nanoTime(); val a = run(hashKeys = false)
      val ta = (System.nanoTime() - t0) / 1e9; as += ta
      val t1 = System.nanoTime(); val b = run(hashKeys = true)
      val tb = (System.nanoTime() - t1) / 1e9; bs += tb
      println(f"  string=$ta%.2f hashed=$tb%.2f rows ${if (a == b) "MATCH" else "DIVERGE"}")
      rows = (a, b)
    }
    println(f"MIN string=${as.min}%.2f s  hashed=${bs.min}%.2f s  rows=${rows._1}")
    spark.stop()
  }
}
