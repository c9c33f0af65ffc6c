package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Bpe
import graft.sources.Tables

/** Measures the batched BPE induction: wall time and realized merges
  * per round for growing merge budgets, batched (default 64) vs serial
  * (batch=1), on the fixture vocabulary — the evidence that round cost
  * is ~flat in vocabulary size (each round is one pair-count job
  * regardless of how many merges it commits) and that total induction
  * time scales with ROUNDS, not merges.
  * `sbt "runMain graft.tools.BpeTune <sfDir>"` */
object BpeTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = Bpe.wordCounts(
        Tables.load(spark, sfDir, "documents"), "text")
      .localCheckpoint()
    println(s"=== $sfDir vocabulary: ${words.count()} words")

    // warm-up (codegen + shuffle paths) outside the timed region
    Bpe.learnMerges(words, numMerges = 4)

    def timeOn(w: org.apache.spark.sql.DataFrame, n: Int,
               batch: Int): (Double, Seq[Bpe.Merge]) = {
      val t0 = System.nanoTime()
      val (merges, fin) = Bpe.learnMerges(w, n, batch)
      fin.unpersist()
      ((System.nanoTime() - t0) / 1e9, merges)
    }

    def sweep(w: org.apache.spark.sql.DataFrame, label: String): Unit = {
      println(f"== $label ==")
      println(f"${"merges"}%8s ${"serial_s"}%9s ${"batched_s"}%10s ${"speedup"}%8s")
      for (n <- Seq(8, 16, 32, 64, 128)) {
        val (ts, ms) = timeOn(w, n, batch = 1)
        val (tb, mb) = timeOn(w, n, batch = 64)
        require(ms == mb,
          s"batched merge TABLE diverged from serial at n=$n:\n$mb\nvs\n$ms")
        println(f"$n%8d $ts%9.2f $tb%10.2f ${ts / tb}%7.1fx")
      }
    }
    sweep(words, s"fixture text vocabulary (${words.count()} words — " +
      "TINY: most top pairs chain, batches stay near 1, speedup is the floor)")

    // richer vocabulary with realistic pair diversity, derived
    // deterministically from the same fixture: md5-hex "words" (16-char
    // alphabet, thousands of distinct words) — the regime a real corpus
    // vocabulary is in, where many top pairs are symbol-disjoint and a
    // round commits tens of merges
    import org.apache.spark.sql.functions._
    val hexWords = Tables.load(spark, sfDir, "documents")
      .select(md5(col("doc_id").cast("string")).as("word"),
        (col("doc_id") % 7 + 1).cast("long").as("wcount"))
      .localCheckpoint()
    sweep(hexWords, s"md5-hex vocabulary (${hexWords.count()} words)")
    spark.stop()
  }
}
