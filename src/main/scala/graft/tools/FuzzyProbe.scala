package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bisection of the text_fuzzy_pairs cost (temporary diagnostic). */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val typod = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("X"),
          substring(col("text"), 6, 1000000)).as("text"))
    val all = docs.unionByName(typod).withColumn("blk", substring(col("text"), 6, 16))
    time("scan+union+blk")(all.count())
    val joined = all.as("a").join(all.as("b"),
      col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
    time("join only")(joined.count())
    time("join+levenshtein")(joined
      .select(levenshtein(col("a.text"), col("b.text")).as("d"))
      .filter(col("d") <= 2).count())
    time("per-row self-levenshtein")(docs
      .select(levenshtein(col("text"), reverse(col("text"))).as("d"))
      .filter(col("d") >= 0).count())
    // the ENTRY shape and its bisection: thresholded lev vs no lev at all
    time("entry: lev(_,_,3)+filter")(joined
      .select(levenshtein(col("a.text"), col("b.text"), 3).as("d"))
      .filter(col("d").between(0, 2)).count())
    time("entry: no-lev control")(joined
      .select((length(col("a.text")) - length(col("b.text"))).as("d"))
      .filter(col("d").between(-2, 2)).count())
    time("thresholded lev x5050")(docs
      .select(levenshtein(col("text"), reverse(col("text")), 3).as("d"))
      .filter(col("d") >= -1).count())
    // how many times does the join context actually EVALUATE the scorer?
    // Caveat: transformation-side accumulators double-count under task
    // retries/speculation, so treat the printed number as an UPPER bound
    // (local[*] with speculation off makes it exact in practice).
    val acc = spark.sparkContext.longAccumulator("calls")
    val counting = udf((a: String, b: String) => { acc.add(1); 0 })
    time("entry: counting udf")(joined
      .select(counting(col("a.text"), col("b.text")).as("d"))
      .filter(col("d") >= 0).count())
    println(s"[probe] scorer invocations in join context: ${acc.value}")
    // same thresholded lev, same 504 pairs, but MATERIALIZED first
    val mat = joined.select(col("a.text").as("ta"), col("b.text").as("tb"))
      .localCheckpoint()
    time("lev(_,_,3) on materialized 504")(mat
      .select(levenshtein(col("ta"), col("tb"), 3).as("d"))
      .filter(col("d").between(0, 2)).count())
    spark.stop()
  }
}
