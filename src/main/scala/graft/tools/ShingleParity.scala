package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-off parity check: native WordShingles vs the round-1 composed
  * higher-order-function form, row-for-row on a fixture table. */
object ShingleParity {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    val n = 3
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val toks = split(norm, " ")
    val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    val old = docs.select(col("doc_id").as("id"),
      explode(array_distinct(grams)).as("shingle"))
    val neu2 = graft.operators.Dedup.shingles(docs, "doc_id", "text", n)

    val oldCount = old.count(); val neuCount = neu2.count()
    val d1 = old.exceptAll(neu2).count(); val d2 = neu2.exceptAll(old).count()
    println(s"PARITY old=$oldCount new=$neuCount oldMinusNew=$d1 newMinusOld=$d2")
    spark.stop()
  }
}
