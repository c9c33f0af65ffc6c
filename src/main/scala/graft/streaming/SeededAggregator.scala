package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `aggregate_initial` analog: an aggregate seeded with an explicit initial
  * accumulator value, like the reference's aggregate-type SmartModule
  * (`--aggregate-initial`, `/root/reference/src/consume.rs:511-513`,
  * `:687-695` — the seed bytes become the starting accumulator on the
  * server).
  *
  * Modeled as a typed `Aggregator[String, String, String]` whose zero is
  * the seed and whose reduce step appends each record's value — the same
  * fold the reference's docs describe for aggregate SmartModules. Usable in
  * batch (`ds.select(agg.toColumn)`) and streaming
  * (`groupByKey.agg(agg.toColumn)`) alike.
  */
final case class SeededConcatAggregator(seed: String, sep: String = "")
    extends Aggregator[String, String, String] {
  // partials fold with an empty zero; the seed is applied exactly once at
  // finish — keeps merge associative regardless of partitioning
  override def zero: String = ""
  override def reduce(acc: String, v: String): String =
    if (acc.isEmpty) v else acc + sep + v
  override def merge(a: String, b: String): String =
    if (a.isEmpty) b else if (b.isEmpty) a else a + sep + b
  override def finish(acc: String): String =
    if (seed.isEmpty) acc else if (acc.isEmpty) seed else seed + sep + acc
  override def bufferEncoder: Encoder[String] = Encoders.STRING
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Seeded numeric fold: sum starting from an initial accumulator. */
final case class SeededSumAggregator(seed: Double)
    extends Aggregator[Double, Double, Double] {
  override def zero: Double = 0.0 // seed applied once in finish
  override def reduce(acc: Double, v: Double): Double = acc + v
  override def merge(a: Double, b: Double): Double = a + b
  override def finish(acc: Double): Double = seed + acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
