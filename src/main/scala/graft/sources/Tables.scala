package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Central loader for the fixture tables.
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
  * only reads via `spark.sql.legacy.parquet.nanosAsLong` (as a Long of
  * nanos). We flip that conf on the session (runtime-settable) and convert
  * ns → µs TimestampType here, losslessly for the fixture's µs-precision
  * values, so every downstream operator sees a normal TimestampType column.
  */
object Tables {
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(sfDir, name))
    df.schema.fields.foldLeft(df) { (d, f) =>
      // nanosAsLong leaves TIMESTAMP(NANOS) columns as Long nanos: normalize.
      if (f.dataType == LongType && (f.name == "ts"))
        // integer DIV, not `/`: double division loses ULPs at 1e18 ns
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} DIV 1000")))
      else d
    }
  }
}
