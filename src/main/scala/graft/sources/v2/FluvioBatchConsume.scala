package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ConsumeOpt, OffsetSpec}

/** Bounded consume THROUGH the DSv2 provider's batch face — one source,
  * two faces, like Spark's Kafka source (VERDICT r12 task 7). The
  * offset window (`-B`/`-H`/`--start`/`-T`/`--end`) resolves INSIDE the
  * source (FluvioBatch's bind-time algebra), `--rows` over an absolute
  * start becomes a dense-offset range predicate that
  * SupportsPushDownFilters turns into row-range pruning at the segment
  * level (the FluvioDuck fast-path filter, now actually pushed), and
  * column projection prunes through SupportsPushDownRequiredColumns
  * (the batch planner runs V2ScanRelationPushDown, unlike the
  * micro-batch planner — DsvPushdownCanarySpec pins both).
  *
  * Scope: the record-shaped consume grammar (offset windows, partition
  * selection, row caps). `-c` mappings and transform chains are
  * plan-level features that compose identically over either scan and
  * stay on the file-source path; `-d` (continuous) belongs to the
  * streaming face. Both are rejected loudly here.
  */
object FluvioBatchConsume {

  def consume(spark: SparkSession, cmd: String, baseDir: String): DataFrame = {
    val opt = ConsumeOpt.parse(cmd) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(o)  => o
    }
    require(!opt.continuous,
      "fluvio batch face: `-d` (continuous) is the streaming face's job")
    require(opt.columns.isEmpty && opt.transforms.isEmpty &&
      opt.transformsFile.isEmpty && opt.smartmodule.isEmpty,
      "fluvio batch face: -c/transform chains compose on top of the " +
        "record scan (plan-level); use FluvioDuck.consume")
    val rel = spark.read.format("fluvio")
      .option("cmd", cmd).option("baseDir", baseDir).load()
    // `--rows` in offset order. Over an absolute start the cap is a pure
    // offset-range FILTER (dense per-partition offsets): it pushes into
    // the source as LessThan(offset) and prunes the planned row ranges —
    // a `-B --rows 500` consume of a deep topic READS ~500 rows. An
    // end-relative window keeps exact sort+limit semantics instead
    // (bounded output; the window is already small by construction).
    val capN = math.min(opt.rows, Int.MaxValue.toLong - 1L)
    val capped = opt.startOffset match {
      case OffsetSpec.FromBeginning(n) => rel.filter(col("offset") < n + capN)
      case OffsetSpec.Absolute(n)      => rel.filter(col("offset") < n + capN)
      case _ => rel.orderBy("partition", "offset").limit(capN.toInt)
    }
    capped.select("offset", "timestamp", "value")
  }
}
