package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The `-d` (continuous) flavor of `--aggregate-initial`: a keyed running
  * accumulator over an unbounded stream, maintained with
  * `mapGroupsWithState` — each micro-batch folds its new records into the
  * per-key state, which starts from the explicit seed (the reference's
  * aggregate-type SmartModule semantics,
  * `/root/reference/src/consume.rs:511-513`, `:687-695`; batch/bounded
  * counterpart: [[SeededConcatAggregator]]).
  *
  * State is one accumulator per key — O(keys), not O(records); pair with
  * a timeout or watermark if the key space is unbounded.
  */
object StatefulAggregate {

  /** Running seeded concat per key: emits (key, accumulator-so-far) every
    * micro-batch that touches the key. Requires Update output mode. */
  def runningSeededConcat(records: Dataset[(String, String)],
                          seed: String, sep: String = ""): Dataset[(String, String)] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_._1)
      .mapGroupsWithState[String, (String, String)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state) =>
          var acc = state.getOption.getOrElse(seed)
          rows.foreach { case (_, v) =>
            acc = if (acc.isEmpty) v else acc + sep + v
          }
          state.update(acc)
          (key, acc)
      }
  }

  /** Running seeded sum per key — numeric accumulator seeded once. */
  def runningSeededSum(records: Dataset[(String, Double)],
                       seed: Double): Dataset[(String, Double)] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_._1)
      .mapGroupsWithState[Double, (String, Double)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state) =>
          var acc = state.getOption.getOrElse(seed)
          rows.foreach { case (_, v) => acc += v }
          state.update(acc)
          (key, acc)
      }
  }
}
