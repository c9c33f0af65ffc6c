package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank: star graph concentrates rank on the hub") {
    // 1,2,3 all point at 10; 10 is dangling (its mass redistributes
    // uniformly). The hub must outrank every spoke, spokes tie exactly.
    val e = Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 1L))
      .toDF("src", "dst", "w")
    val r = ranks(Graphs.pagerank(e, iters = 2))
    assert(r.keySet == Set(1L, 2L, 3L, 10L))
    assert(r(1L) == r(2L) && r(2L) == r(3L))
    assert(r(10L) > r(1L))
  }

  test("pagerank: mass is approximately conserved under redistribution") {
    // every node reachable + dangling routed back to the teleport set:
    // total mass stays within integer-floor slack of N * 1e6 (each DIV
    // can only lose, never create, micro units)
    val e = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val r = ranks(Graphs.pagerank(e, iters = 3))
    val total = r.values.sum
    assert(total <= 3L * 1000000L)
    assert(total > 3L * 1000000L - 300L)
  }

  test("pagerank: edge weights shift rank toward the heavier target") {
    // 1 splits 3:1 between 2 and 3; with identical onward structure the
    // heavier edge's target must rank higher
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = ranks(Graphs.pagerank(e, iters = 2))
    assert(r(2L) > r(3L))
  }

  test("pagerank: personalization pins teleport + dangling mass to seeds") {
    // 2-cycle {1,2} plus an isolated-ish sink 3 fed by 1. Seeds = {1}:
    // node 3 gets only damped inflow, never teleport share; node 1 gets
    // the full teleport+dangling share.
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val withSeed = ranks(Graphs.pagerank(e, iters = 2, seeds = Some(seeds)))
    val uniform = ranks(Graphs.pagerank(e, iters = 2))
    assert(withSeed(1L) > uniform(1L))
    assert(withSeed(3L) < uniform(3L))
  }

  test("pagerank: deterministic across runs and partitionings") {
    val e = (0L until 40L).map(i => (i, (i * 7 + 3) % 40, 1L + i % 3))
      .toDF("src", "dst", "w")
    val a = ranks(Graphs.pagerank(e, iters = 2))
    val b = ranks(Graphs.pagerank(e.repartition(7), iters = 2))
    assert(a == b)
  }

  test("pagerank: iters out of range raises loudly") {
    val e = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException](Graphs.pagerank(e, iters = 33))
    assert(ex.getMessage.contains("iters"))
  }

  test("pagerank: deep iteration converges (per-round materialization keeps it cheap)") {
    // 2-cycle with a weighted branch: successive-round movement decays
    // like damping^k (~0.85^k), so by round 8 each rank moves < 0.5% —
    // and the run completes quickly because each round starts from
    // materialized ranks, not lineage
    val e = Seq((1L, 2L, 1L), (2L, 1L, 2L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r8 = ranks(Graphs.pagerank(e, iters = 8))
    val r9 = ranks(Graphs.pagerank(e, iters = 9))
    r8.keys.foreach { k =>
      assert(math.abs(r8(k) - r9(k)) <= math.max(r8(k) / 200, 1500),
        s"node $k: ${r8(k)} vs ${r9(k)}")
    }
  }
}
