package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("clusters: min-label components over chains, pairs, singleton-free") {
    // chain 20-21-22-23 needs multiple propagation rounds; 1-2-3 a
    // triangle-free path; (10,11) a plain pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("clusters: converges on a long chain within maxIter") {
    // path 0-1-2-...-12: diameter 12, min label must flood end to end
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs, maxIter = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 12L).toSet)
  }

  test("clusters: empty pair set returns empty, not an NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(empty).collect().isEmpty)
  }

  test("clusters: non-convergence within maxIter raises loudly") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](Dedup.clusters(pairs, maxIter = 3))
    assert(e.getMessage.contains("not converged"))
  }

  test("hashSample: deterministic, rate ≈ sixteenths/16, subset-monotone") {
    val df = (0L until 4000L).toDF("id")
    val s4 = Sampling.hashSample(df, "id", 4).collect().map(_.getLong(0)).toSet
    val s4again = Sampling.hashSample(df, "id", 4).collect().map(_.getLong(0)).toSet
    assert(s4 == s4again) // deterministic
    assert(math.abs(s4.size / 4000.0 - 0.25) < 0.05)
    val s8 = Sampling.hashSample(df, "id", 8).collect().map(_.getLong(0)).toSet
    assert(s4.subsetOf(s8)) // growing the rate only ADDS rows
  }

  test("stratifiedHashSample: per-stratum rates; absent strata drop") {
    val df = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "und" else "de"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 16, "und" -> 4)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("de", 0) == 0)           // absent stratum drops
    assert(byLang("en") == 1000)                     // 16/16 keeps all
    assert(math.abs(byLang("und") / 1000.0 - 0.25) < 0.08)
  }
}
