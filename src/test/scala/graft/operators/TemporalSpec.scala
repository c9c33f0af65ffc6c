package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // the DuckDB ASOF JOIN reference example (verified against duckdb 1.0):
  //   l: (1,5) (1,10) (2,7) (1,2)   r: (1,3,100) (1,8,200) (2,1,300)
  private def l = Seq((1, 5), (1, 10), (2, 7), (1, 2)).toDF("k", "t")
  private def r = Seq((1, 3, 100), (1, 8, 200), (2, 1, 300))
    .toDF("k", "rt", "v")

  test("asofJoin inner: latest right at-or-before each left ts; no-match rows dropped") {
    val got = Temporal.asofJoin(l, r, Seq("k"), "t", "rt")
      .select("k", "t", "rt", "v").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3))).toSet
    assert(got == Set((1, 5, 3, 100), (1, 10, 8, 200), (2, 7, 1, 300)))
  }

  test("asofJoin left: unmatched left rows survive null-filled") {
    val got = Temporal.asofJoin(l, r, Seq("k"), "t", "rt", joinType = "left")
      .select("k", "t", "v").collect()
      .map(x => (x.getInt(0), x.getInt(1),
        if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSet
    assert(got == Set((1, 2, None), (1, 5, Some(100)),
      (1, 10, Some(200)), (2, 7, Some(300))))
  }

  test("asofJoin tie rule: a right row AT the left timestamp matches") {
    val got = Temporal.asofJoin(
      Seq((1, 8)).toDF("k", "t"), r, Seq("k"), "t", "rt")
      .select("v").head().getInt(0)
    assert(got == 200) // rt=8 matches t=8 (>=), not the earlier rt=3
  }

  test("asofJoin tolerance: stale matches drop (inner) or null-fill (left)") {
    // r has (1, rt=3): within reach of t=5 (gap 2) but stale for t=10 (gap 7)
    val inner = Temporal.asofJoin(l, r, Seq("k"), "t", "rt",
      tolerance = Some(2L))
      .select("k", "t", "v").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).toSet
    assert(inner == Set((1, 5, 100), (1, 10, 200))) // (2,7): rt=1 is 6 stale; (1,2): no prior
    val leftJoin = Temporal.asofJoin(l, r, Seq("k"), "t", "rt",
      joinType = "left", tolerance = Some(2L))
      .select("k", "t", "v").collect()
      .map(x => (x.getInt(0), x.getInt(1),
        if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSet
    assert(leftJoin == Set((1, 2, None), (1, 5, Some(100)),
      (1, 10, Some(200)), (2, 7, None)))
  }

  test("asofJoin tolerance works on TimestampType columns (units: seconds)") {
    def tstamp(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val lt = Seq((1, tstamp(100))).toDF("k", "t")
    val rt = Seq((1, tstamp(95), 10), (1, tstamp(40), 20)).toDF("k", "rt", "v")
    val hit = Temporal.asofJoin(lt, rt, Seq("k"), "t", "rt",
      tolerance = Some(10L)).select("v").collect()
    assert(hit.map(_.getInt(0)).toSeq == Seq(10)) // rt=95 within 10s of t=100
    val miss = Temporal.asofJoin(lt, rt.filter(col("v") === 20), Seq("k"),
      "t", "rt", tolerance = Some(10L)).count()
    assert(miss == 0) // rt=40 is 60s stale
  }

  test("asofJoin rejects reserved internal column names") {
    val e = intercept[IllegalArgumentException](
      Temporal.asofJoin(l.withColumn("__m", lit(1)), r, Seq("k"), "t", "rt"))
    assert(e.getMessage.contains("reserved"))
  }

  test("asofJoin rejects overlapping non-key column names") {
    val e = intercept[IllegalArgumentException](
      Temporal.asofJoin(l, r.withColumnRenamed("v", "t"), Seq("k"), "t", "rt"))
    assert(e.getMessage.contains("disjoint"))
  }

  test("rangeJoin: inclusive bounds, bin boundaries, negatives") {
    val points = Seq((1, -4.0), (2, 0.0), (3, 3.9), (4, 4.0), (5, 12.0))
      .toDF("id", "p")
    val ranges = Seq((10, -5.0, -3.0), (11, 0.0, 4.0), (12, 3.5, 12.0))
      .toDF("rid", "lo", "hi")
    val got = Temporal.rangeJoin(points, "p", ranges, "lo", "hi", binWidth = 4.0)
      .select("id", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(got == Set(
      (1, 10),           // -4 in [-5,-3] (negative bins)
      (2, 11),           // 0 at the lo boundary
      (3, 11), (3, 12),  // 3.9 in both overlapping ranges
      (4, 11), (4, 12),  // 4.0 at hi boundary of one, inside the other
      (5, 12)))          // 12.0 at hi boundary, crosses 3 bins
  }

  test("rangeJoin salted: identical output on a one-bin-dominant fixture") {
    // hot-bin shape: 2,000 of 2,010 points land in bin 0 ([0,4)), ranges
    // overlap it — the exact pathological distribution the salt spreads
    val points = ((0 until 2000).map(i => (i, (i % 39) / 10.0)) ++
      (2000 until 2010).map(i => (i, 10.0 + i % 7))).toDF("id", "p")
    val ranges = Seq((10, 0.0, 1.5), (11, 1.0, 3.9), (12, 2.0, 16.0),
      (13, 11.0, 12.0)).toDF("rid", "lo", "hi")
    def run(s: Int) = Temporal.rangeJoin(points, "p", ranges, "lo", "hi",
        binWidth = 4.0, saltBuckets = s)
      .select("id", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    val unsalted = run(1)
    assert(unsalted.nonEmpty && unsalted.size > 2000, s"fixture too thin: ${unsalted.size}")
    assert(run(8) == unsalted, "saltBuckets=8 changed the pair set")
    // salt column never leaks into the output
    assert(!Temporal.rangeJoin(points, "p", ranges, "lo", "hi",
      binWidth = 4.0, saltBuckets = 8).columns.contains("__salt"))
    // reserved-name and bounds contracts
    intercept[IllegalArgumentException](Temporal.rangeJoin(
      points, "p", ranges, "lo", "hi", 4.0, saltBuckets = 0))
    intercept[IllegalArgumentException](Temporal.rangeJoin(
      points.withColumn("__salt", lit(1)), "p", ranges, "lo", "hi", 4.0,
      saltBuckets = 2))
  }

  test("asofJoin: duplicate right rows at the same (key, ts) resolve deterministically") {
    val dup = Seq((1, 5, 100), (1, 5, 200), (1, 5, 300)).toDF("k", "rt", "v")
    def run() = Temporal.asofJoin(
      Seq((1, 7)).toDF("k", "t").repartition(4), dup.repartition(4),
      Seq("k"), "t", "rt").select("v").head().getInt(0)
    val first = run()
    assert((1 to 5).forall(_ => run() == first), "tie pick varied across runs")
  }

  test("rangeJoin rejects overlapping non-key columns and reserved __bin") {
    val points = Seq((1, 2.0)).toDF("id", "p")
    val e = intercept[IllegalArgumentException](
      Temporal.rangeJoin(points, "p",
        Seq((1, 0.0, 4.0)).toDF("id", "lo", "hi"), "lo", "hi", 4.0))
    assert(e.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException](
      Temporal.rangeJoin(points.withColumn("__bin", lit(1)), "p",
        Seq((0.0, 4.0)).toDF("lo", "hi"), "lo", "hi", 4.0))
    assert(e2.getMessage.contains("__bin"))
  }

  test("rangeJoin: a degenerate range fails loudly before exploding") {
    val points = Seq((1, 5.0)).toDF("id", "p")
    val degenerate = Seq((10, 0.0, 1e12)).toDF("rid", "lo", "hi")
    val e = intercept[Exception](
      Temporal.rangeJoin(points, "p", degenerate, "lo", "hi",
        binWidth = 1.0).count())
    assert(e.getMessage.contains("widen binWidth") ||
      Option(e.getCause).exists(_.getMessage.contains("widen binWidth")),
      e.toString)
    // the same call with an adequate binWidth succeeds
    assert(Temporal.rangeJoin(points, "p", degenerate, "lo", "hi",
      binWidth = 1e9).count() == 1)
  }

  test("rangeJoin: an inverted range (hi < lo) yields no pairs and no fan-out") {
    val points = Seq((1, 5.0)).toDF("id", "p")
    // lo >> hi: sequence(loBin, hiBin) would auto-step -1 into ~1e12
    // descending bin rows without the inverted-range branch; with it, the
    // range simply matches nothing (BETWEEN semantics) at zero cost
    val inverted = Seq((10, 1e12, 0.0)).toDF("rid", "lo", "hi")
    assert(Temporal.rangeJoin(points, "p", inverted, "lo", "hi",
      binWidth = 1.0).count() == 0)
    // mixed with a valid range: the valid one still matches
    val mixed = Seq((10, 1e12, 0.0), (11, 0.0, 10.0)).toDF("rid", "lo", "hi")
    val got = Temporal.rangeJoin(points, "p", mixed, "lo", "hi",
      binWidth = 4.0).select("rid").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(11))
  }

  test("asofJoin: NULL keys never match (DuckDB equi-key semantics)") {
    val ln = Seq((Some(1), 5), (None, 5)).toDF("k", "t")
    val rn = Seq((Some(1), 3, 100), (None, 3, 999)).toDF("k", "rt", "v")
    // inner: the null-key left row has no legal match and drops
    val inner = Temporal.asofJoin(ln, rn, Seq("k"), "t", "rt")
      .select("k", "v").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(inner == Set((1, 100)))
    // left: it survives null-filled, never paired with the null-key right
    val lj = Temporal.asofJoin(ln, rn, Seq("k"), "t", "rt", joinType = "left")
      .select("k", "v").collect()
      .map(x => (if (x.isNullAt(0)) None else Some(x.getInt(0)),
        if (x.isNullAt(1)) None else Some(x.getInt(1)))).toSet
    assert(lj == Set((Some(1), Some(100)), (None, None)))
  }

  test("asofJoinBucketed equals asofJoin on a one-key-dominant fixture (inner/left/tolerance)") {
    // 9 of 10 rows carry ONE key — the shape that makes the one-pass
    // form's per-key window a single hot partition. Left timestamps step
    // by 13, right marks by 29, so buckets of width 50 exercise all the
    // seams: empty buckets (carry-in skips them), buckets with right rows
    // but no left rows, in-bucket matches AND cross-bucket carry.
    val hotL = (0 until 900).map(i => (1, i * 13)) ++ (0 until 100).map(i => (2, i * 13))
    val hotR = (0 until 100).map(i => (1, i * 29, i)) ++ (0 until 11).map(i => (2, i * 97, 1000 + i))
    val lSkew = hotL.toDF("k", "t")
    val rSkew = hotR.toDF("k", "rt", "v")
    for ((jt, tol) <- Seq(("inner", None), ("left", None),
                          ("inner", Some(40L)), ("left", Some(40L)))) {
      val base = Temporal.asofJoin(lSkew, rSkew, Seq("k"), "t", "rt", jt, tol)
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      val bucketed = Temporal.asofJoinBucketed(lSkew, rSkew, Seq("k"), "t", "rt",
        bucketWidth = 50.0, joinType = jt, tolerance = tol)
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      assert(bucketed.toSeq == base.toSeq, s"divergence at joinType=$jt tol=$tol")
    }
  }

  test("asofJoinBucketed: DuckDB reference example, ties, and null keys") {
    // same reference fixture as the one-pass tests, tiny bucket width so
    // nearly every match crosses a bucket boundary (carry-in path)
    val got = Temporal.asofJoinBucketed(l, r, Seq("k"), "t", "rt", bucketWidth = 2.0)
      .select("k", "t", "rt", "v").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3))).toSet
    assert(got == Set((1, 5, 3, 100), (1, 10, 8, 200), (2, 7, 1, 300)))
    // tie rule: a right row AT the left ts matches (same-bucket ordering)
    val tie = Temporal.asofJoinBucketed(
      Seq((1, 8)).toDF("k", "t"), r, Seq("k"), "t", "rt", bucketWidth = 3.0)
      .select("v").head().getInt(0)
    assert(tie == 200)
    // null keys never match, in either bucket role
    val ln = Seq((Some(1), 5), (None, 5)).toDF("k", "t")
    val rn = Seq((Some(1), 3, 100), (None, 3, 999)).toDF("k", "rt", "v")
    val inner = Temporal.asofJoinBucketed(ln, rn, Seq("k"), "t", "rt", bucketWidth = 2.0)
      .select("k", "v").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(inner == Set((1, 100)))
    // duplicate right rows at one (key, ts) resolve to the same winner as
    // the one-pass form (shared hash tiebreak), across partitionings
    val dup = Seq((1, 5, 100), (1, 5, 200), (1, 5, 300)).toDF("k", "rt", "v")
    val one = Temporal.asofJoin(
      Seq((1, 7)).toDF("k", "t"), dup, Seq("k"), "t", "rt")
      .select("v").head().getInt(0)
    val bk = Temporal.asofJoinBucketed(
      Seq((1, 7)).toDF("k", "t").repartition(4), dup.repartition(4),
      Seq("k"), "t", "rt", bucketWidth = 2.0).select("v").head().getInt(0)
    assert(bk == one)
  }

  test("rangeJoin with key columns scopes matches to the key") {
    val points = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "p")
    val ranges = Seq(("a", 0.0, 10.0)).toDF("g", "lo", "hi")
    val got = Temporal.rangeJoin(points, "p", ranges, "lo", "hi",
      binWidth = 4.0, keyCols = Seq("g"))
      .select("g").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a"))
  }
}
