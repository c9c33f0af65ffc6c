package graft.operators

import graft.SparkSpec

/** Pins the RRF fusion semantics (operators/Retrieval.scala): integer
  * ppb contributions, missing-rank handling, determinism. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def fuse(a: Seq[(Long, Long)], b: Seq[(Long, Long)],
                   topN: Int = 20): Seq[(Long, Long, Long, Long, Int)] =
    Retrieval.rrfFuse(
      a.toDF("doc_id", "rk"), b.toDF("doc_id", "rk"), "doc_id",
      kRrf = 60, topN = topN)
      .orderBy("rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSeq

  test("integer ppb contributions: 1e9 div (rank+60), summed across lists") {
    val out = fuse(Seq((1L, 1L)), Seq((1L, 2L)))
    // 1e9 div 61 = 16393442; 1e9 div 62 = 16129032
    assert(out == Seq((1L, 1L, 2L, 16393442L + 16129032L, 1)), out.toString)
  }

  test("a doc in both lists beats a top-ranked doc in one list") {
    // doc 1: rank 3 in both -> 2 * (1e9 div 63) = 31746030
    // doc 2: rank 1 lexical only -> 1e9 div 61 = 16393442
    val out = fuse(Seq((1L, 3L), (2L, 1L)), Seq((1L, 3L)))
    assert(out.map(_._1) == Seq(1L, 2L), out.toString)
    assert(out.head._4 == 2L * (1000000000L / 63), out.toString)
  }

  test("missing ranks report 0 and contribute nothing; full outer keeps both sides") {
    val out = fuse(Seq((1L, 1L)), Seq((2L, 1L)))
    // tie at 1e9 div 61 each -> id tie-break
    assert(out == Seq(
      (1L, 1L, 0L, 16393442L, 1), (2L, 0L, 1L, 16393442L, 2)), out.toString)
  }

  test("hybrid entry: fused top-20, deterministic, consistent with its input ranks") {
    val rows = graft.queries.Pipeline.queries("retrieval_rrf_hybrid")(spark, sf)
      .collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse, "fused list must be rrf-descending")
    // every fused row carries at least one real rank, and every
    // contribution reconstructs from the reported ranks exactly
    for (r <- rows) {
      val (rkText, rkVec, ppb) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rkText > 0 || rkVec > 0)
      val expect = (if (rkText > 0) 1000000000L / (rkText + 60) else 0L) +
        (if (rkVec > 0) 1000000000L / (rkVec + 60) else 0L)
      assert(ppb == expect, s"row $r")
    }
  }

  test("mmrRerank: diversity beats redundancy at λ=0.7; pure relevance would not") {
    // 3-D geometry: a is the top hit; b is slightly less relevant but
    // nearly identical to a (sim ≈ 0.999); c is less relevant than b
    // but DIVERSE from a (sim ≈ 0.88). Pure relevance ranks a,b,c —
    // MMR must rank a,c,b because b's redundancy penalty exceeds its
    // relevance edge: sc_b = 7·rel_b − 3·sim_ab < sc_c = 7·rel_c − 3·sim_ac.
    val q = Array(1.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, Seq(0.950f, 0.312f, 0.000f)),  // a: rel ≈ .950
      (2L, Seq(0.940f, 0.341f, 0.000f)),  // b: rel ≈ .940, sim(a,b) ≈ .9995
      (3L, Seq(0.930f, 0.000f, 0.368f))   // c: rel ≈ .930, sim(a,c) ≈ .883
    ).toDF("vec_id", "embedding")
    val got = Retrieval.mmrRerank(vecs, "vec_id", "embedding", q,
        shortlist = 3, k = 3, lambdaTenths = 7)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L), got.mkString(", "))
    // the seed's score is λ·rel with no penalty term
    assert(got(0)._4 == 7L * got(0)._3, got(0).toString)
    // every later score is λ·rel − (1−λ)·maxsim < λ·rel
    assert(got.drop(1).forall(r => r._4 < 7L * r._3), got.mkString(", "))
    // deterministic across invocations (integer argmax, fixed tie-break)
    val again = Retrieval.mmrRerank(vecs, "vec_id", "embedding", q,
        shortlist = 3, k = 3, lambdaTenths = 7)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == again.toSeq)
  }
}
