package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The native Count-Min Sketch aggregate ([[CmsAgg]]) and its driver-side
  * probe accessor. The engine-portable md5 variant is oracle-proven in the
  * gate (sketch_cms_portable / sketch_cms_estimates); here we pin the
  * production seeded-XXH64 path: the one-sided error guarantee, exactness
  * for isolated keys, partitioning independence (pure counting), and the
  * total-mass invariant.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def sketchAndExact: (Array[Long], Map[String, Long]) = {
    val row = TextAnalysis.cmsSketch(docs, "text", depth, width).head()
    val sketch = row.getSeq[Long](0).toArray
    val exact = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    (sketch, exact)
  }

  test("CMS point estimates are a one-sided upper bound on every true count") {
    val (sketch, exact) = sketchAndExact
    exact.foreach { case (tok, n) =>
      val est = SketchAggregates.cmsEstimate(sketch, depth, width, tok)
      assert(est >= n, s"CMS under-counted '$tok': est=$est exact=$n")
    }
  }

  test("total sketch mass per row equals the token count (pure counting)") {
    val (sketch, exact) = sketchAndExact
    val total = exact.values.sum
    (0 until depth).foreach { r =>
      val rowMass = (0 until width).map(c => sketch(r * width + c)).sum
      assert(rowMass === total,
        s"row $r mass $rowMass != total tokens $total")
    }
  }

  test("sketch is partitioning-independent") {
    val a = TextAnalysis.cmsSketch(docs.repartition(1), "text", depth, width)
      .head().getSeq[Long](0)
    val b = TextAnalysis.cmsSketch(docs.repartition(13), "text", depth, width)
      .head().getSeq[Long](0)
    assert(a === b)
  }

  test("an isolated key with no all-row collisions estimates exactly") {
    // planted corpus: one heavy hitter + a unique singleton; with 4 rows
    // of width 64 over 3 distinct keys, some row isolates each key
    val planted = Seq.fill(500)("aaa").map(t => (0L, t)) ++
      Seq((1L, "rare-needle")) ++ Seq.fill(20)("bbb").map(t => (2L, t))
    val df = planted.toDF("doc_id", "text")
    val row = TextAnalysis.cmsSketch(df, "text", depth, width).head()
    val sketch = row.getSeq[Long](0).toArray
    assert(SketchAggregates.cmsEstimate(sketch, depth, width, "aaa") === 500L)
    assert(SketchAggregates.cmsEstimate(sketch, depth, width, "rare-needle") === 1L)
    assert(SketchAggregates.cmsEstimate(sketch, depth, width, "bbb") === 20L)
    // an absent key can only pick up collision mass — never invent more
    // than the heaviest colliding counter
    assert(SketchAggregates.cmsEstimate(sketch, depth, width, "absent") <= 500L)
  }

  test("shard sketches merge by element-wise ADD into the whole-corpus sketch") {
    val whole = TextAnalysis.cmsSketch(docs, "text", depth, width)
      .head().getSeq[Long](0).toArray
    val shardA = TextAnalysis.cmsSketch(docs.filter(col("doc_id") % 2 === 0),
      "text", depth, width).head().getSeq[Long](0).toArray
    val shardB = TextAnalysis.cmsSketch(docs.filter(col("doc_id") % 2 =!= 0),
      "text", depth, width).head().getSeq[Long](0).toArray
    val merged = shardA.zip(shardB).map { case (a, b) => a + b }
    assert(merged.toSeq === whole.toSeq,
      "cross-shard CMS merge must equal the whole-corpus sketch")
  }

  test("cmsSketch reports n_tokens = corpus token count") {
    val (_, exact) = sketchAndExact
    val n = TextAnalysis.cmsSketch(docs, "text", depth, width)
      .head().getLong(1)
    assert(n === exact.values.sum)
  }
}
