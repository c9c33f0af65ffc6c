package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.load(spark, sf, "documents"))

  test("syntheticMedia: schema contract (binary payload + typed metadata)") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("media_id").dataType.typeName == "long")
    assert(media.count() == 500)
    val kinds = media.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures runs partition-parallel and is deterministic") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.brightness).sameElements(f2.map(_.brightness)))
    val f = f1.head
    assert(f.histogram.length == 16)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9) // normalized histogram
    assert(f.n_bytes > 0)
    assert(f.brightness > 0 && f.brightness < 1)
  }

  test("video frame sampling derives from duration; others sample 1") {
    val feats = Multimodal.extractFeatures(media, fps = 2.0).collect()
    val byKind = feats.groupBy(_.kind)
    assert(byKind("image").forall(_.frames_sampled == 1))
    assert(byKind("audio").forall(_.frames_sampled == 1))
    assert(byKind("video").exists(_.frames_sampled > 1))
  }

  test("resizePlan: output dims bounded by maxDim, aspect preserved-ish") {
    val plan = Multimodal.resizePlan(media, 256).collect()
    assert(plan.forall(r => r.getInt(4) <= 256 && r.getInt(5) <= 256))
    // no upscaling: outputs never exceed inputs
    assert(plan.forall(r => r.getInt(4) <= math.max(r.getInt(2), 1)))
  }
}
