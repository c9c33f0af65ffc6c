package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental URL-admission lifecycle (the minhash-store pattern on
  * the URL axis): canonical-URL state persists, new crawls gate through
  * a left-anti join, survivors append, compaction changes nothing
  * observable. */
class UrlStoreSpec extends SparkSpec {
  import spark.implicits._

  private def admitted(batch: org.apache.spark.sql.DataFrame, path: String) =
    Dedup.urlStoreAdmit(batch, "doc_id", "url", path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("url admission lifecycle: variants of a seen page are rejected, novel pages admitted and persisted") {
    val dir = java.nio.file.Files.createTempDirectory("url_store_")
    try {
      val path = dir.resolve("urls").toString
      Dedup.urlStoreWrite(Seq(
        (1L, "https://a.com/page/1"),
        (2L, "https://b.com/x?id=2")
      ).toDF("doc_id", "url"), "url", path)

      // batch: two VARIANTS of stored pages (case/www/port/tracking/
      // fragment mess), one truly novel page crawled twice under two
      // variants — only the novel page survives, once, with min id
      val batch = Seq(
        (10L, "HTTPS://WWW.A.com:443/page/1#frag"),
        (11L, "https://b.com/x?utm_source=s&id=2"),
        (12L, "https://C.com/new/"),
        (13L, "HTTPS://c.com/new")
      ).toDF("doc_id", "url")
      val got = admitted(batch, path)
      assert(got == Set((12L, "https://c.com/new")), got.toString)

      // append the survivors; a re-crawl of the new page is now rejected
      Dedup.urlStoreAppend(
        Seq((12L, "https://C.com/new/")).toDF("doc_id", "url"), "url", path)
      val next = Seq((20L, "https://c.com/new?utm_campaign=x"))
        .toDF("doc_id", "url")
      assert(admitted(next, path).isEmpty)

      // compaction: one clustered file, identical admission decisions
      val fresh = Seq(
        (30L, "https://c.com/new"),        // seen -> rejected
        (31L, "https://d.com/other")       // novel -> admitted
      ).toDF("doc_id", "url")
      val want = admitted(fresh, path)
      Dedup.urlStoreCompact(spark, path)
      assert(Compaction.dataFileCount(path) == 1)
      assert(admitted(fresh, path) == want)
      assert(want == Set((31L, "https://d.com/other")), want.toString)
    } finally Compaction.deleteRecursively(dir)
  }

  test("admission plan: left-anti join on the canonical string, no cartesian") {
    val dir = java.nio.file.Files.createTempDirectory("url_store_plan_")
    try {
      val path = dir.resolve("urls").toString
      Dedup.urlStoreWrite(Seq((1L, "https://a.com/1"))
        .toDF("doc_id", "url"), "url", path)
      val df = Dedup.urlStoreAdmit(
        Seq((2L, "https://a.com/2")).toDF("doc_id", "url"),
        "doc_id", "url", path)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), plan)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally Compaction.deleteRecursively(dir)
  }
}
