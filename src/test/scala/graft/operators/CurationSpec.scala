package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wave-13 sub-document curation + training-mix planning:
  * [[Dedup.passageBlocks]], [[TextAnalysis.gopherPanel]],
  * [[Sampling.ccnetBuckets]], and the shuffled-packing /
  * epoch-plan entries. The DuckDB oracles pin the corpus-level
  * values; these tests pin the SEMANTIC contracts (block slicing,
  * rule boundaries, tie handling, prefix-sum consistency) on
  * crafted rows where each rule's edge is exercised on purpose. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val w8a = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val w8b = "india juliet kilo lima mike november oscar papa"

  test("passageBlocks: non-overlapping full 8-word blocks, shared text shares fps") {
    val df = Seq(
      (1L, s"$w8a $w8b"),            // 16 words -> blocks [w8a, w8b]
      (2L, s"$w8a one two three"),   // 11 words -> 1 block  [w8a]
      (3L, "only seven words live in this doc")  // 7 -> no blocks
    ).toDF("doc_id", "text")
    val blocks = Dedup.passageBlocks(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(blocks.count(_._1 == 1L) == 2)
    assert(blocks.count(_._1 == 2L) == 1)
    assert(blocks.count(_._1 == 3L) == 0)
    // doc 1 block 0 and doc 2 block 0 cover the same 8 words -> same fp
    val fp1 = blocks.find(b => b._1 == 1L && b._2 == 0).get._3
    val fp2 = blocks.find(b => b._1 == 2L && b._2 == 0).get._3
    assert(fp1 == fp2)
    // the second block of doc 1 is different text -> different fp
    assert(blocks.find(b => b._1 == 1L && b._2 == 1).get._3 != fp1)
  }

  test("passageBlocks: empty docs emit no blocks even at k=1 (no md5-of-empty phantom)") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val got = Dedup.passageBlocks(df, "doc_id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.map(_._1).toSet == Set(3L), got.mkString(","))
    assert(got.length == 1)
  }

  test("passage census and clean agree: dropped blocks = repeated-fp occurrences") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val blocks = Dedup.passageBlocks(docs, "doc_id", "text", 8)
    val repeatedOcc = blocks.groupBy("fp")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .agg(coalesce(sum("n_occ"), lit(0L))).as[Long].head()
    val dropped = graft.SparkEntry.queries("dedup_passage_clean")(spark, sf)
      .agg(sum("n_dropped_blocks")).as[Long].head()
    assert(dropped == repeatedOcc,
      s"clean dropped $dropped blocks but the census counts $repeatedOcc repeated occurrences")
  }

  test("gopherPanel rule boundaries flip exactly at the documented thresholds") {
    def words(n: Int, w: String = "word") = Seq.fill(n)(w).mkString(" ")
    val df = Seq(
      (1L, words(50)),          // exactly 50 words: r_words passes
      (2L, words(49)),          // one short: r_words fails
      (3L, words(50, "a")),     // 1-char words: mean len 1 < 3 -> r_meanlen fails
      (4L, words(50) + " !!!!!!!!!!"),  // 10 punct chars / ~260 -> under 10%: passes
      (5L, words(20, "!") + " " + words(30)),  // 20/171 chars punct > 10% -> r_symbol fails
      (6L, "the " + words(49) + " of")  // two stopword hits -> r_stop passes
    ).toDF("doc_id", "text")
    val p = TextAnalysis.gopherPanel(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getAs[Boolean]("r_words"))
    assert(!p(2L).getAs[Boolean]("r_words"))
    assert(!p(3L).getAs[Boolean]("r_meanlen"))
    assert(p(1L).getAs[Boolean]("r_meanlen"))
    assert(p(4L).getAs[Boolean]("r_symbol"))
    assert(!p(5L).getAs[Boolean]("r_symbol"))
    assert(p(6L).getAs[Boolean]("r_stop") && p(6L).getAs[Long]("stop_hits") == 2L)
    assert(!p(1L).getAs[Boolean]("r_stop"))  // "word" hits no stop list
    assert(p(6L).getAs[Boolean]("pass"))
  }

  test("ccnetBuckets: value-sliced ties — equal scores share a bucket, thirds otherwise") {
    // distinct scores, 6 rows: exact 2/2/2 split
    val even = Seq(("k", 6L), ("k", 5L), ("k", 4L), ("k", 3L), ("k", 2L), ("k", 1L))
      .toDF("lang", "s")
    val evenB = Sampling.ccnetBuckets(even, "lang", "s")
      .collect().map(r => r.getLong(1) -> r.getAs[String]("bucket")).toMap
    assert(evenB(6L) == "head" && evenB(5L) == "head")
    assert(evenB(4L) == "middle" && evenB(3L) == "middle")
    assert(evenB(2L) == "tail" && evenB(1L) == "tail")
    // a 3-way tie at the top spills past n/3: the WHOLE tie group moves
    // together (never split by row order) into middle
    val tied = Seq(("k", 10L), ("k", 10L), ("k", 10L), ("k", 9L), ("k", 8L), ("k", 7L))
      .toDF("lang", "s")
    val tiedRows = Sampling.ccnetBuckets(tied, "lang", "s")
      .collect().map(r => (r.getLong(1), r.getAs[String]("bucket")))
    assert(tiedRows.filter(_._1 == 10L).map(_._2).distinct.toSeq == Seq("middle"))
    assert(tiedRows.find(_._1 == 9L).get._2 == "middle")  // cum 4*3 = 12 <= 2n
    assert(tiedRows.find(_._1 == 8L).get._2 == "tail")
    assert(tiedRows.find(_._1 == 7L).get._2 == "tail")
  }

  test("ccnetBuckets equals the brute-force value-sliced rule on randomized scores") {
    // deterministic pseudo-random fixture: many keys, heavy ties, the
    // histogram-cut implementation must reproduce the definition
    // (bucket of s = f(#rows scoring >= s) exactly, per key)
    val rng = new scala.util.Random(0xC0FFEE)
    val rows = (1 to 400).map { i =>
      (s"k${rng.nextInt(5)}", rng.nextInt(12).toLong, i.toLong)
    }
    val got = Sampling.ccnetBuckets(rows.toDF("lang", "s", "row_id"), "lang", "s")
      .collect().map(r => r.getAs[Long]("row_id") -> r.getAs[String]("bucket")).toMap
    for ((k, s, id) <- rows) {
      val peers = rows.filter(_._1 == k)
      val n = peers.size
      val cum = peers.count(_._2 >= s)
      val want = if (cum * 3 <= n) "head"
                 else if (cum * 3 <= n * 2) "middle" else "tail"
      assert(got(id) == want, s"key $k score $s: got ${got(id)}, want $want (cum $cum / n $n)")
    }
  }

  test("passageBlocks equals naive slicing on randomized word lists") {
    val rng = new scala.util.Random(0xBEEF)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
    }
    val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = Dedup.passageBlocks(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    var expected = 0
    for ((id, ws) <- docs) {
      val blocks = ws.grouped(8).filter(_.size == 8).toSeq
      expected += blocks.size
      for ((blk, i) <- blocks.zipWithIndex) {
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(blk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got((id, i)) == fp, s"doc $id block $i")
      }
    }
    assert(got.size == expected)
  }

  test("epoch plan: targets respect the epoch bounds and weights sum to one") {
    val plan = graft.SparkEntry.queries("sample_epoch_plan")(spark, sf).collect()
    assert(plan.nonEmpty)
    val wsum = plan.map(_.getAs[Long]("weight_micro")).sum
    assert(math.abs(wsum - 1000000L) <= plan.length,
      s"weights sum to $wsum, expected 1e6 within one rounding step per source")
    for (r <- plan) {
      val (tok, target, n) = (r.getAs[Long]("tok"),
        r.getAs[Long]("target_toks"), r.getAs[Long]("n_epochs"))
      assert(target > (n - 1) * tok && target <= n * tok,
        s"source ${r.getString(0)}: target $target outside epoch bounds for $tok x $n")
      val frac = r.getAs[Long]("last_epoch_frac_micro")
      assert(frac >= 0L && frac <= 1000000L)
    }
  }

  test("mixture anneal: phase budgets partition the 2x total; uniform phase B; repeat factor consistent") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
    val totalToks = d.select(org.apache.spark.sql.functions.sum(
        graft.operators.TextAnalysis.tokenCount(
          org.apache.spark.sql.functions.col("text")).cast("long")))
      .head().getLong(0)
    val plan = graft.SparkEntry.queries("sample_mixture_anneal")(spark, sf).collect()
    assert(plan.nonEmpty)
    val nsrc = plan.length.toLong
    val budgetB = (totalToks * 2) / 5
    val budgetA = totalToks * 2 - budgetB
    // phase B is UNIFORM: every source gets exactly budget_b div nsrc
    val uniform = budgetB / nsrc
    assert(plan.forall(_.getAs[Long]("toks_phase_b") == uniform),
      plan.map(_.getAs[Long]("toks_phase_b")).mkString(","))
    // phase A fills its budget up to one floor step per source plus the
    // weight-rounding drift (Σ weight_micro = 1e6 ± one step per source,
    // so the filled total can sit a hair over or under the budget)
    val sumA = plan.map(_.getAs[Long]("toks_phase_a")).sum
    val slack = nsrc + budgetA * nsrc / 1000000L + 1
    assert(math.abs(sumA - budgetA) <= slack,
      s"phase A sum $sumA vs budget $budgetA (slack $slack)")
    // the repeat factor reconstructs from the phase allocations exactly
    for (r <- plan) {
      val (tok, ta, tb, rep) = (r.getAs[Long]("tok"),
        r.getAs[Long]("toks_phase_a"), r.getAs[Long]("toks_phase_b"),
        r.getAs[Long]("repeat_micro"))
      assert(rep == math.floor((ta + tb).toDouble * 1e6 / tok).toLong,
        s"source ${r.getString(0)}")
    }
  }

  test("passage store: aligned clones hit fully, a one-word prefix shifts the frame to zero") {
    val dir = java.nio.file.Files.createTempDirectory("pstore_").toFile.getAbsolutePath
    val hist = Seq((1L, s"$w8a $w8b"), (2L, s"$w8b one two three four five six seven"))
      .toDF("doc_id", "text")
    Dedup.passageStoreWrite(hist, "doc_id", "text", 8, s"$dir/fps")
    val batch = Seq(
      (10L, s"$w8a $w8b"),            // aligned clone: both blocks hit
      (11L, s"prefix $w8a $w8b"),     // frame-shifted: 2 full blocks, 0 hits
      (12L, w8b)                      // single aligned known block
    ).toDF("doc_id", "text")
    def hitsMap() = Dedup.passageStoreHits(batch, "doc_id", "text", 8, s"$dir/fps")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h = hitsMap()
    assert(h(10L) == (2L, 2L))
    assert(h(11L) == (2L, 0L), s"frame-shifted clone must miss, got ${h(11L)}")
    assert(h(12L) == (1L, 1L))
    // append new fps (the shifted clone's blocks), compact, and the
    // gate must now see them — identically before and after the
    // generation swap
    Dedup.passageStoreAppend(batch.filter(col("doc_id") === 11L),
      "doc_id", "text", 8, s"$dir/fps")
    val afterAppend = hitsMap()
    assert(afterAppend(11L) == (2L, 2L))
    Dedup.passageStoreCompact(spark, s"$dir/fps")
    assert(hitsMap() == afterAppend, "compaction must not change gate results")
  }

  test("curriculum order: ordinals are a permutation, bands never increase along it") {
    val rows = graft.SparkEntry.queries("sample_curriculum_order")(spark, sf)
      .collect().map(r => (r.getAs[Long]("ordinal"), r.getAs[Long]("band")))
    assert(rows.map(_._1).sorted.toSeq == (0L until rows.length).toSeq,
      "ordinals must be exactly 0..n-1")
    val bandsInOrder = rows.sortBy(_._1).map(_._2)
    assert(bandsInOrder.zip(bandsInOrder.tail).forall { case (a, b) => a >= b },
      s"bands must be non-increasing along the curriculum: ${bandsInOrder.mkString(",")}")
    assert(bandsInOrder.distinct.length > 1, "fixture should span multiple bands")
  }

  test("shuffled packing equals a local prefix sum over the md5 order") {
    val out = graft.SparkEntry.queries("pack_shuffled_chunks")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_offset")))
      .toMap
    // recompute serially: concat in md5(doc_id)-hex order, cut at 2048
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("toks"),
        md5(col("doc_id").cast("string")).as("k"))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
    var start = 0L
    for ((_, id, toks) <- docs) {
      val (nt, cid, coff) = out(id)
      assert(nt == toks && cid == start / 2048 && coff == start % 2048,
        s"doc $id: got (chunk $cid, offset $coff), expected start $start")
      start += toks
    }
  }
}
