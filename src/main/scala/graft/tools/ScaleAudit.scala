package graft.tools

import graft.{Bench, SparkEntry}

/** Scale-slope audit: times every SparkEntry query at sf0.001 / sf0.01 /
  * sf0.1 under the EXACT bench session config and reports the per-entry
  * log-log growth slope between consecutive scale factors —
  * `slope = log(t_big/t_small) / log(sf_big/sf_small)`, so slope 1.0 is
  * perfectly linear scaling, <1 is sublinear (fixed overhead dominates),
  * and >1.3 is flagged as SUPERLINEAR: the entry grows faster than its
  * input and would not survive a 100× scale-up without an explanation.
  *
  * This converts "the plan shape would survive 100×" from an argument
  * about shuffles and joins into a measurement: a hidden n² pair join,
  * a driver-side collect that grows with the corpus, or a
  * single-partition window all show up as a steep top slope no matter
  * how reasonable the plan LOOKS. Two honest caveats, encoded in the
  * flag rule and recorded in the artifact:
  *
  *   - entries sub-0.5 s at the LARGEST factor are never flagged: their
  *     time is task-scheduling floor, not data work, so their slopes
  *     are noise (reported anyway, flagged never);
  *   - some entries are superlinear BY DESIGN (exact O(n²) validation
  *     twins of ANN paths; the suite carries both precisely so the
  *     scale path exists) — the audit's job is to make that list
  *     explicit and EXHAUSTIVE, not empty: every flagged entry either
  *     carries a machine-readable `by_design` justification naming its
  *     scale twin (the [[byDesign]] map below) or is a REAL finding.
  *
  * The ladder's top step is the repo-derived sf1 fixture
  * (`tools/ScaleFixture`, 10× sf0.1: 6M lineitem / 50k docs / 20k
  * embeddings) when `fixtures/sf1/_FIXTURE_OK` exists — the regime
  * where the quadratic twins finally leave the parallel-slack floor
  * (at sf0.1 the whole suite sits in scheduler slack and the audit
  * could not distinguish them; the r10 artifact carried that caveat
  * in prose, this ladder turns it into data).
  *
  * Min-of-`SPARK_GRAFT_RUNS` (default 2) interleaved passes per scale
  * factor, same stall methodology as [[graft.Bench]]; one run of the
  * pinned calibration workload per (sf, pass) is recorded so a stalled
  * host can be distinguished from a real slope in the artifact itself.
  *
  * Usage: `sbt "runMain graft.tools.ScaleAudit [outFile sfDir...]"`
  * (defaults: scale_audit.json over the three /root/testdata factors
  * plus fixtures/sf1 when generated).
  */
object ScaleAudit {

  /** Entries that are superlinear BY DESIGN, with the scale twin that
    * carries the same semantics at corpus scale — the justification the
    * artifact attaches to a flag so "flagged" means "investigate",
    * never "known and already answered". */
  private val byDesign: Map[String, String] = Map(
    "emb_near_dup_pairs" ->
      ("exact O(n^2) cosine pair join - the ground-truth validation twin; " +
        "scale path = emb_ann_neardups (banded RHP-LSH at the recall-1.0 " +
        "operating point, hash-matching the same oracle)"),
    "emb_ann_neardups" ->
      ("the O(n^2/4)-by-construction VALIDATION twin: 2-plane bands have " +
        "4 buckets, so bucket size is ~N/4 at the recall-1.0 operating " +
        "point and the star cap is explicitly DISABLED here (r13 - the " +
        "r12 cap silently collapsed it to hub stars at sf0.1, caught by " +
        "the first full oracle gate at that scale); deployment near-dup " +
        "paths use higher-plane bands + the cap"),
    "emb_ann_recall" ->
      ("recall audit: brute-force O(n^2) ground truth vs the banded LSH " +
        "candidates - validation-only by construction"),
    "emb_label_noise" ->
      ("brute-force leave-one-out 5-NN over the md5 quarter-sample " +
        "(NearDupMaxRows-guarded); scale path = emb_label_noise_ann " +
        "(IVF-shortlist 5-NN, same exact answer, hash-matched)"),
    "dedup_ngram_jaccard" ->
      ("exact word-3-gram jaccard over every shingle-sharing pair - the " +
        "ground truth the minhash family is audited against; scale path = " +
        "dedup_minhash_neardups / dedup_minhash_lsh (banded)"),
    "dedup_lsh_recall" ->
      ("recall audit joining banded candidates against the exact jaccard " +
        "ground truth - validation-only by construction"),
    "semdedup_decontaminate" ->
      ("cross-corpus semantic check against the exact pair set at " +
        "validation scale; scale path = semdedup_drops (celled)"),
    // EDGE-DENSITY entries: linear in their true input (candidate
    // pairs/edges), which the 10x fixture grows ~45x BY CONSTRUCTION —
    // each replica group of 10 turns every planted duplicate into a
    // C(10,2) clique (crawl-style boilerplate density). Per-doc slopes
    // read superlinear; per-EDGE the work is linear, which is the right
    // complexity measure for pair-keyed operators. The same density
    // shows up (below the flag line) in the pair emitters underneath
    // (dedup_minhash_neardups/auto).
    "dedup_clusters" ->
      ("connected components over near-dup EDGES: linear in edges x " +
        "log(diameter) rounds; the 10x fixture multiplies clique sizes " +
        "by 10, so edges grow ~45-100x while docs grow 10x - per-edge " +
        "work is linear (the CC complexity measure); hot-cluster edge " +
        "counts on a real crawl scale with duplication density, not " +
        "corpus size"),
    "dedup_minhash_auto" ->
      ("banded minhash candidates + jaccard verify: linear in candidate " +
        "PAIRS, which the fixture's 10-way replica cliques grow ~45x " +
        "while docs grow 10x (the dedup_clusters edge-density story; " +
        "same plan at a fixed band config sits at slope ~0.95-1.1 in " +
        "quieter runs); CAPPED since r12: a bucket past maxBucket=256 " +
        "degrades to an m-1 star around its min id (minhashCandidates, " +
        "spec-pinned), so the pathological boilerplate case is linear - " +
        "the fixture's 10-member cliques sit far below the cap and " +
        "legitimately enumerate their pairs"),
    "dedup_minhash_neardups" ->
      ("banded minhash candidates + jaccard verify at the fixed band " +
        "config: linear in candidate pairs, fixture-grown ~45x (the " +
        "edge-density story); CAPPED since r12 by the minhashCandidates " +
        "maxBucket=256 star degradation (spec-pinned) - sub-cap cliques " +
        "like the fixture's enumerate normally, pathological buckets " +
        "are linear"),
    "text_fuzzy_pairs" ->
      ("blocked pair join with per-pair banded levenshtein: linear in " +
        "candidate pairs; all 10 replicas share each 16-char block by " +
        "construction, so pairs grow ~45x while docs grow 10x — below " +
        "the IMPLEMENTED hot-block cap (fuzzyPairs maxBlock=64, " +
        "spec-pinned), which bounds the pathological case: any block " +
        "past the cap is excluded before the join (boilerplate blocks " +
        "are dedup work, not typo-detection work)"))

  private case class SfRun(dir: String, sf: Double,
                           times: Map[String, Option[Double]],
                           calSamples: Seq[Double])

  /** The ONE flag rule, shared by the run path and [[reannotate]] so the
    * two can never silently diverge (they previously duplicated the
    * literals): superlinear at the TOP transition and doing non-trivial
    * work at the largest factor. */
  private val SlopeFlagThreshold = 1.3
  private val TTopFlagThreshold = 0.5
  private val FlagRule =
    s"top slope > $SlopeFlagThreshold and t_top > ${TTopFlagThreshold}s"
  /** Index of the top transition's slope among the `nSf - 1` slopes. */
  private def topTransitionIdx(nSf: Int): Int = nSf - 2
  private def isFlagged(topSlope: Option[Double],
                        tTop: Option[Double]): Boolean =
    topSlope.exists(_ > SlopeFlagThreshold) &&
      tTop.exists(_ > TTopFlagThreshold)

  /** Re-annotate an existing artifact: recompute the flag list and
    * `by_design` details from the RECORDED times/slopes under the
    * current rule + justification map, without re-timing anything.
    * Flags are a pure function of (recorded data, rule), and the
    * justification map can legitimately grow after a run — the sf1
    * step's ~5-minute passes make per-run flag sets wobble under
    * roaming host noise (three runs of identical code measured
    * dedup_lsh_recall at 15.8 / 26.0 / 89.2 s minima), so the recorded
    * numbers stay authoritative while the annotation stays current.
    * Usage: `runMain graft.tools.ScaleAudit reannotate [file]`. */
  private def reannotate(file: String): Unit = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(file)).asInstanceOf[ObjectNode]
    val nSf = root.get("sf_values").size()
    val topIdx = topTransitionIdx(nSf)
    val queries = root.get("queries").asInstanceOf[ObjectNode]
    val names = queries.fieldNames().asScala.toSeq
    def numOpt(n: com.fasterxml.jackson.databind.JsonNode): Option[Double] =
      Option(n).filterNot(_.isNull).map(_.asDouble())
    val flagged = names.filter { n =>
      val e = queries.get(n)
      isFlagged(numOpt(e.get("slope").get(topIdx)),
        numOpt(e.get("t").get(nSf - 1)))
    }
    val fl = mapper.createArrayNode()
    flagged.foreach(fl.add)
    val fd = mapper.createArrayNode()
    flagged.foreach { n =>
      val o = mapper.createObjectNode()
      o.put("name", n)
      byDesign.get(n) match {
        case Some(j) => o.put("by_design", j)
        case None => o.putNull("by_design")
      }
      fd.add(o): Unit
    }
    // explicit type arg: ObjectNode.set is generic in its return and
    // Scala's value-discard would otherwise infer T = BoxedUnit (a
    // runtime ClassCastException, not a compile error)
    root.set[com.fasterxml.jackson.databind.JsonNode]("flagged", fl)
    root.set[com.fasterxml.jackson.databind.JsonNode]("flag_details", fd)
    java.nio.file.Files.write(java.nio.file.Paths.get(file),
      (mapper.writeValueAsString(root) + "\n").getBytes("UTF-8"))
    println(s"reannotated $file: ${flagged.size} flagged")
    flagged.foreach { n =>
      val tag = if (byDesign.contains(n)) "by-design" else "REAL"
      println(s"  FLAG($tag) $n")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("reannotate")) {
      reannotate(args.lift(1).getOrElse("scale_audit.json"))
      return
    }
    val outFile = args.headOption.getOrElse("scale_audit.json")
    val sfDirs =
      if (args.length > 1) args.drop(1).toSeq
      else {
        val base = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1")
        // the repo-derived 10x step joins the ladder once generated
        // (tools/ScaleFixture) and complete (_FIXTURE_OK stamp)
        if (new java.io.File("fixtures/sf1/_FIXTURE_OK").exists())
          base :+ "fixtures/sf1"
        else base
      }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm the calibration plan once (the Bench discipline: the first
    // TIMED sample must measure the host, not janino compiling the
    // calibration chain — an unwarmed first sample read 0.36 s vs the
    // 0.03-0.09 s steady state in the r10 first-cut artifact, which
    // would trip the documented stall_ratio > 5 rule on a healthy run)
    Bench.timeNoop(Bench.calibrationDf(spark))
    Bench.timeNoop(Bench.calibrationDf(spark))
    val sfRuns = sfDirs.map { dir =>
      val sf = sfValue(dir)
      // warm-up per factor: the first query against a new directory pays
      // file listing + footer reads; keep that out of the timed region
      // the same way Bench does
      SparkEntry.queries.get("q1_pricing_summary")
        .foreach(fn => fn(spark, dir).write.format("noop").mode("overwrite").save())
      val best = scala.collection.mutable.Map.empty[String, Double]
      val cal = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 0 until runs) {
        // the SAME pinned workload Bench times, so the stall samples in
        // this artifact are directly comparable to bench artifacts
        cal += Bench.timeNoop(Bench.calibrationDf(spark))
        for ((name, fn) <- ordered) {
          val t0 = System.nanoTime()
          try {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            val t = (System.nanoTime() - t0) / 1e9
            if (!best.get(name).exists(_ <= t)) best(name) = t
          } catch {
            case e: Throwable =>
              System.err.println(s"[scale-audit] $name @ $dir failed: ${e.getMessage}")
          }
        }
      }
      System.err.println(f"[scale-audit] $dir done: total ${best.values.sum}%.1f s")
      SfRun(dir, sf, ordered.map { case (n, _) => n -> best.get(n) }.toMap, cal.toSeq)
    }

    // per-entry slopes between consecutive factors; None when either
    // endpoint failed
    val names = ordered.map(_._1)
    val slopes: Map[String, Seq[Option[Double]]] = names.map { n =>
      n -> sfRuns.sliding(2).map {
        case Seq(a, b) =>
          for (ta <- a.times(n); tb <- b.times(n))
            yield math.log(tb / ta) / math.log(b.sf / a.sf)
        case _ => None
      }.toSeq
    }.toMap

    // flag rule: see the shared predicate above
    val topIdx = topTransitionIdx(sfRuns.size)
    val flagged = names.filter { n =>
      isFlagged(slopes(n).lift(topIdx).flatten, sfRuns.last.times(n))
    }

    val json = {
      def num(v: Option[Double]) = v.map(x => f"$x%.3f").getOrElse("null")
      val qjson = names.map { n =>
        val ts = sfRuns.map(r => num(r.times(n))).mkString("[", ",", "]")
        val ss = slopes(n).map(num).mkString("[", ",", "]")
        s""""$n":{"t":$ts,"slope":$ss}"""
      }.mkString("{", ",", "}")
      val sfsJson = sfRuns.map(r => "\"" + r.dir + "\"").mkString("[", ",", "]")
      val sfVals = sfRuns.map(r => r.sf.toString).mkString("[", ",", "]")
      val totals = sfRuns.map(r => f"${r.times.values.flatten.sum}%.3f")
        .mkString("[", ",", "]")
      val cals = sfRuns.map(_.calSamples.map(v => f"$v%.3f")
        .mkString("[", ",", "]")).mkString("[", ",", "]")
      def jstr(s: String) = "\"" + s.replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\""
      val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
      // per-flag detail: a by_design justification names the entry's
      // scale twin; null means a REAL finding to investigate
      val flagDetails = flagged.map { n =>
        val bd = byDesign.get(n).map(jstr).getOrElse("null")
        s"""{"name":"$n","by_design":$bd}"""
      }.mkString("[", ",", "]")
      s"""{"sfs":$sfsJson,"sf_values":$sfVals,"runs":$runs,"totals":$totals,"calibration":$cals,"flag_rule":"$FlagRule","flagged":$flaggedJson,"flag_details":$flagDetails,"queries":$qjson}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))

    // human-readable summary: flagged first, then the steepest unflagged
    println(f"%n== scale audit: ${names.size} entries, factors " +
      sfRuns.map(_.sf).mkString("/") + s", runs=$runs ==")
    println(s"flagged superlinear ($FlagRule): ${flagged.size}")
    def row(n: String): String = {
      val ts = sfRuns.map(r => r.times(n).map(t => f"$t%8.3f").getOrElse("   fail "))
        .mkString(" ")
      val ss = slopes(n).map(_.map(s => f"$s%6.2f").getOrElse("  n/a "))
        .mkString(" ")
      f"$n%-28s $ts  slopes: $ss"
    }
    flagged.foreach { n =>
      val tag = if (byDesign.contains(n)) "FLAG(by-design)" else "FLAG(REAL)"
      println(f"  $tag%-16s " + row(n))
    }
    val steepest = names.filterNot(flagged.contains)
      .sortBy(n => -slopes(n).lift(topIdx).flatten.getOrElse(Double.MinValue))
      .take(10)
    println("steepest unflagged:")
    steepest.foreach(n => println("       " + row(n)))
    spark.stop()
  }

  /** `.../sf0.01` → 0.01 */
  private def sfValue(dir: String): Double = {
    val name = java.nio.file.Paths.get(dir).getFileName.toString
    name.stripPrefix("sf").toDouble
  }
}
