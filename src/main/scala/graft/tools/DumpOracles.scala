package graft.tools

/** Dump ALL SparkEntry.oracleSql to <outDir>/oracle_sql.json without
  * executing any query — the input for tools/audit_oracle_types.py, which
  * DESCRIBEs every oracle in DuckDB and flags result columns whose type
  * is not in the engine-portable set (BIGINT/INTEGER/VARCHAR/DOUBLE/...).
  * An uncast `sum(BIGINT)` is HUGEINT in DuckDB; int128 survives the
  * judge's local fetchall() compare as a Python int but does NOT survive
  * every arrow-path the driver may hash through — the r07 lesson: all four
  * hash-fails (`corpus_report`, `dedup_substring_frac`, `sample_dsir`,
  * `text_lm_score`) were exactly the four entries with uncast sums. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/oracles")
    new java.io.File(outDir).mkdirs()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach {
      case (k, v) => node.put(k, v)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    println(s"dumped ${graft.SparkEntry.oracleSql.size} oracles to $outDir")
  }
}
