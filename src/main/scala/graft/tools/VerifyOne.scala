package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a single SparkEntry query (same session config as graft.Verify):
  * `sbt "runMain graft.tools.VerifyOne <name> <sfDir> <outDir>"` */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // default threshold is Int.MaxValue: a huge .limit(n) then allocates
      // an n-entry top-k buffer per partition (TakeOrderedAndProject);
      // above this, plans fall back to distributed Sort + GlobalLimit
      .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // merge this entry's oracle into outDir/oracle_sql.json so
    // tools/check_oracle.py works on single-entry dumps too
    val jsonPath = java.nio.file.Paths.get(outDir, "oracle_sql.json")
    val existing: Map[String, String] =
      if (java.nio.file.Files.exists(jsonPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(jsonPath), "UTF-8")
        upickleRead(txt)
      } else Map.empty
    val merged = graft.SparkEntry.oracleSql.get(name) match {
      case Some(sql) => existing + (name -> sql)
      case None => existing - name
    }
    java.nio.file.Files.write(jsonPath, jsonWrite(merged).getBytes("UTF-8"))
    println(s"dumped $name; oracle=${
      graft.SparkEntry.oracleSql.get(name).map(_.replace("\n", " ")).getOrElse("<none>")}")
    spark.stop()
  }

  /** Minimal JSON for the flat {name: sql} map (no library dependency). */
  private def jsonWrite(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${esc(k)}": "${esc(v)}""""
    }.mkString("{\n", ",\n", "\n}")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Parse the flat {string: string} object jsonWrite emits (tolerates the
    * same subset coming back; not a general JSON parser). */
  private def upickleRead(txt: String): Map[String, String] = {
    val pairs = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    def skipWs(): Unit = while (i < txt.length && txt(i).isWhitespace) i += 1
    def readString(): String = {
      require(txt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (txt(i) != '"') {
        if (txt(i) == '\\') {
          i += 1
          txt(i) match {
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' => sb += Integer.parseInt(txt.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += txt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    skipWs()
    require(txt(i) == '{'); i += 1
    skipWs()
    while (i < txt.length && txt(i) != '}') {
      val k = readString()
      skipWs(); require(txt(i) == ':'); i += 1; skipWs()
      val v = readString()
      pairs(k) = v
      skipWs()
      if (i < txt.length && txt(i) == ',') { i += 1; skipWs() }
    }
    pairs.toMap
  }
}
