package graft.tools

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Ground-truth emitter for the DuckDB XXH64 oracle mirror (see
  * Pipeline's xxh64 SQL generators): prints Spark's
  * `XXH64.hashUnsafeBytes` over a byte-length ladder of ASCII strings at
  * several seeds, and `XXH64.hashLong` chains (the `xxhash64(array<long>)`
  * fold), as JSON for tools/check_xxh64.py to replay against the
  * SQL implementation. No Spark session — pure JVM.
  *
  * Usage: `sbt "runMain graft.tools.XxhProbe" > /tmp/xxh_truth.json` (the
  * checker greps the JSON line). With arg `sql`, instead emits ONE
  * complete runnable DuckDB statement (the [[graft.queries.XxhSql]]
  * CTE chain over the truth cases inlined as VALUES) whose rows are
  * (gid, want, h) — tools/check_xxh64.py executes it and asserts
  * h == want for every case, making the SQL kernel independently
  * testable outside the entry oracles.
  */
object XxhProbe {

  private def hashStr(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
  }

  def main(args: Array[String]): Unit = {
    // byte-length ladder across every code-path boundary: empty, 1..7
    // (byte tail), 8..31 (word path), 32+ (4-lane stripes), plus
    // realistic shingles. Since round 13 the ladder includes MULTI-BYTE
    // UTF-8 cases (2-byte Latin/Cyrillic, 3-byte CJK, 4-byte emoji,
    // combining marks) at every code-path boundary too — the SQL mirror
    // decodes true bytes via hex(encode()), so these must match exactly.
    // Non-ASCII is written as raw UTF-8 literals — safe because build.sbt
    // pins `scalac -encoding UTF-8` regardless of the POSIX locale; only
    // the EMITTED SQL must stay US-ASCII (XxhSql.sqlStr escapes it for
    // the stdout channel).
    val strings = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
      "abcdefgh", "abcdefghi", "abcdefghijklmno", "abcdefghijklmnop",
      "the quick brown", "the quick brown fox jumps over the l",
      "exactly thirty-two bytes long!!!",
      "thirty-three bytes of ascii text!",
      "a much longer shingle string that spans multiple 32-byte stripes for the lane path",
      "word1 word2 word3",
      // -- multi-byte ladder --
      "é",                   // 2 bytes (é)
      "中",                   // 3 bytes (CJK)
      "😀",             // 4 bytes (emoji, non-BMP)
      "aé",                  // 3 bytes mixed
      "中文",             // 6 bytes
      "éé",           // combining acute ×2, 6 bytes
      "中文 ab",          // 9 bytes (word path)
      "кириллица", // 18 bytes Cyrillic
      "日本語 ひらがな",            // 22 bytes kana+CJK
      "中文文本处理测试中文文本", // 36 bytes: stripe path
      "mixed 😀 emoji 中文 and ascii text spanning stripes!", // stripes + tails
      "señor año jalapeño")
    val seeds = Seq(0L, 1L, 5L, 42L, 63L)
    if (args.headOption.contains("sql")) {
      // one runnable statement: truth cases as VALUES → XxhSql chain →
      // (gid, want, h) rows for tools/check_xxh64.py to assert over
      val cases = for (((s, sd), i) <- (for (s <- strings; sd <- seeds)
        yield (s, sd)).zipWithIndex)
        yield (i, s, sd, hashStr(s, sd))
      // sqlStr keeps the emitted statement pure ASCII (multi-byte cases
      // are rebuilt by DuckDB via chr()): System.out is US-ASCII here,
      // so raw UTF-8 in the output would be mangled to '?'.
      val values = cases.map { case (i, s, sd, h) =>
        s"($i, ${graft.queries.XxhSql.sqlStr(s)}, $sd, ${h}::BIGINT)"
      }.mkString(",\n  ")
      println(
        s"""WITH RECURSIVE
           |cases(gid, s, sd, want) AS (VALUES
           |  $values),
           |chx AS MATERIALIZED (
           |  SELECT gid, sd, hex(encode(s)) AS hx, strlen(s)::BIGINT AS nb FROM cases),
           |xin AS MATERIALIZED (
           |  SELECT gid, ${graft.queries.XxhSql.bytesFromHex("hx")} AS b,
           |         sd::HUGEINT AS seed, nb FROM chx),
           |${graft.queries.XxhSql.xxh64Ctes}
           |SELECT c.gid, c.want, o.h
           |FROM cases c JOIN xout o ON o.gid = c.gid
           |ORDER BY c.gid""".stripMargin)
      return
    }
    // \u-escape everything past printable ASCII: stdout is US-ASCII here
    def jsonEsc(s: String): String = s.flatMap { c =>
      if (c == '\\') "\\\\" else if (c == '"') "\\\""
      else if (c >= 32 && c < 127) c.toString
      else f"\\u${c.toInt}%04x"
    }
    val strJson = (for (s <- strings; sd <- seeds) yield
      s"""{"s":"${jsonEsc(s)}","seed":$sd,"h":${hashStr(s, sd)}}""")
      .mkString("[", ",", "]")
    // hashLong chains: xxhash64(array(longs)) = fold hashLong with the
    // running hash as seed, initial 42
    val arrays = Seq(Seq(0L), Seq(1L, 2L), Seq(-1L, Long.MaxValue, Long.MinValue),
      Seq(123456789L, -987654321L, 42L, 7L))
    val arrJson = arrays.map { a =>
      val h = a.foldLeft(42L)((acc, l) => XXH64.hashLong(l, acc))
      s"""{"a":[${a.mkString(",")}],"h":$h}"""
    }.mkString("[", ",", "]")
    println(s"""{"strings":$strJson,"arrays":$arrJson}""")
  }
}
