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
    // realistic shingles
    val strings = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
      "abcdefgh", "abcdefghi", "abcdefghijklmno", "abcdefghijklmnop",
      "the quick brown", "the quick brown fox jumps over the l",
      "exactly thirty-two bytes long!!!",
      "thirty-three bytes of ascii text!",
      "a much longer shingle string that spans multiple 32-byte stripes for the lane path",
      "word1 word2 word3")
    val seeds = Seq(0L, 1L, 5L, 42L, 63L)
    if (args.headOption.contains("sql")) {
      // one runnable statement: truth cases as VALUES → XxhSql chain →
      // (gid, want, h) rows for tools/check_xxh64.py to assert over
      val cases = for (((s, sd), i) <- (for (s <- strings; sd <- seeds)
        yield (s, sd)).zipWithIndex)
        yield (i, s, sd, hashStr(s, sd))
      val values = cases.map { case (i, s, sd, h) =>
        s"($i, '${s.replace("'", "''")}', $sd, ${h}::BIGINT)"
      }.mkString(",\n  ")
      println(
        s"""WITH RECURSIVE
           |cases(gid, s, sd, want) AS (VALUES
           |  $values),
           |xin AS MATERIALIZED (
           |  SELECT gid, s, sd::HUGEINT AS seed, length(s)::BIGINT AS nb FROM cases),
           |${graft.queries.XxhSql.xxh64Ctes}
           |SELECT c.gid, c.want, o.h
           |FROM cases c JOIN xout o ON o.gid = c.gid
           |ORDER BY c.gid""".stripMargin)
      return
    }
    val strJson = (for (s <- strings; sd <- seeds) yield
      s"""{"s":"${s.replace("\\", "\\\\").replace("\"", "\\\"")}","seed":$sd,"h":${hashStr(s, sd)}}""")
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
