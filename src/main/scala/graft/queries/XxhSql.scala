package graft.queries

/** DuckDB SQL generators for Spark's 64-bit hash kernels — the piece
  * that retires the suite's last `no_oracle` entries. The three raw
  * signature pipelines (`dedup_minhash_lsh`, `dedup_simhash`,
  * `dedup_winnow`) hash with `XXH64.hashUnsafeBytes` / Rabin-Karp
  * base-257, neither of which DuckDB ships — so this object EXPRESSES
  * them in portable SQL:
  *
  *   - all state is carried as unsigned HUGEINT in [0, 2⁶⁴); 64-bit
  *     wraparound multiplication splits the left operand at 2³²
  *     (`(a·b) mod 2⁶⁴ = (aₗₒ·b + ((aₕᵢ·bₗₒ) mod 2³²)·2³²) mod 2⁶⁴`,
  *     every intermediate < 2⁹⁷ — HUGEINT-safe), rotation splits at
  *     2^(64−r) so no product can overflow INT128;
  *   - byte access is TRUE byte access (round 13): callers materialize
  *     each input string's UTF-8 bytes ONCE as a BIGINT[] via
  *     [[bytesFromHex]] (`hex(encode(text))` decoded by integer
  *     arithmetic — no `ord(substr())` code-unit assumption), so the
  *     kernels are byte-exact for ANY Unicode corpus, not just ASCII;
  *     `nb` is `strlen` (bytes), never `length` (code points);
  *   - the full XXH64 layout is implemented: 4-lane 32-byte stripes
  *     (recursive CTE, one level per stripe), lane merge, 8-byte tail
  *     words (unrolled ×3), the 4-byte chunk, byte tail (unrolled ×3),
  *     avalanche — every code-path boundary pinned against
  *     Spark-emitted truth by tools/XxhProbe + tools/check_xxh64.py;
  *   - `xxhash64(array<long>)` (the LSH banding bucket) is the
  *     seed-chained `hashLong` fold, generated as a 4-level recursive
  *     CTE.
  *
  * Callers provide a CTE `xin(gid, b, seed, nb)` — gid unique (join
  * key), b the BIGINT[] of the string's UTF-8 byte values (1-indexed;
  * build it with [[bytesFromHex]]), seed unsigned HUGEINT, nb =
  * strlen (byte count = len(b)) — and read `xout(gid, h)` with h the
  * SIGNED BIGINT hash Spark's expressions produce. */
object XxhSql {

  val M = "18446744073709551616" // 2^64
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val W32 = BigInt(4294967296L)

  /** (a * b) mod 2⁶⁴ for a variable SQL expression and constant b. */
  private def mulC(a: String, b: BigInt): String =
    s"((($a) % $W32) * $b + (((($a) // $W32) * ${b % W32}) % $W32) * $W32) % $M"

  /** (a * b) mod 2⁶⁴, both SQL expressions. */
  private def mulV(a: String, b: String): String =
    s"((($a) % $W32) * ($b) + (((($a) // $W32) * (($b) % $W32)) % $W32) * $W32) % $M"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($x) % $lo) * ${BigInt(1) << r} + ($x) // $lo)"
  }

  private def shr(x: String, r: Int): String = s"(($x) // ${BigInt(1) << r})"

  private def xorH(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** XXH64 round: rotl(acc + w·P2, 31) · P1 (mod 2⁶⁴). */
  private def round(acc: String, w: String): String =
    mulC(rotl(s"((($acc) + ${mulC(w, P2)}) % $M)", 31), P1)

  /** ord() of the hex nibble at 1-based position `pos` of uppercase-hex
    * column `hx`, decoded to its value 0-15 (DuckDB `hex()` emits
    * uppercase: '0'-'9' = 48-57, 'A'-'F' = 65-70). */
  private def hexNib(hx: String, pos: String): String = {
    val o = s"ord(substr($hx, ($pos)::BIGINT, 1))"
    s"($o - 48 - 7 * (($o >= 65)::INT))"
  }

  /** BIGINT[] of UTF-8 byte values (1-indexed) decoded from an
    * uppercase-hex column `hx` = `hex(encode(text))` — byte-exact for
    * ANY Unicode text (the round-13 fix for the old `ord(substr())`
    * code-unit shortcut, which was only valid on ASCII corpora).
    * Callers materialize `hx` once per row, so the decode is one linear
    * pass per string, and every later byte access is an O(1) list
    * index. */
  def bytesFromHex(hx: String): String =
    s"list_transform(range(1, (length($hx) // 2 + 1)::BIGINT), bp -> " +
      s"(${hexNib(hx, "2*bp - 1")} * 16 + ${hexNib(hx, "2*bp")})::BIGINT)"

  /** Little-endian 8-byte word of UTF-8 byte list col `b` at 1-based SQL
    * position expression `p`. */
  private def word64(b: String, p: String): String =
    (0 until 8).map(j =>
      s"($b)[(($p) + $j)::BIGINT]::HUGEINT * ${BigInt(1) << (8 * j)}")
      .mkString("(", " + ", ")")

  private def word32(b: String, p: String): String =
    (0 until 4).map(j =>
      s"($b)[(($p) + $j)::BIGINT]::HUGEINT * ${BigInt(1) << (8 * j)}")
      .mkString("(", " + ", ")")

  /** ASCII-safe DuckDB string expression for arbitrary Unicode `s`:
    * plain quoted runs for printable ASCII, `chr(codepoint)` for
    * everything else — so generated SQL (and the emitting JVM's stdout,
    * which is US-ASCII under this container's POSIX locale) stays pure
    * ASCII while DuckDB reconstructs the exact Unicode string. */
  def sqlStr(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { parts += s"'${sb.toString}'"; sb.clear() }
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 32 && cp < 127) {
        if (cp == '\'') sb.append("''") else sb.append(cp.toChar)
        i += 1
      } else { flush(); parts += s"chr($cp)"; i += Character.charCount(cp) }
    }
    flush()
    if (parts.length == 1) parts.head else parts.mkString("(", " || ", ")")
  }

  /** Unsigned HUGEINT → the signed BIGINT Spark's Long holds. */
  def signed(e: String): String =
    s"(CASE WHEN ($e) >= 9223372036854775808 THEN ($e) - $M ELSE ($e) END)::BIGINT"

  /** Spark Long (possibly negative) → unsigned HUGEINT. */
  def unsigned(e: String): String =
    s"(CASE WHEN ($e) < 0 THEN ($e)::HUGEINT + $M ELSE ($e)::HUGEINT END)"

  /** The XXH64-over-bytes CTE chain: `xin(gid, b, seed, nb)` →
    * `xout(gid, h)`. Emit inside a `WITH RECURSIVE` list. */
  def xxh64Ctes: String = {
    val stripeInner =
      s"""SELECT gid, b, seed, nb, i,
         |  ${word64("b", "32*i + 1")} AS w1, ${word64("b", "32*i + 9")} AS w2,
         |  ${word64("b", "32*i + 17")} AS w3, ${word64("b", "32*i + 25")} AS w4,
         |  v1, v2, v3, v4
         |FROM xstripes WHERE i < nb // 32""".stripMargin
    val xstripes =
      s"""xstripes(gid, b, seed, nb, i, v1, v2, v3, v4) AS (
         |  SELECT gid, b, seed, nb, 0,
         |    (seed + $P1 + $P2) % $M, (seed + $P2) % $M, seed,
         |    (seed - $P1 + $M) % $M
         |  FROM xin WHERE nb >= 32
         |  UNION ALL
         |  SELECT gid, b, seed, nb, i + 1,
         |    ${round("v1", "w1")}, ${round("v2", "w2")},
         |    ${round("v3", "w3")}, ${round("v4", "w4")}
         |  FROM ($stripeInner) stp)""".stripMargin
    def mergeLayer(prevH: String, v: String, outH: String, src: String) =
      s"SELECT gid, v2, v3, v4, ${mulC(xorH(prevH, round("0::HUGEINT", v)), P1)} + $P4 AS $outH FROM ($src) ${outH}_l"
    val lanes =
      s"""SELECT gid, v1, v2, v3, v4,
         |  (${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M AS h0
         |FROM xstripes WHERE i = nb // 32""".stripMargin
    val xmerged =
      s"""xmerged AS (
         |  SELECT gid, h4 FROM (
         |  ${mergeLayer("h3 % " + M, "v4", "h4",
             mergeLayer("h2 % " + M, "v3", "h3",
               mergeLayer("h1 % " + M, "v2", "h2",
                 mergeLayer("h0", "v1", "h1", lanes))))}) mfin)""".stripMargin
    val xbase =
      s"""xbase AS (
         |  SELECT x.gid, x.b, x.nb,
         |    ((CASE WHEN x.nb >= 32 THEN m.h4 % $M ELSE (x.seed + $P5) % $M END) + x.nb) % $M AS h,
         |    (x.nb // 32) * 32 AS done
         |  FROM xin x LEFT JOIN xmerged m ON m.gid = x.gid)""".stripMargin
    def tailWord(src: String, dst: String) = {
      val inner =
        s"""SELECT gid, b, nb, done, h,
           |  CASE WHEN done + 8 <= nb THEN ${round("0::HUGEINT", word64("b", "done + 1"))} ELSE 0 END AS k1
           |FROM $src""".stripMargin
      s"""$dst AS (
         |  SELECT gid, b, nb,
         |    CASE WHEN done + 8 <= nb THEN done + 8 ELSE done END AS done,
         |    CASE WHEN done + 8 <= nb
         |         THEN (${mulC(rotl(xorH("h", "k1"), 27), P1)} + $P4) % $M
         |         ELSE h END AS h
         |  FROM ($inner) ${dst}_t)""".stripMargin
    }
    val x4 = {
      val inner =
        s"""SELECT gid, b, nb, done,
           |  CASE WHEN done + 4 <= nb THEN ${xorH("h", mulV(word32("b", "done + 1"), P1.toString))} ELSE h END AS h1,
           |  h FROM t3""".stripMargin
      s"""x4 AS (
         |  SELECT gid, b, nb,
         |    CASE WHEN done + 4 <= nb THEN done + 4 ELSE done END AS done,
         |    CASE WHEN done + 4 <= nb THEN (${mulC(rotl("h1", 23), P2)} + $P3) % $M ELSE h END AS h
         |  FROM ($inner) x4_t)""".stripMargin
    }
    def tailByte(src: String, dst: String) = {
      val inner =
        s"""SELECT gid, b, nb, done,
           |  CASE WHEN done < nb THEN ${xorH("h", mulC("(b)[(done + 1)::BIGINT]::HUGEINT", P5))} ELSE h END AS h1,
           |  h FROM $src""".stripMargin
      s"""$dst AS (
         |  SELECT gid, b, nb,
         |    CASE WHEN done < nb THEN done + 1 ELSE done END AS done,
         |    CASE WHEN done < nb THEN ${mulC(rotl("h1", 11), P1)} ELSE h END AS h
         |  FROM ($inner) ${dst}_t)""".stripMargin
    }
    val xout =
      s"""xout AS (
         |  SELECT gid, ${signed("hf")} AS h
         |  FROM (SELECT gid, ${xorH("h5", shr("h5", 32))} AS hf
         |        FROM (SELECT gid, ${mulC(xorH("h3x", shr("h3x", 29)), P3)} AS h5
         |              FROM (SELECT gid, ${mulC(xorH("h", shr("h", 33)), P2)} AS h3x
         |                    FROM b3) av1) av2) av3)""".stripMargin
    Seq(xstripes, xmerged, xbase,
      tailWord("xbase", "t1"), tailWord("t1", "t2"), tailWord("t2", "t3"),
      x4,
      tailByte("x4", "b1"), tailByte("b1", "b2"), tailByte("b2", "b3"),
      xout).mkString(",\n")
  }

  /** One `hashLong` fold step for the seed-chained `xxhash64(array<long>)`
    * bucket: `src` must yield (id, band, idx, acc, l) with acc the
    * running unsigned state and l the SIGNED element; returns a SELECT
    * producing (id, band, idx, acc'). */
  def hashLongStep(src: String): String = {
    val inner1 =
      s"""SELECT id, band, idx, ${round("0::HUGEINT", unsigned("l"))} AS k1,
         |  (acc + $P5 + 8) % $M AS h0 FROM $src""".stripMargin
    val inner2 =
      s"SELECT id, band, idx, (${mulC(rotl(xorH("h0", "k1"), 27), P1)} + $P4) % $M AS h2 FROM ($inner1) hl1"
    val inner3 =
      s"SELECT id, band, idx, ${mulC(xorH("h2", shr("h2", 33)), P2)} AS ha FROM ($inner2) hl2"
    val inner4 =
      s"SELECT id, band, idx, ${mulC(xorH("ha", shr("ha", 29)), P3)} AS hb FROM ($inner3) hl3"
    s"SELECT id, band, idx, ${xorH("hb", shr("hb", 32))} AS acc FROM ($inner4) hl4"
  }

  /** 257^i mod 2⁶⁴ — the Rabin-Karp gram-hash constants
    * ([[graft.functions.WinnowFingerprint]]'s base-257 natural-overflow
    * polynomial). */
  def pow257(i: Int): BigInt = {
    var r = BigInt(1)
    val m = BigInt(1) << 64
    for (_ <- 0 until i) r = (r * 257) % m
    r
  }
}
