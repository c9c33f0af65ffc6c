#!/usr/bin/env python3
"""Boundary-margin audit for every transcendental-derived quantized value
feeding a hashed oracle column.

Usage: python3 tools/audit_quant_margins.py <sfDir> [<sfDir2> ...]

The integer-quantization discipline (round(f(x) * scale) on both engines)
is exact as long as no quantized value sits close enough to a .5 rounding
boundary for a cross-engine libm difference to flip it. ln/log/exp/pow are
NOT correctly-rounded IEEE operations, so for each family this tool
recomputes the PRE-round values y = f(x)*scale with the oracle's own
algebra and reports min |frac(y) - 0.5| — the margin a flip would have to
cross. The margin is normalized to ULPs OF THE VALUE (margin /
(|y| * 2^-52)): cross-engine libm pairs differ by a few ulps, composite
expressions by maybe tens, so the audit threshold is 100 ulps — a flip
below it would need the engines to disagree by an order of magnitude more
than any real libm pair. Measured suite floor (2026-08, sf0.01+sf0.1):
char_entropy_nano at 626 ulps (one ~0.31-entropy term, identical worst
row in both fixtures); every other family >= 5e4 ulps, typically >= 1e6. (Raw absolute margins mislead: a family
with 1e4 values has an EXPECTED min |frac-0.5| of ~1/(2*1e4) by order
statistics alone, yet can still be thousands of ulps safe when |y| is
large.) Checked at every SF passed. Families: stupid-backoff LM scores
(text_lm_score /
corpus_report / clean v3+v4), DSIR bucket scores, TF-IDF idf micro
(+ TVF), BM25 term scores (+ batch + TVF), bigram PMI, char entropy
nano-terms (+ v4 gate), source KL micro-terms, temperature-sampling pow
weights. The r07 hash-fails were NOT margin flips (they were HUGEINT
typing — see audit_oracle_types.py); this audit proves the margins were
and remain safe rather than lucky.
"""
import sys, os
import duckdb

NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
THRESHOLD_ULPS = 100.0

# each family: (name, SQL producing one column y = pre-round value * scale)
def families():
    toks = f"SELECT doc_id AS id, lang = 'en' AS tgt, string_split({NORM}, ' ') AS arr FROM documents"
    bigrams = ("unnest(list_transform(generate_series(1, len(arr) - 1), "
               "i -> array_to_string(arr[i:i+1], ' ')))")
    lm_head = f"""WITH toks AS ({toks}),
cu AS (SELECT w, count(*) AS c FROM (SELECT unnest(arr) AS w FROM toks WHERE tgt) GROUP BY w),
tot AS (SELECT sum(c) AS t, count(*) AS v FROM cu),
cb AS (SELECT b, count(*) AS c FROM (SELECT {bigrams} AS b FROM toks WHERE tgt AND len(arr) >= 2) GROUP BY b)"""
    return [
        ("lm_bigram_score", f"""{lm_head}
SELECT ln(CAST(cb.c AS DOUBLE) / cu.c) * 1000000 AS y
FROM cb JOIN cu ON string_split(cb.b, ' ')[1] = cu.w"""),
        ("lm_backoff_score", f"""{lm_head}
SELECT ln(0.4 * (c + 1) / (t + v)) * 1000000 AS y FROM cu, tot"""),
        ("lm_default_score", f"""{lm_head}
SELECT ln(0.4 / (t + v)) * 1000000 AS y FROM tot"""),
        ("dsir_bucket_score", f"""WITH toks AS ({toks}),
g1 AS (SELECT id, tgt, unnest(arr) AS gram FROM toks),
g2 AS (SELECT id, tgt, {bigrams} AS gram FROM toks WHERE len(arr) >= 2),
grams AS (SELECT id, tgt, ('0x' || substring(md5(gram), 1, 8))::BIGINT % 256 AS b
          FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)),
stats AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct, count(*) AS cr FROM grams GROUP BY b),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM stats)
SELECT (ln(ct + 1) - ln(tt + 256) - ln(cr + 1) + ln(tr + 256)) * 1000000 AS y
FROM stats, tot"""),
        ("tfidf_idf_micro", f"""WITH t AS (SELECT id, tok FROM (SELECT doc_id AS id,
  unnest(string_split({NORM}, ' ')) AS tok FROM documents) WHERE length(tok) > 0),
tf AS (SELECT id, tok, count(*) AS tf FROM t GROUP BY id, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT ln(CAST(n AS DOUBLE) / df) * 1000000 AS y FROM df, nd"""),
        ("bm25_term_micro", f"""WITH t AS (SELECT id, tok FROM (SELECT doc_id AS id,
  unnest(string_split({NORM}, ' ')) AS tok FROM documents) WHERE length(tok) > 0),
dl AS (SELECT id, count(*) AS dl FROM t GROUP BY id),
st AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl),
post AS (SELECT id, tok, count(*) AS tf FROM t
         WHERE tok IN ('spark', 'hash', 'window') GROUP BY id, tok),
dfq AS (SELECT tok, count(*) AS df FROM post GROUP BY tok)
SELECT ln((n - df + 0.5) / (df + 0.5) + 1.0)
       * (tf * (1.2 + 1.0))
       / (tf + (dl * 0.75 / (CAST(sum_dl AS DOUBLE) / n) + (1.0 - 0.75)) * 1.2)
       * 1000000.0 AS y
FROM post JOIN dfq USING (tok) JOIN dl USING (id), st"""),
        ("pmi_micro", f"""WITH t AS (SELECT tok FROM (SELECT unnest(string_split({NORM}, ' ')) AS tok
  FROM documents) WHERE length(tok) > 0),
uni AS (SELECT tok, count(*) AS cx FROM t GROUP BY tok),
ut AS (SELECT sum(cx) AS tu FROM uni),
toks AS (SELECT doc_id, string_split({NORM}, ' ') AS arr FROM documents),
grams AS (SELECT {bigrams} AS shingle FROM toks WHERE len(arr) >= 2),
bt AS (SELECT count(*) AS tb FROM grams),
bi AS (SELECT shingle, count(*) AS cxy FROM grams GROUP BY shingle HAVING count(*) >= 5)
SELECT ln((CAST(cxy AS DOUBLE) / tb) /
   ((CAST(u1.cx AS DOUBLE) / tu) * (CAST(u2.cx AS DOUBLE) / tu))) * 1000000 AS y
FROM bi JOIN uni u1 ON string_split(bi.shingle, ' ')[1] = u1.tok
        JOIN uni u2 ON string_split(bi.shingle, ' ')[2] = u2.tok, ut, bt"""),
        ("char_entropy_nano", """WITH chx AS (SELECT doc_id, ch FROM
  (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents) WHERE length(ch) > 0),
chc AS (SELECT doc_id, ch, count(*) AS c FROM chx GROUP BY doc_id, ch),
chn AS (SELECT doc_id, sum(c) AS n FROM chc GROUP BY doc_id)
SELECT (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) * -1000000000.0 AS y
FROM chc JOIN chn USING (doc_id)"""),
        ("source_kl_nano", f"""WITH t AS (SELECT source, tok FROM
  (SELECT source, unnest(string_split({NORM}, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0),
ps AS (SELECT source, tok, count(*) AS cw FROM t GROUP BY source, tok),
st AS (SELECT source, sum(cw) AS n FROM ps GROUP BY source),
co AS (SELECT tok, sum(cw) AS gw FROM ps GROUP BY tok),
tt AS (SELECT sum(gw) AS t FROM co)
SELECT (CAST(cw AS DOUBLE) / n)
       * ln((CAST(cw AS DOUBLE) / n) / (CAST(gw AS DOUBLE) / t))
       * 1000000000.0 AS y
FROM ps JOIN st USING (source) JOIN co USING (tok), tt"""),
        ("temperature_pa_nano", """WITH tc AS (SELECT source,
  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS tok
  FROM documents GROUP BY source),
tt AS (SELECT sum(tok) AS t FROM tc)
SELECT pow(CAST(tok AS DOUBLE) / t, 0.7) * 1000000000.0 AS y FROM tc, tt"""),
        ("temperature_weight_micro", """WITH tc AS (SELECT source,
  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS tok
  FROM documents GROUP BY source),
tt AS (SELECT sum(tok) AS t FROM tc),
pa AS (SELECT source, CAST(round(pow(CAST(tok AS DOUBLE) / t, 0.7) * 1000000000.0) AS BIGINT) AS pa_nano
       FROM tc, tt),
z AS (SELECT sum(pa_nano) AS z FROM pa)
SELECT pa_nano * 1000000.0 / z AS y FROM pa, z"""),
        # stats_zipf_fit: the per-point ln quantizations feeding the OLS
        # moment sums (a flip in any point shifts sx/sy/sxy/sxx)
        ("zipf_ln_micro", f"""WITH t AS (SELECT source, tok FROM
  (SELECT source, unnest(string_split({NORM}, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0),
fr AS (SELECT source, tok, count(*) AS freq FROM t GROUP BY source, tok),
rk AS (SELECT source, freq,
         row_number() OVER (PARTITION BY source ORDER BY freq DESC, tok ASC) AS rank
       FROM fr),
pt AS (SELECT * FROM rk WHERE rank <= 100)
SELECT ln(CAST(rank AS DOUBLE)) * 1000000.0 AS y FROM pt
UNION ALL
SELECT ln(CAST(freq AS DOUBLE)) * 1000000.0 AS y FROM pt"""),
        # stats_zipf_fit: the final slope quantization itself
        ("zipf_slope_micro", f"""WITH t AS (SELECT source, tok FROM
  (SELECT source, unnest(string_split({NORM}, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0),
fr AS (SELECT source, tok, count(*) AS freq FROM t GROUP BY source, tok),
rk AS (SELECT source, freq,
         row_number() OVER (PARTITION BY source ORDER BY freq DESC, tok ASC) AS rank
       FROM fr),
pt AS (SELECT source,
         CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
       FROM rk WHERE rank <= 100),
m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pt GROUP BY source HAVING count(*) >= 2)
SELECT CAST(n * sxy - sx * sy AS DOUBLE)
       / (n * sxx - sx * sx) * 1000000.0 AS y FROM m"""),
        # retrieval_ndcg: per-position gain/discount contributions — the
        # full (rel, pos) grid the entry can ever quantize (rel 0..3 from
        # 3 query terms, pos 1..10), data-independent by construction
        ("ndcg_contrib_micro", """WITH rel AS (SELECT unnest([0, 1, 2, 3]) AS r),
pos AS (SELECT unnest(generate_series(1, 10)) AS p)
SELECT (pow(2.0, r) - 1.0) / (ln(p + 1.0) / ln(2.0)) * 1000000.0 AS y
FROM rel, pos WHERE r > 0"""),
        # retrieval_ndcg: the final ppm ratio from exact integer sums
        ("ndcg_ppm", f"""WITH t AS (SELECT id, tok FROM (SELECT doc_id AS id,
  unnest(string_split({NORM}, ' ')) AS tok FROM documents) WHERE length(tok) > 0),
dl AS (SELECT id, count(*) AS dl FROM t GROUP BY id),
st AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl),
post AS (SELECT id, tok, count(*) AS tf FROM t
         WHERE tok IN ('spark', 'hash', 'window') GROUP BY id, tok),
dfq AS (SELECT tok, count(*) AS df FROM post GROUP BY tok),
c AS (SELECT post.id,
        CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
          * (tf * (1.2 + 1.0))
          / (tf + (dl * 0.75 / (CAST(sum_dl AS DOUBLE) / n) + (1.0 - 0.75)) * 1.2)
          * 1000000.0) AS BIGINT) AS sm
      FROM post JOIN dfq ON post.tok = dfq.tok
                JOIN dl ON post.id = dl.id, st),
sc AS (SELECT id, sum(sm) AS score_micro FROM c GROUP BY id),
r AS (SELECT id, row_number() OVER (ORDER BY score_micro DESC, id ASC) AS rk FROM sc),
top10 AS (SELECT id, rk FROM r WHERE rk <= 10),
rel AS (SELECT id, count(DISTINCT tok) AS rel FROM t
        WHERE tok IN ('spark', 'hash', 'window') GROUP BY id),
dcg AS (SELECT CAST(sum(CAST(round((pow(2.0, COALESCE(rel, 0)) - 1.0)
          / (ln(rk + 1.0) / ln(2.0)) * 1000000.0) AS BIGINT)) AS BIGINT) AS dcg_micro
        FROM top10 LEFT JOIN rel USING (id)),
ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, id ASC) AS pos FROM rel),
idcg AS (SELECT CAST(sum(CAST(round((pow(2.0, rel) - 1.0)
          / (ln(pos + 1.0) / ln(2.0)) * 1000000.0) AS BIGINT)) AS BIGINT) AS idcg_micro
         FROM ideal WHERE pos <= 10)
SELECT CAST(dcg_micro AS DOUBLE) * 1000000.0 / idcg_micro AS y FROM dcg, idcg"""),
        # stats_heaps_fit: the ln point quantizations + the beta slope
        ("heaps_ln_micro", f"""WITH t AS (SELECT id, tok FROM (SELECT doc_id AS id,
  unnest(string_split({NORM}, ' ')) AS tok FROM documents) WHERE length(tok) > 0),
fo AS (SELECT tok, min(id) AS fd FROM t GROUP BY tok),
pd AS (SELECT id, count(*) AS nt FROM t GROUP BY id),
nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
ck AS (SELECT den, n // den AS c FROM nn, (SELECT unnest([8, 4, 2, 1]) AS den)),
v AS (SELECT den, count(*) AS n_vocab FROM fo, ck WHERE fd < c GROUP BY den),
tt AS (SELECT den, sum(nt) AS n_tokens FROM pd, ck WHERE id < c GROUP BY den)
SELECT ln(CAST(n_vocab AS DOUBLE)) * 1000000.0 AS y FROM v
UNION ALL
SELECT ln(CAST(n_tokens AS DOUBLE)) * 1000000.0 AS y FROM tt"""),
        ("heaps_beta_micro", f"""WITH t AS (SELECT id, tok FROM (SELECT doc_id AS id,
  unnest(string_split({NORM}, ' ')) AS tok FROM documents) WHERE length(tok) > 0),
fo AS (SELECT tok, min(id) AS fd FROM t GROUP BY tok),
pd AS (SELECT id, count(*) AS nt FROM t GROUP BY id),
nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
ck AS (SELECT den, n // den AS c FROM nn, (SELECT unnest([8, 4, 2, 1]) AS den)),
v AS (SELECT den, count(*) AS n_vocab FROM fo, ck WHERE fd < c GROUP BY den),
tt AS (SELECT den, sum(nt) AS n_tokens FROM pd, ck WHERE id < c GROUP BY den),
pts AS (SELECT v.den,
          CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
          CAST(round(ln(CAST(n_vocab AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
        FROM v JOIN tt ON v.den = tt.den)
SELECT CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
       / (count(*) * sum(x * x) - sum(x) * sum(x)) * 1000000.0 AS y FROM pts"""),
    ]


def main(sf_dirs):
    worst = 0
    for sf in sf_dirs:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(sf, 'documents.parquet')}'")
        print(f"== {sf}")
        for name, sql in families():
            n, margin, ulps = con.execute(f"""
                SELECT count(*),
                       min(abs(abs(y - floor(y)) - 0.5)),
                       min(abs(abs(y - floor(y)) - 0.5)
                           / (greatest(abs(y), 1.0) * 2.220446049250313e-16))
                FROM ({sql})""").fetchone()
            flag = ("" if ulps is None or ulps >= THRESHOLD_ULPS
                    else "  <-- BELOW THRESHOLD")
            print(f"  {name:24s} n={n:8d} min_margin={margin:.3e} "
                  f"min_margin_ulps={ulps:.3e}{flag}")
            if flag:
                worst += 1
    print(f"threshold {THRESHOLD_ULPS} ulps: {worst} families flagged")
    return 1 if worst else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]))
