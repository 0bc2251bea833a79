#!/usr/bin/env python3
"""Generator for src/main/resources/oracles/dedup_simhash.sql — the
dedup_simhash DuckDB oracle.

The oracle independently recomputes the engine's ENTIRE simhash pipeline
in pure single-statement SQL: a from-scratch XXH64 implementation
(xxHash spec, seed 42 — bit-identical to Spark's `xxhash64`; HUGEINT
modular arithmetic, list_reduce for the stripe/word/byte loops), the
64-bit sign-of-bit-sums fingerprint, and the 16-bit-chunk blocked pair
join (lossless for hamming<=3 by pigeonhole: 3 differing bits leave >=1
of 4 chunks identical). DuckDB macros would keep this readable, but the
driver gate's statement handling is only known for single statements —
so the macros below are TEXTUALLY EXPANDED into one WITH...SELECT and
the expansion is checked in as a generated resource. Regenerate with:

    python3 tools/gen_simhash_oracle.py

The script validates the generated SQL against the current Spark dump
(/tmp/verify_out/dedup_simhash) when one exists.
"""
import re, duckdb, glob, os, pandas as pd

# macro definitions as (name, params, body) — expanded innermost-first
MACROS = [
  ("gm64", [], "18446744073709551616::HUGEINT"),
  ("gp1", [], "11400714785074694791::HUGEINT"),
  ("gp2", [], "14029467366897019727::HUGEINT"),
  ("gp3", [], "1609587929392839161::HUGEINT"),
  ("gp4", [], "9650029242287828579::HUGEINT"),
  ("gp5", [], "2870177450012600261::HUGEINT"),
  ("gmul", ["a", "b"],
   "((({a} % 4294967296::HUGEINT) * {b} + ((({a} // 4294967296::HUGEINT) * {b}) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % gm64())"),
  ("gxor", ["a", "b"],
   "CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) AS HUGEINT)"),
  ("grot", ["x", "p2r", "p2c"],
   "((({x} * {p2r}) % gm64() + {x} // {p2c}) % gm64())"),
  ("ground", ["acc", "inp"],
   "gmul(grot((({acc} + gmul({inp}, gp2())) % gm64()), 2147483648::HUGEINT, 8589934592::HUGEINT), gp1())"),
  ("gmerge", ["h", "v"],
   "((gmul(gxor({h}, ground(0::HUGEINT, {v})), gp1()) + gp4()) % gm64())"),
  ("gbyte", ["hx", "k"],
   "CAST(CAST('0x' || substr({hx}, 2*({k}) + 1, 2) AS INT) AS HUGEINT)"),
  ("gu64", ["hx", "i"],
   "(gbyte({hx},{i}) + gbyte({hx},({i})+1)*256 + gbyte({hx},({i})+2)*65536 + gbyte({hx},({i})+3)*16777216 + gbyte({hx},({i})+4)*4294967296 + gbyte({hx},({i})+5)*1099511627776 + gbyte({hx},({i})+6)*281474976710656 + gbyte({hx},({i})+7)*72057594037927936)"),
  ("gu32", ["hx", "i"],
   "(gbyte({hx},{i}) + gbyte({hx},({i})+1)*256 + gbyte({hx},({i})+2)*65536 + gbyte({hx},({i})+3)*16777216)"),
  ("glane", ["hx", "ns", "c", "init"],
   "list_reduce(list_prepend({init}, list_transform(range(0, {ns}), k -> gu64({hx}, 32*k + 8*({c})))), (acc, lane) -> ground(acc, lane))"),
]

def split_args(s):
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == ',' and depth == 0:
            args.append(''.join(cur).strip()); cur = []
        else:
            if ch in '(': depth += 1
            if ch in ')': depth -= 1
            cur.append(ch)
    args.append(''.join(cur).strip())
    return args

def expand(text):
    changed = True
    while changed:
        changed = False
        for name, params, body in MACROS:
            pat = re.compile(r'\b' + name + r'\(')
            m = pat.search(text)
            while m:
                # find matching close paren
                i = m.end(); depth = 1
                while depth:
                    if text[i] == '(': depth += 1
                    elif text[i] == ')': depth -= 1
                    i += 1
                inner = text[m.end():i-1]
                args = split_args(inner) if params else []
                assert len(args) == len(params), (name, inner, args)
                rep = body
                for p, a in zip(params, args):
                    rep = rep.replace('{' + p + '}', '(' + a + ')')
                text = text[:m.start()] + rep + text[i:]
                changed = True
                m = pat.search(text)
    return text

QUERY = """
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' extra token' FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000, '  ' || upper(text) || '  ' FROM documents WHERE doc_id % 10 = 5
),
pow2(b, p) AS (
  SELECT 0, 1::HUGEINT
  UNION ALL
  SELECT b + 1, p * 2 FROM pow2 WHERE b < 63
),
toks AS (
  SELECT doc_id, u.tok AS t
  FROM corpus, UNNEST(list_filter(
    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
    x -> x <> '')) AS u(tok)
),
th AS (SELECT doc_id, hex(encode(t)) AS hx, octet_length(encode(t)) AS l8 FROM toks),
s1 AS (SELECT *, CASE WHEN l8 >= 32 THEN l8 // 32 ELSE 0 END AS ns FROM th),
s2 AS (SELECT *,
    glane(hx, ns, 0, ((42::HUGEINT + gp1() + gp2()) % gm64())) AS v1,
    glane(hx, ns, 1, ((42::HUGEINT + gp2()) % gm64())) AS v2,
    glane(hx, ns, 2, 42::HUGEINT) AS v3,
    glane(hx, ns, 3, ((42::HUGEINT - gp1() + gm64()) % gm64())) AS v4
  FROM s1),
s3 AS (SELECT *, CASE WHEN l8 >= 32 THEN
      (gmerge(gmerge(gmerge(gmerge(
        ((grot(v1, 2::HUGEINT, 9223372036854775808::HUGEINT)
         + grot(v2, 128::HUGEINT, 144115188075855872::HUGEINT)
         + grot(v3, 4096::HUGEINT, 4503599627370496::HUGEINT)
         + grot(v4, 262144::HUGEINT, 70368744177664::HUGEINT)) % gm64()),
        v1), v2), v3), v4) + l8) % gm64()
    ELSE (42::HUGEINT + gp5() + l8) % gm64() END AS h0
  FROM s2),
s4 AS (SELECT *,
    list_reduce(list_prepend(h0, list_transform(range(0, (l8 - ns*32) // 8),
      k -> gu64(hx, ns*32 + 8*k))),
      (acc, w) -> ((gmul(grot(gxor(acc, ground(0::HUGEINT, w)), 134217728::HUGEINT, 137438953472::HUGEINT), gp1()) + gp4()) % gm64()))
      AS h1,
    ns*32 + ((l8 - ns*32) // 8) * 8 AS b4
  FROM s3),
s5 AS (SELECT *, CASE WHEN l8 - b4 >= 4 THEN
      ((gmul(grot(gxor(h1, gmul(gu32(hx, b4), gp1())), 8388608::HUGEINT, 2199023255552::HUGEINT), gp2()) + gp3()) % gm64())
    ELSE h1 END AS h2
  FROM s4),
s6 AS (SELECT *,
    list_reduce(list_prepend(h2,
      list_transform(range(b4 + CASE WHEN l8 - b4 >= 4 THEN 4 ELSE 0 END, l8),
        k -> gbyte(hx, k))),
      (acc, by) -> gmul(grot(gxor(acc, gmul(by, gp5())), 2048::HUGEINT, 9007199254740992::HUGEINT), gp1())) AS h3
  FROM s5),
s7 AS (SELECT doc_id, gmul(gxor(h3, h3 // 8589934592::HUGEINT), gp2()) AS a1 FROM s6),
s8 AS (SELECT doc_id, gmul(gxor(a1, a1 // 536870912::HUGEINT), gp3()) AS a2 FROM s7),
tokhash AS (SELECT doc_id, gxor(a2, a2 // 4294967296::HUGEINT) AS h FROM s8),
bits AS (
  SELECT doc_id, p2.b,
    CASE WHEN sum(CASE WHEN (h // p2.p) % 2 = 1 THEN 1 ELSE -1 END) > 0
      THEN p2.p ELSE 0::HUGEINT END AS bitval
  FROM tokhash CROSS JOIN pow2 p2
  GROUP BY doc_id, p2.b, p2.p
),
fps AS (
  SELECT doc_id, CAST(sum(bitval) AS UBIGINT) AS fp
  FROM bits GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, fp, c.c,
    CAST((fp >> (16 * c.c)) & 65535 AS INT) AS v
  FROM fps CROSS JOIN (SELECT unnest(range(0,4)) AS c) c
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
  CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
FROM chunks x JOIN chunks y
  ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.fp, y.fp)) <= 3
"""

sql = expand(QUERY)
print('expanded SQL size:', len(sql))
open('src/main/resources/oracles/dedup_simhash.sql', 'w').write(sql)

con = duckdb.connect()
sf = '/root/testdata/sf0.01'
for f in glob.glob(os.path.join(sf, '*.parquet')):
    name = os.path.basename(f)[:-len('.parquet')]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
import time
t0 = time.time()
duck = con.execute(sql).fetchdf()
print('duck rows:', len(duck), 'in', round(time.time()-t0, 1), 's')
dump = glob.glob('/tmp/verify_out/dedup_simhash/*.parquet')
if dump:
    spark = pd.concat([pd.read_parquet(p) for p in dump], ignore_index=True)
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.astype(str).sort_values(by=list(df.columns), ignore_index=True)
    a, b = canon(spark), canon(duck)
    print('matches current Spark dump:', a.equals(b))
else:
    print('no Spark dump at /tmp/verify_out/dedup_simhash — skipped the cross-check')
