#!/usr/bin/env python3
"""Prototype: DuckDB SQL replay of the portable-hash dedup pipeline vs a
Python reference that mirrors graft.operators.Dedup exactly."""
import re
import duckdb

M = (1 << 64) - 1
SEED = 0x9E3779B97F4A7C15
C2 = 0x2545F4914F6CDD1D

def xshash(w):
    h = SEED
    for b in w.encode('utf-8'):
        h ^= b
        h ^= (h << 13) & M
        h ^= h >> 7
        h ^= (h << 17) & M
    return h

def xstep(acc, v):
    h = (acc ^ v) & M
    h ^= (h << 13) & M
    h ^= h >> 7
    h ^= (h << 17) & M
    return h

def rotl(x, r):
    r = r % 64
    return x if r == 0 else (((x << r) & M) | (x >> (64 - r)))

def mix(acc, h):
    return rotl(acc, 8) ^ h

def tosigned(v):
    return v - (1 << 64) if v >= (1 << 63) else v

def words(text):
    return re.sub(r'\s+', ' ', text.strip().lower()).split(' ')

def PAD(j):
    return (0x9E3779B97F4A7C15 * (j + 1)) & M

def shingles(text, k):
    hs = [xshash(w) for w in words(text)]
    n = len(hs)
    out = []
    for p in range(max(n - k, 0) + 1):
        acc = hs[p]
        for j in range(1, k):
            acc = mix(acc, hs[p + j] if p + j < n else PAD(j))
        out.append(acc)
    return out

def perm(h, i):
    return rotl(h, (13 * i + 7) % 64) ^ ((i * 0x9E3779B97F4A7C15 + C2) & M)

def minhash_assign(docs, num_hashes=32, k=3, bands=8, rpb=4):
    sigs = {}
    for did, text in docs:
        sh = shingles(text, k)
        sigs[did] = [min(tosigned(perm(s, i)) for s in sh) for i in range(num_hashes)]
    rows = []  # (doc, band_idx, band_hash)
    for did, sig in sigs.items():
        for b in range(bands):
            acc = SEED
            for r in range(rpb):
                acc = xstep(acc, sig[b * rpb + r] & M)
            acc = xstep(acc, b)
            rows.append((did, b, acc))
    from collections import defaultdict
    buckets = defaultdict(list)
    for did, b, h in rows:
        buckets[(b, h)].append(did)
    out = {}
    for (b, h), ids in buckets.items():
        rep, n = min(ids), len(ids)
        for did in ids:
            cur = out.get(did, (did, 0))
            out[did] = (min(cur[0], rep), cur[1] + n - 1)
    return sorted((d, r, c) for d, (r, c) in out.items())

# ---- SQL template (mirrors what SparkEntry will generate) ----
U64MAX = str((1 << 64) - 1)
TWO63 = str(1 << 63)
TWO64 = str(1 << 64)

MACROS = f"""
CREATE OR REPLACE MACRO u64(x) AS x & CAST('{U64MAX}' AS HUGEINT);
CREATE OR REPLACE MACRO xsa(h) AS xor(h, u64(h << 13));
CREATE OR REPLACE MACRO xsb(h) AS xor(h, h >> 7);
CREATE OR REPLACE MACRO xsc(h) AS xor(h, u64(h << 17));
CREATE OR REPLACE MACRO xstep(h, b) AS xsc(xsb(xsa(xor(h, b))));
CREATE OR REPLACE MACRO wbytes(w) AS list_transform(range(CAST(octet_length(encode(w)) AS INTEGER)), i -> CAST(strpos('123456789ABCDEF', substr(hex(encode(w)), 2*i+1, 1))*16 + strpos('123456789ABCDEF', substr(hex(encode(w)), 2*i+2, 1)) AS HUGEINT));
CREATE OR REPLACE MACRO xshash(w) AS list_reduce(list_prepend(CAST('11400714819323198485' AS HUGEINT), wbytes(w)), (a, b) -> xstep(a, b));
CREATE OR REPLACE MACRO tosigned(v) AS CAST(CASE WHEN v >= CAST('{TWO63}' AS HUGEINT) THEN v - CAST('{TWO64}' AS HUGEINT) ELSE v END AS BIGINT);
CREATE OR REPLACE MACRO tounsigned(v) AS u64(CAST(v AS HUGEINT));
CREATE OR REPLACE MACRO rotl8(x) AS u64(x << 8) | (x >> 56);
CREATE OR REPLACE MACRO shmix(acc, h) AS xor(rotl8(acc), h);
CREATE OR REPLACE MACRO docwords(t) AS string_split(regexp_replace(lower(trim(t)), '\\s+', ' ', 'g'), ' ');
"""

def pad_lit(j):
    return f"CAST('{PAD(j)}' AS HUGEINT)"

def rotl_sql(x, r):
    r = r % 64
    if r == 0:
        return x
    return f"(u64(({x}) << {r}) | (({x}) >> {64 - r}))"

def perm_sql(s, i):
    c = (i * 0x9E3779B97F4A7C15 + C2) & M
    return f"xor({rotl_sql(s, (13 * i + 7) % 64)}, CAST('{c}' AS HUGEINT))"

def sig_sql(num_hashes=32):
    parts = ", ".join(
        f"list_min(list_transform(sh, s -> tosigned({perm_sql('s', i)})))"
        for i in range(num_hashes))
    return f"[{parts}]"

def band_sql(b, rpb=4):
    vals = ", ".join(f"tounsigned(sig[{b * rpb + r + 1}])" for r in range(rpb))
    return (f"list_reduce(list_prepend(CAST('{SEED}' AS HUGEINT), "
            f"[{vals}, CAST({b} AS HUGEINT)]), (a, x) -> xstep(a, x))")

Q22 = f"""
WITH hs AS (
  SELECT doc_id, list_transform(docwords(text), w -> xshash(w)) AS h, len(docwords(text)) AS n FROM documents
), shingled AS (
  SELECT doc_id, list_transform(range(CASE WHEN n >= 3 THEN n - 2 ELSE 1 END),
    p -> shmix(shmix(h[p+1], coalesce(h[p+2], {pad_lit(1)})), coalesce(h[p+3], {pad_lit(2)}))) AS sh
  FROM hs
), sigs AS (
  SELECT doc_id, {sig_sql()} AS sig FROM shingled
), bands AS (
  SELECT doc_id, unnest(list_zip([{", ".join(band_sql(b) for b in range(8))}], [0,1,2,3,4,5,6,7])) AS z FROM sigs
), wb AS (
  SELECT doc_id, z[2] AS band_idx, z[1] AS band_hash FROM bands
), stats AS (
  SELECT doc_id, MIN(doc_id) OVER w AS bucket_rep, COUNT(*) OVER w AS bucket_n
  FROM wb WINDOW w AS (PARTITION BY band_idx, band_hash)
)
SELECT doc_id, MIN(bucket_rep) AS rep_id, CAST(SUM(bucket_n - 1) AS BIGINT) AS n_candidates
FROM stats GROUP BY doc_id ORDER BY doc_id
"""

docs = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text with other words entirely"),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "short"),
    (6, "two words"),
    (7, "Der schnelle braune Fuchs   springt über den faulen Hund"),
]
con = duckdb.connect()
con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
con.execute(MACROS)
got = con.execute(Q22).fetchall()
exp = minhash_assign(docs)
print("sql:", got)
print("ref:", exp)
print("MATCH" if [tuple(r) for r in got] == exp else "MISMATCH")

# ---------------- q23 simhash ----------------
def simhash_ref(docs, max_hamming=12, max_bucket=64):
    sims = {}
    for did, text in docs:
        hs = [xshash(w) for w in words(text)]
        n = len(hs)
        su = 0
        for j in range(64):
            ones = sum(1 for h in hs if (h >> j) & 1)
            if 2 * ones >= n:
                su |= 1 << j
        sims[did] = su
    # bands 4 x 16 bits, cap 64 per bucket by id, hamming <= 12
    from collections import defaultdict
    buckets = defaultdict(list)
    for did in sorted(sims):
        for b in range(4):
            buckets[(b, (sims[did] >> (16 * b)) & 0xffff)].append(did)
    pairs = {}
    for ids in buckets.values():
        ids = ids[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                hm = bin(sims[a] ^ sims[b]).count('1')
                if hm <= max_hamming:
                    pairs[(a, b)] = hm
    from collections import Counter
    nc = Counter()
    for (a, b) in pairs:
        nc[a] += 1
        nc[b] += 1
    return sorted((d, tosigned(su), nc.get(d, 0)) for d, su in sims.items())

def simhash_expr():
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, x -> (x >> {j}) & 1 = 1)) >= n THEN CAST('{1 << j}' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
        for j in range(64))
    return f"({terms})"

Q23 = f"""
WITH hs AS (
  SELECT doc_id, list_transform(docwords(text), w -> xshash(w)) AS h, len(docwords(text)) AS n FROM documents
), sims AS (
  SELECT doc_id, {simhash_expr()} AS su FROM hs
), bands AS (
  SELECT doc_id, su, unnest(list_zip([(su >> 0) & 65535, (su >> 16) & 65535, (su >> 32) & 65535, (su >> 48) & 65535], [0,1,2,3])) AS z FROM sims
), wb AS (
  SELECT doc_id AS id, su, z[2] AS band_idx, z[1] AS band_val,
    ROW_NUMBER() OVER (PARTITION BY z[2], z[1] ORDER BY doc_id) AS rn FROM bands
), pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM wb a JOIN wb b ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
  WHERE a.rn <= 64 AND b.rn <= 64 AND bit_count(tosigned(xor(a.su, b.su))) <= 12
), nc AS (
  SELECT doc_id, COUNT(*) AS n_near FROM (SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b AS doc_id FROM pairs) GROUP BY doc_id
)
SELECT s.doc_id, tosigned(s.su) AS simhash, COALESCE(nc.n_near, 0) AS n_near
FROM sims s LEFT JOIN nc ON s.doc_id = nc.doc_id ORDER BY s.doc_id
"""
got23 = con.execute(Q23).fetchall()
exp23 = simhash_ref(docs)
print("q23 sql:", got23)
print("q23 ref:", exp23)
print("Q23", "MATCH" if [tuple(r) for r in got23] == exp23 else "MISMATCH")

# ---------------- q24 ngram jaccard ----------------
def jaccard_ref(docs, k=2, topk=200, max_bucket=64):
    grams = {}
    for did, text in docs:
        grams[did] = sorted(set(tosigned(s) for s in shingles(text, k)))
    from collections import defaultdict
    buckets = defaultdict(list)
    for did in sorted(grams):
        g = grams[did]
        m1, m2 = g[0], g[1] if len(g) >= 2 else g[0]
        buckets[(m1, m2)].append(did)
    out = []
    for ids in buckets.values():
        ids = ids[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                ga, gb = set(grams[a]), set(grams[b])
                out.append((a, b, len(ga & gb) / len(ga | gb)))
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:topk]

Q24 = f"""
WITH hs AS (
  SELECT doc_id, list_transform(docwords(text), w -> xshash(w)) AS h, len(docwords(text)) AS n FROM documents
), sh2 AS (
  SELECT doc_id, list_transform(range(CASE WHEN n >= 2 THEN n - 1 ELSE 1 END),
    p -> shmix(h[p+1], coalesce(h[p+2], {pad_lit(1)}))) AS sh FROM hs
), grams AS (
  SELECT doc_id AS id, list_sort(list_distinct(list_transform(sh, s -> tosigned(s)))) AS g FROM sh2
), bk AS (
  SELECT id, g, g[1] AS m1, g[CASE WHEN len(g) >= 2 THEN 2 ELSE 1 END] AS m2,
    ROW_NUMBER() OVER (PARTITION BY g[1], g[CASE WHEN len(g) >= 2 THEN 2 ELSE 1 END] ORDER BY id) AS rn FROM grams
)
SELECT a.id AS id_a, b.id AS id_b,
  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS jaccard
FROM bk a JOIN bk b ON a.m1 = b.m1 AND a.m2 = b.m2 AND a.id < b.id
WHERE a.rn <= 64 AND b.rn <= 64
ORDER BY jaccard DESC, id_a, id_b LIMIT 200
"""
got24 = con.execute(Q24).fetchall()
exp24 = jaccard_ref(docs)
print("q24 sql:", got24)
print("q24 ref:", [(a, b, round(j, 6)) for a, b, j in exp24])
print("Q24", "MATCH" if [(a, b, j) for a, b, j in got24] == exp24 else "MISMATCH")
