import duckdb, sys

def mk(sf):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in ['documents','embeddings']:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf{sf}/{t}.parquet'")
    return con

# ---- e5e lang guess ----
def score(markers):
    parts = [f"CAST(length(text) - length(replace(text, '{m}', '')) AS DOUBLE) / {len(m)}" for m in markers]
    return " + ".join(parts)
E5E = f"""
WITH s AS (SELECT doc_id,
  {score(['ch','ei','en','sch'])} AS sde,
  {score(['th','he','in','er'])} AS sen,
  {score(['ll','os','as','ión'])} AS ses,
  {score(['ou','le','es','que'])} AS sfr,
  {score(['zh','ng','xi','ao'])} AS szh
  FROM documents),
g AS (SELECT CASE WHEN szh >= sde AND szh >= sen AND szh >= ses AND szh >= sfr THEN 'zh'
                  WHEN sfr >= sde AND sfr >= sen AND sfr >= ses THEN 'fr'
                  WHEN ses >= sde AND ses >= sen THEN 'es'
                  WHEN sen >= sde THEN 'en'
                  ELSE 'de' END AS lang_guess FROM s)
SELECT lang_guess, count(*) AS n_docs FROM g GROUP BY lang_guess ORDER BY lang_guess
"""

# ---- e4d byte entropy ----
E4D = """
WITH ch AS (SELECT doc_id, ascii(substr(text, i, 1)) AS b
            FROM documents, generate_series(1, 700) g(i) WHERE i <= length(text)),
h AS (SELECT doc_id, b, count(*) AS c FROM ch GROUP BY doc_id, b),
t AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM h GROUP BY doc_id)
SELECT h.doc_id, round(-sum((c / n) * log2(c / n)), 6) AS entropy_bits
FROM h JOIN t ON h.doc_id = t.doc_id GROUP BY h.doc_id ORDER BY h.doc_id
"""

# ---- portable hyperplane bucket helpers ----
def weight(p):
    return (f"(CASE WHEN (1 + {p} * 64 + d) * (1 + {p} * 64 + d) * 2654435761 "
            f"% 1000000007 % 2 = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)")
def dot(p):
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(0, 63), d -> dvec[d + 1] * {weight(p)})), (a, x) -> a + x)")
def bucket(nplanes):
    return " + ".join(f"(CASE WHEN {dot(p)} > 0 THEN {1 << p} ELSE 0 END)" for p in range(nplanes))

E2D = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec FROM embeddings),
b AS (SELECT vec_id, dvec, {bucket(2)} AS bucket FROM v),
p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             list_inner_product(a.dvec, c.dvec)
               / (sqrt(list_inner_product(a.dvec, a.dvec)) * sqrt(list_inner_product(c.dvec, c.dvec))) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
SELECT vec_a, vec_b, round(cos, 5) AS cos_sim FROM p WHERE cos >= 0.3 ORDER BY vec_a, vec_b
"""

E3B = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec FROM embeddings),
b AS (SELECT vec_id, dvec, {bucket(8)} AS bucket FROM v),
q AS (SELECT vec_id AS qid, dvec AS qvec, bucket FROM b WHERE vec_id < 5),
c AS (SELECT qid, vec_id, list_inner_product(dvec, qvec) AS cos
      FROM b JOIN q USING (bucket) WHERE vec_id <> qid),
r AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM c)
SELECT qid, rk, vec_id FROM r WHERE rk <= 5 ORDER BY qid, rk
"""

E3E = """
WITH cents0 AS (SELECT label AS cell, d, round(avg(CAST(embedding[d] AS DOUBLE)), 6) AS cv
                FROM embeddings, generate_series(1, 64) g(d) GROUP BY label, d),
cents AS (SELECT cell, list(cv ORDER BY d) AS centroid FROM cents0 GROUP BY cell),
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec FROM embeddings),
sims AS (SELECT vec_id, dvec, cell,
                list_inner_product(dvec, centroid)
                  / (sqrt(list_inner_product(dvec, dvec)) * sqrt(list_inner_product(centroid, centroid))) AS sim
         FROM v, cents),
ranked AS (SELECT vec_id, dvec, cell, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rk FROM sims),
assigned AS (SELECT vec_id, dvec, cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id AS qid, dvec AS qvec, cell FROM ranked WHERE vec_id < 5 AND rk <= 2),
cand AS (SELECT qid, vec_id,
                list_inner_product(dvec, qvec)
                  / (sqrt(list_inner_product(dvec, dvec)) * sqrt(list_inner_product(qvec, qvec))) AS cos
         FROM assigned JOIN probes USING (cell) WHERE vec_id <> qid),
r AS (SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM cand)
SELECT qid, rk, vec_id, round(cos, 5) AS cos_sim FROM r WHERE rk <= 5 ORDER BY qid, rk
"""

for sf in ['0.01','0.1']:
    con = mk(sf)
    for name, q in [('e5e',E5E),('e4d',E4D),('e2d',E2D),('e3b',E3B),('e3e',E3E)]:
        try:
            r = con.sql(q).fetchall()
            print(sf, name, 'rows=', len(r), 'head=', r[:3])
        except Exception as e:
            print(sf, name, 'FAIL', str(e)[:300])
    # boundary safety check for e2d threshold
    r = con.sql(f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec FROM embeddings),
    b AS (SELECT vec_id, dvec, {bucket(2)} AS bucket FROM v),
    p AS (SELECT list_inner_product(a.dvec, c.dvec)
               / (sqrt(list_inner_product(a.dvec, a.dvec)) * sqrt(list_inner_product(c.dvec, c.dvec))) AS cos
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
    SELECT min(abs(cos - 0.3)) FROM p""").fetchall()
    print(sf, 'e2d min |cos-0.3| =', r)
    # hyperplane dot boundary: closest dot to 0 across 8 planes
    r = con.sql(f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec FROM embeddings)
    SELECT min(least({', '.join('abs(' + dot(p) + ')' for p in range(8))})) FROM v""").fetchall()
    print(sf, 'min |dot| over planes =', r)
