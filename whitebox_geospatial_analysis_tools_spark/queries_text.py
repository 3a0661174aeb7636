"""Text-analysis / dedup / similarity-search query registry + DuckDB oracles.

The training-data-pipeline surface over `documents` and `embeddings`.
Shingle/token logic is mirrored in ANSI SQL; hashes are md5 hex strings
(identical in both engines); embedding math uses fixed-order generated
expression chains (operators/simsearch.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import queries as Q
from .operators import simsearch, textops

_DOCS = "SELECT doc_id, text FROM documents"

# DuckDB mirror of textops._shingles (word trigrams)
_SHINGLE_CTE = """
wrd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM wrd WHERE len(w) >= 3),
sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx)
"""


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _emb(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


@Q.register(
    "token_count",
    f"SELECT doc_id, {textops.N_TOKENS} AS n_tokens, length(text) AS n_chars "
    "FROM documents ORDER BY doc_id",
)
def q_token_count(spark, sf):
    return textops.token_counts(_docs(spark, sf))


@Q.register(
    "quality_score",
    f"""WITH d AS (
  SELECT doc_id, length(text) AS n_chars, {textops.N_TOKENS} AS n_tokens,
         (length(text) - length(replace(text, ' the ', ''))) / 5 AS n_the
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_tok_len,
       CAST(n_the AS DOUBLE) / n_tokens AS stopword_ratio
FROM d ORDER BY doc_id""",
)
def q_quality(spark, sf):
    return textops.quality_scores(_docs(spark, sf))


def _langid_sql() -> str:
    scores = textops.lang_scores_sql()
    order = list(scores)
    cols = ", ".join(f"({s}) AS s_{lang}" for lang, s in scores.items())
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in order) + ")"
    pred = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in order)
        + " END"
    )
    return (
        f"WITH d AS (SELECT doc_id, {cols} FROM documents) "
        f"SELECT doc_id, {pred} AS pred_lang FROM d ORDER BY doc_id"
    )


@Q.register("lang_id", _langid_sql())
def q_lang_id(spark, sf):
    return textops.lang_id(_docs(spark, sf))


@Q.register(
    "dedup_exact",
    "SELECT md5(text) AS text_md5, MIN(doc_id) AS rep_doc, COUNT(*) AS n "
    "FROM documents GROUP BY 1 ORDER BY 1",
)
def q_dedup_exact(spark, sf):
    return textops.dedup_exact(_docs(spark, sf))


@Q.register(
    "doc_fingerprint",
    f"""WITH {_SHINGLE_CTE},
h AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM sh),
r AS (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rnk FROM h)
SELECT doc_id, rnk, h AS fp FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",
)
def q_fingerprint(spark, sf):
    return textops.fingerprint(_docs(spark, sf))


@Q.register(
    "minhash_sig",
    f"""WITH {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b)
SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_minhash_sig(spark, sf):
    return textops.minhash_signatures(_docs(spark, sf))


@Q.register(
    "lsh_pairs",
    f"""WITH {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b),
sig AS (SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2),
ok AS (SELECT band, minh FROM sig GROUP BY 1, 2 HAVING COUNT(*) <= 50),
s AS (SELECT sig.* FROM sig JOIN ok USING (band, minh))
SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
FROM s a JOIN s c ON a.band = c.band AND a.minh = c.minh AND a.doc_id < c.doc_id
ORDER BY 1, 2""",
)
def q_lsh_pairs(spark, sf):
    return textops.lsh_candidate_pairs(_docs(spark, sf))


_PAIRS_SQL = (
    "pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM documents a "
    "JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 10 = 0)"
)


@Q.register(
    "ngram_jaccard",
    f"""WITH {_SHINGLE_CTE},
{_PAIRS_SQL},
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ds GROUP BY 1),
inter AS (
  SELECT p.d1, p.d2, COUNT(*) AS n_inter
  FROM pairs p JOIN ds x ON x.doc_id = p.d1 JOIN ds y ON y.doc_id = p.d2 AND y.shingle = x.shingle
  GROUP BY 1, 2)
SELECT p.d1, p.d2, COALESCE(i.n_inter, 0) AS n_inter,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE) / (s1.sz + s2.sz - COALESCE(i.n_inter, 0)) AS jaccard
FROM pairs p LEFT JOIN inter i ON p.d1 = i.d1 AND p.d2 = i.d2
JOIN sizes s1 ON s1.doc_id = p.d1 JOIN sizes s2 ON s2.doc_id = p.d2
ORDER BY 1, 2""",
)
def q_ngram_jaccard(spark, sf):
    docs = _docs(spark, sf)
    pairs = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("d1"), (F.col("doc_id") + 1).alias("d2"))
        .join(docs.select(F.col("doc_id").alias("d2")), "d2", "left_semi")
    )
    return textops.ngram_jaccard(docs, pairs)


def _simhash_sql() -> str:
    bits = textops.SIMHASH_BITS
    sums = ", ".join(
        f"SUM(2 * {textops.simhash_bit_sql(j)} - 1) AS s{j}" for j in range(bits)
    )
    recompose = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, {textops.TOKEN_HASH} AS h FROM tok WHERE length(tok) > 0),
g AS (SELECT doc_id, {sums} FROM h GROUP BY 1)
SELECT doc_id, ({recompose}) AS simhash FROM g ORDER BY doc_id"""


@Q.register("simhash", _simhash_sql())
def q_simhash(spark, sf):
    return textops.simhash(_docs(spark, sf))


def _simhash_bands_sql() -> str:
    """(doc_id, simhash, band, key) long table — banding mirror."""
    bb, nb = textops.BAND_BITS, textops.SIMHASH_BANDS
    keys = " ".join(
        f"WHEN {k} THEN (simhash // {1 << (bb * k)}) % {1 << bb}"
        for k in range(nb)
    )
    return f"""s AS ({_simhash_sql().replace(' ORDER BY doc_id', '')}),
bnum AS (SELECT * FROM (VALUES {', '.join(f'({k})' for k in range(nb))}) t(band)),
bl AS (SELECT doc_id, simhash, band, CASE band {keys} END AS key FROM s, bnum)"""


def _simhash_pairs_sql() -> str:
    return f"""WITH {_simhash_bands_sql()},
ok AS (SELECT band, key FROM bl GROUP BY 1, 2 HAVING COUNT(*) <= {textops.MAX_BUCKET}),
sl AS (SELECT bl.* FROM bl JOIN ok USING (band, key)),
cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2, a.simhash AS h1, c.simhash AS h2
         FROM sl a JOIN sl c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id)
SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= 3
ORDER BY 1, 2"""


@Q.register("simhash_near_dup", _simhash_pairs_sql())
def q_simhash_pairs(spark, sf):
    return textops.simhash_near_pairs(_docs(spark, sf))


_BUCKET_STATS_TAIL = f"""
SELECT band, COUNT(*) AS n_buckets, MAX(bn) AS max_bucket_n,
       CAST(SUM(CASE WHEN bn > {textops.MAX_BUCKET} THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
       CAST(SUM(CASE WHEN bn > {textops.MAX_BUCKET} THEN bn * (bn - 1) / 2 ELSE 0 END) AS BIGINT) AS pairs_dropped
FROM per GROUP BY 1 ORDER BY 1"""


@Q.register(
    "simhash_bucket_stats",
    f"WITH {_simhash_bands_sql()}, "
    "per AS (SELECT band, key, COUNT(*) AS bn FROM bl GROUP BY 1, 2)"
    + _BUCKET_STATS_TAIL,
)
def q_simhash_bucket_stats(spark, sf):
    return textops.simhash_bucket_stats(_docs(spark, sf))


@Q.register(
    "lsh_bucket_stats",
    f"""WITH {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b),
sig AS (SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2),
per AS (SELECT band, minh, COUNT(*) AS bn FROM sig GROUP BY 1, 2)"""
    + _BUCKET_STATS_TAIL,
)
def q_lsh_bucket_stats(spark, sf):
    return textops.lsh_bucket_stats(_docs(spark, sf))


# -- embeddings ---------------------------------------------------------------
@Q.register(
    "cosine_topk",
    f"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
p AS (SELECT q_id, c_id, round({simsearch.cosine_expr('qv', 'cv', simsearch.DUCK_AT)}, 6) AS cos
      FROM q JOIN c ON q_id != c_id),
r AS (SELECT q_id, c_id, cos, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM p)
SELECT q_id, c_id, cos, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""",
)
def q_cosine_topk(spark, sf):
    return simsearch.cosine_topk(_emb(spark, sf))


@Q.register(
    "embed_near_dup",
    f"""WITH a AS (SELECT vec_id AS d1, embedding AS av FROM embeddings),
b AS (SELECT vec_id AS d2, embedding AS bv FROM embeddings),
p AS (SELECT d1, d2, round({simsearch.cosine_expr('av', 'bv', simsearch.DUCK_AT)}, 6) AS cos
      FROM a JOIN b ON d1 < d2)
SELECT d1, d2, cos FROM p WHERE cos >= 0.35e0 ORDER BY 1, 2""",
)
def q_embed_near_dup(spark, sf):
    return simsearch.embedding_near_dup(_emb(spark, sf))


@Q.register(
    "embed_lsh_buckets",
    f"SELECT vec_id, {simsearch.lsh_bucket_expr('embedding', simsearch.DUCK_AT)} AS bucket "
    "FROM embeddings ORDER BY vec_id",
)
def q_embed_lsh_buckets(spark, sf):
    return simsearch.lsh_buckets(_emb(spark, sf))


def _lsh_tables_sql() -> str:
    """Multi-table sign-sketch long table (tbl, bucket) mirror."""
    parts = [
        f"SELECT vec_id, embedding, "
        f"{simsearch.dot_expr('embedding', 'embedding', simsearch.DUCK_AT)} AS n, "
        f"{t} AS tbl, "
        f"{simsearch.lsh_bucket_expr('embedding', simsearch.DUCK_AT, t)} AS bucket "
        "FROM embeddings"
        for t in range(simsearch.N_TABLES)
    ]
    return " UNION ALL ".join(parts)


@Q.register(
    "embed_lsh_near_dup",
    f"""WITH el AS ({_lsh_tables_sql()}),
ok AS (SELECT tbl, bucket FROM el GROUP BY 1, 2 HAVING COUNT(*) <= {simsearch.MAX_BUCKET}),
sl AS (SELECT el.* FROM el JOIN ok USING (tbl, bucket)),
p AS (SELECT DISTINCT a.vec_id AS d1, c.vec_id AS d2,
             round({simsearch.dot_expr('a.embedding', 'c.embedding', simsearch.DUCK_AT)}
                   / sqrt(a.n) / sqrt(c.n), 6) AS cos
      FROM sl a JOIN sl c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id < c.vec_id)
SELECT d1, d2, cos FROM p WHERE cos >= 0.35e0 ORDER BY 1, 2""",
)
def q_embed_lsh_near_dup(spark, sf):
    return simsearch.lsh_near_dup(_emb(spark, sf))


# -- IVF ANN (the inverted-file scale path next to the LSH tables): the
# corpus-scaled TRAINED coarse quantizer — n_lists = max(16, ceil(sqrt(n))),
# deterministic hash-ordered sample seeds, one Lloyd round in integer-micro
# units, assignment/probe by integer-micro L2 to the trained centroids,
# brute cosine inside probed lists only.  Every quantizer op is order-free
# BIGINT arithmetic, so the oracle replays it value-exactly.
def _ivf_ctes() -> str:
    """Shared trained-coarse-quantizer CTE chain: nn (count + list count),
    sdv (hash-ordered sample seeds), exv (corpus element long form), ivd0 /
    iva0 (seed assignment), ivcc (trained centroids, integer-micro means),
    ivd1 / ivl (trained assignment) — the SQL twin of
    operators/simsearch.py coarse_model + coarse_assign."""
    S = simsearch
    return f"""nn AS (SELECT COUNT(*) AS cnt,
  GREATEST({S.IVF_FLOOR}, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS nl FROM embeddings),
sdv AS (SELECT s.t, s.embedding AS sv FROM
  (SELECT vec_id, embedding,
          ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS t
   FROM embeddings) s, nn WHERE s.t < nn.nl),
exv AS (SELECT vec_id, p, CAST(list_extract(embedding, p) AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding, unnest(generate_series(1, {S.DIM})) AS p FROM embeddings)),
sxv AS (SELECT t, p, CAST(list_extract(sv, p) AS DOUBLE) AS y
  FROM (SELECT t, sv, unnest(generate_series(1, {S.DIM})) AS p FROM sdv)),
ivd0 AS (SELECT e.vec_id, s.t,
    CAST(SUM(CAST(FLOOR((e.x - s.y) * (e.x - s.y) * 1e6) AS BIGINT)) AS BIGINT) AS d
  FROM exv e JOIN sxv s USING (p) GROUP BY 1, 2),
iva0 AS (SELECT vec_id, t FROM
  (SELECT vec_id, t, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, t) AS rn FROM ivd0)
  WHERE rn = 1),
ivcc AS (SELECT a.t, e.p,
    CAST(FLOOR(SUM(CAST(FLOOR(e.x * 1e6) AS BIGINT)) / COUNT(*)) AS BIGINT) AS mi
  FROM exv e JOIN iva0 a USING (vec_id) GROUP BY 1, 2),
ivd1 AS (SELECT e.vec_id, c.t,
    CAST(SUM(CAST(FLOOR((e.x - c.mi / 1e6) * (e.x - c.mi / 1e6) * 1e6) AS BIGINT)) AS BIGINT) AS d
  FROM exv e JOIN ivcc c ON c.p = e.p GROUP BY 1, 2),
ivl AS (SELECT vec_id, t AS list_id FROM
  (SELECT vec_id, t, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, t) AS rn FROM ivd1)
  WHERE rn = 1)"""


def _ivf_probe_ctes() -> str:
    """Query-side probe over the trained centroids: requires a CTE
    q(q_id, qv); yields qp(q_id, list_id) with the scaled nprobe."""
    S = simsearch
    return f"""qex AS (SELECT q_id, p, CAST(list_extract(qv, p) AS DOUBLE) AS x
  FROM (SELECT q_id, qv, unnest(generate_series(1, {S.DIM})) AS p FROM q)),
qdq AS (SELECT e.q_id, c.t,
    CAST(SUM(CAST(FLOOR((e.x - c.mi / 1e6) * (e.x - c.mi / 1e6) * 1e6) AS BIGINT)) AS BIGINT) AS d
  FROM qex e JOIN ivcc c ON c.p = e.p GROUP BY 1, 2),
qp AS (SELECT q_id, t AS list_id FROM
  (SELECT q_id, t, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d, t) AS rn FROM qdq), nn
  WHERE rn <= GREATEST({S.IVF_NPROBE}, CAST(CEIL(SQRT(nn.nl)) AS BIGINT)))"""


def _ivf_sql() -> str:
    S = simsearch
    pexp = S.cosine_expr("q.qv", "al.cv", S.DUCK_AT)
    return f"""WITH {_ivf_ctes()},
al AS (SELECT l.vec_id, l.list_id, e.embedding AS cv FROM ivl l
  JOIN embeddings e USING (vec_id)),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
{_ivf_probe_ctes()},
p AS (SELECT qp.q_id, al.vec_id AS c_id, round({pexp}, 6) AS cos
  FROM qp JOIN al USING (list_id) JOIN q ON q.q_id = qp.q_id
  WHERE qp.q_id != al.vec_id),
r AS (SELECT q_id, c_id, cos,
  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk FROM p)
SELECT q_id, c_id, cos, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"""


@Q.register("ivf_topk", _ivf_sql())
def q_ivf_topk(spark, sf):
    return simsearch.ivf_topk(_emb(spark, sf))


@Q.register(
    "ivf_centroids",
    f"WITH {_ivf_ctes()} SELECT t AS list_id, p AS dim, mi FROM ivcc "
    "ORDER BY 1, 2",
)
def q_ivf_centroids(spark, sf):
    """The trained coarse-centroid table itself — direct oracle coverage of
    the distributed Lloyd round (seed sample -> assignment -> micro means)."""
    return simsearch.ivf_centroids(_emb(spark, sf))


@Q.register(
    "list_size_stats",
    f"WITH {_ivf_ctes()} SELECT list_id, COUNT(*) AS n_vecs FROM ivl "
    "GROUP BY 1 ORDER BY 1",
)
def q_list_size_stats(spark, sf):
    """Per-list population of the trained inverted file — the drop-accounting
    surface that makes skewed lists visible (simhash_bucket_stats pattern)."""
    return simsearch.list_size_stats(_emb(spark, sf))


# -- BPE-ish subword token count: letter runs / digit runs / single
# punctuation marks, the GPT-2-style pre-tokenization shape (count only —
# the LLM-pipeline sizing statistic).  Same RE2/Java-compatible ASCII
# class pattern on both engines.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@Q.register(
    "bpe_token_count",
    f"SELECT doc_id, CAST(length(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) "
    "AS n_bpe FROM documents ORDER BY doc_id",
)
def q_bpe_token_count(spark, sf):
    return _docs(spark, sf).select(
        "doc_id",
        F.expr(f"CAST(size(regexp_extract_all(text, '{_BPE_PAT}', 0)) AS BIGINT)")
        .alias("n_bpe"),
    ).orderBy("doc_id")


# -- near-dup clustering + canonical selection (the dedup-pipeline ending):
# connected components over the LSH candidate pairs, representative = min
# doc_id.  Oracle = transitive closure (UNION keeps it a set) + MIN.
@Q.register(
    "dedup_clusters",
    f"""WITH RECURSIVE {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b),
sig AS (SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2),
ok AS (SELECT band, minh FROM sig GROUP BY 1, 2 HAVING COUNT(*) <= 50),
s AS (SELECT sig.* FROM sig JOIN ok USING (band, minh)),
pe AS MATERIALIZED (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
  FROM s a JOIN s c ON a.band = c.band AND a.minh = c.minh AND a.doc_id != c.doc_id),
reachc(id, rid) AS (SELECT d1, d1 FROM pe UNION
  SELECT r.id, e.d2 FROM reachc r JOIN pe e ON e.d1 = r.rid)
SELECT id AS doc_id, CAST(MIN(rid) AS BIGINT) AS canonical
FROM reachc GROUP BY 1 ORDER BY 1""",
)
def q_dedup_clusters(spark, sf):
    return textops.dedup_clusters(_docs(spark, sf))


# -- end-to-end corpus filter (the training-data pipeline composed): a
# document SURVIVES iff (1) language id says 'en', (2) it clears the token
# floor, (3) it is its exact-dup group's representative (min doc_id per
# md5), and (4) it is the canonical member of its near-dup cluster (or in
# no cluster).  One declarative plan — langid scoring, exact-dedup groupBy,
# the one-pass minhash banding, and the cluster propagation all fuse into
# the same DAG; at 100 TB every stage is the already-audited scale shape.
_CF_MIN_TOK = 8


def _corpus_filter_sql() -> str:
    scores = textops.lang_scores_sql()
    order = list(scores)
    cols = ", ".join(f"({s}) AS s_{lang}" for lang, s in scores.items())
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in order) + ")"
    pred = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in order)
        + " END"
    )
    return f"""WITH RECURSIVE {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b),
sig AS (SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2),
okb AS (SELECT band, minh FROM sig GROUP BY 1, 2 HAVING COUNT(*) <= 50),
s AS (SELECT sig.* FROM sig JOIN okb USING (band, minh)),
pe AS MATERIALIZED (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
  FROM s a JOIN s c ON a.band = c.band AND a.minh = c.minh
  AND a.doc_id != c.doc_id),
reachc(id, rid) AS (SELECT d1, d1 FROM pe UNION
  SELECT r.id, e.d2 FROM reachc r JOIN pe e ON e.d1 = r.rid),
canon AS (SELECT id AS doc_id, MIN(rid) AS canonical FROM reachc GROUP BY 1),
lid AS (SELECT doc_id, {pred} AS pred_lang
  FROM (SELECT doc_id, {cols} FROM documents) t),
ex AS (SELECT md5(text) AS h, MIN(doc_id) AS rep FROM documents GROUP BY 1)
SELECT d.doc_id, l.pred_lang,
  CAST({textops.N_TOKENS} AS BIGINT) AS n_tokens
FROM documents d
JOIN lid l ON l.doc_id = d.doc_id
JOIN ex ON ex.h = md5(d.text) AND ex.rep = d.doc_id
LEFT JOIN canon c ON c.doc_id = d.doc_id
WHERE l.pred_lang = 'en' AND {textops.N_TOKENS} >= {_CF_MIN_TOK}
  AND COALESCE(c.canonical, d.doc_id) = d.doc_id
ORDER BY d.doc_id"""


@Q.register("corpus_filter", _corpus_filter_sql())
def q_corpus_filter(spark, sf):
    docs = _docs(spark, sf)
    lid = textops.lang_id(docs)
    base = docs.select(
        "doc_id",
        F.expr(f"CAST({textops.N_TOKENS} AS BIGINT)").alias("n_tokens"),
        F.md5("text").alias("_h"),
    )
    exrep = base.groupBy("_h").agg(F.min("doc_id").alias("_rep"))
    canon = textops.dedup_clusters(docs)
    return (
        base.join(lid, "doc_id")
        .join(exrep, "_h")
        .where(F.col("doc_id") == F.col("_rep"))
        .join(canon, "doc_id", "left")
        .where(F.expr(f"pred_lang = 'en' AND n_tokens >= {_CF_MIN_TOK} "
                      "AND COALESCE(canonical, doc_id) = doc_id"))
        .select("doc_id", "pred_lang", "n_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (web-text quality axis; Rae et al. 2021)
# ---------------------------------------------------------------------------
_REP_SQL = """WITH wrd AS (
  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS w FROM documents),
base AS (
  SELECT doc_id, n_chars, CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_word_ratio
  FROM wrd),
bi AS (
  SELECT doc_id, n_chars, w[i] || ' ' || w[i+1] AS g
  FROM (SELECT doc_id, n_chars, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM wrd WHERE len(w) >= 2)),
bc AS (SELECT doc_id, n_chars, g, COUNT(*) AS cnt FROM bi GROUP BY 1, 2, 3),
topb AS (
  SELECT doc_id, g AS top_bigram,
         CAST(cnt * length(g) AS DOUBLE) / n_chars AS top_bigram_frac
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, g ASC) AS rn FROM bc)
  WHERE rn = 1),
tri AS (
  SELECT doc_id, n_chars, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM (SELECT doc_id, n_chars, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM wrd WHERE len(w) >= 3)),
tc AS (SELECT doc_id, n_chars, g, COUNT(*) AS cnt FROM tri GROUP BY 1, 2, 3),
dup AS (
  SELECT doc_id, CAST(SUM(cnt * length(g)) AS DOUBLE) / n_chars AS dup_trigram_frac
  FROM tc WHERE cnt >= 2 GROUP BY doc_id, n_chars)
SELECT b.doc_id, b.n_words, b.distinct_word_ratio, t.top_bigram,
       t.top_bigram_frac, COALESCE(d.dup_trigram_frac, 0e0) AS dup_trigram_frac
FROM base b
LEFT JOIN topb t ON t.doc_id = b.doc_id
LEFT JOIN dup d ON d.doc_id = b.doc_id
ORDER BY b.doc_id"""


@Q.register("repetition_filter", _REP_SQL)
def q_repetition_filter(spark, sf):
    return textops.repetition_metrics(_docs(spark, sf))


# ---------------------------------------------------------------------------
# Training-mixture construction: deterministic stratified sampling by source
# ---------------------------------------------------------------------------
from .functions import exprs as _X

# per-source keep rate in permille, derived from the source tag (in a real
# pipeline the mixture weights arrive as a broadcast dim table; deriving them
# per-row from the key keeps this query self-contained AND shuffle-free —
# the join the dim-table variant adds is a broadcast hash join, same plan
# family as join_tables)
_MIX_RATE = "(125 * (1 + CAST(substr(source, 4) AS BIGINT) % 7))"
_MIX_U = f"({_X.u2('doc_id')} % 1000)"

_STRAT_SQL = f"""SELECT doc_id, source, {_MIX_RATE} AS rate_permille,
       {_MIX_U} AS u
FROM documents
WHERE {_MIX_U} < {_MIX_RATE}
ORDER BY doc_id"""


@Q.register("stratified_sample", _STRAT_SQL)
def q_stratified_sample(spark, sf):
    """Deterministic stratified sampling for training-data mixture weighting:
    keep each document iff its LCG draw u(doc_id) falls under its source's
    permille rate.  Pure per-row Catalyst arithmetic — zero shuffle, scales
    as a map-only pass at any corpus size; reproducible across runs/engines
    by construction (shared integer LCG, functions/exprs.py)."""
    return (
        _docs(spark, sf)
        .select(
            "doc_id", "source",
            F.expr(_MIX_RATE).alias("rate_permille"),
            F.expr(_MIX_U).alias("u"),
        )
        .where(F.col("u") < F.col("rate_permille"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: shingle overlap vs a (small) eval set
# ---------------------------------------------------------------------------
_DECON_K = 2  # contaminated = shares >= K distinct shingles with the eval set

_DECON_SQL = f"""WITH {_SHINGLE_CTE},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_overlap
  FROM sh s JOIN ev ON ev.shingle = s.shingle
  WHERE s.doc_id % 97 != 0
  GROUP BY s.doc_id)
SELECT doc_id, n_overlap,
       CASE WHEN n_overlap >= {_DECON_K} THEN 1 ELSE 0 END AS contaminated
FROM hits ORDER BY doc_id"""


@Q.register("decontaminate", _DECON_SQL)
def q_decontaminate(spark, sf):
    """Eval-set decontamination: flag training documents sharing >= K distinct
    word-trigram shingles with a benchmark set (here the deterministic
    doc_id % 97 == 0 subset stands in for the eval corpus).

    Scale shape: the eval side is benchmark-sized (thousands of docs, not
    billions), so its distinct-shingle set is broadcast; the corpus side
    streams through a broadcast hash join + doc-keyed count-distinct — no
    corpus-sized shuffle on the shingle key."""
    from pyspark.sql.functions import broadcast

    sh = textops._shingles(_docs(spark, sf))
    ev = (
        sh.where(F.col("doc_id") % 97 == 0)
        .select("shingle").distinct()
    )
    return (
        sh.where(F.col("doc_id") % 97 != 0)
        .join(broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_overlap"))
        .select(
            "doc_id", "n_overlap",
            F.expr(f"CASE WHEN n_overlap >= {_DECON_K} THEN 1 ELSE 0 END")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-then-chunk training batch construction
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512  # tokens per packed training sequence
_PACK_SHARDS = 32
_PACK_SHARD = f"({_X.u1('doc_id')} % {_PACK_SHARDS})"
_PACK_U = f"({_X.u3('doc_id')} % 1000000)"


_PACK_SQL = f"""WITH d AS (
  SELECT doc_id, {_PACK_SHARD} AS shard, {_PACK_U} AS u,
         CAST({textops.N_TOKENS} AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY u, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
  FROM d)
SELECT doc_id, shard, start_tok,
       CAST(FLOOR(CAST(start_tok AS DOUBLE) / {_PACK_BUDGET}e0) AS BIGINT) AS seq_id,
       CASE WHEN start_tok % {_PACK_BUDGET} + n_tokens > {_PACK_BUDGET}
            THEN 1 ELSE 0 END AS straddles
FROM c ORDER BY doc_id"""


@Q.register("pack_sequences", _PACK_SQL)
def q_pack_sequences(spark, sf):
    """Sequence packing (concat-then-chunk): shuffle documents into a
    deterministic LCG order, concatenate per shard, and chunk the token
    stream into fixed-budget training sequences — each document gets its
    shard, global start-token offset, owning sequence id, and a flag for
    straddling a chunk boundary.

    Scale shape: the cumulative sum runs INSIDE hash shards (u1(doc_id) %
    32; production = num sequences-writer tasks), so no global sort/single
    -partition window exists — each shard's running total is an independent
    window over a shuffle-partition-sized slice."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.expr(_PACK_SHARD).alias("shard"),
        F.expr(_PACK_U).alias("u"),
        F.expr(f"CAST({textops.N_TOKENS} AS BIGINT)").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard").orderBy("u", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "doc_id", "shard", "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok"),
    )
    return c.select(
        "doc_id", "shard", "start_tok",
        F.expr(f"CAST(FLOOR(CAST(start_tok AS DOUBLE) / {_PACK_BUDGET}e0) AS BIGINT)")
        .alias("seq_id"),
        F.expr(f"CASE WHEN start_tok % {_PACK_BUDGET} + n_tokens > {_PACK_BUDGET} "
               "THEN 1 ELSE 0 END").alias("straddles"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Tokenizer-training support: corpus vocabulary + one BPE merge iteration
# ---------------------------------------------------------------------------
_VOCAB_K = 50

_VOCAB_SQL = f"""WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
ORDER BY cnt DESC, word ASC LIMIT {_VOCAB_K}"""


@Q.register("vocab_stats", _VOCAB_SQL)
def q_vocab_stats(spark, sf):
    """Corpus vocabulary: top-K words by frequency (tokenizer-training
    input).  explode -> hash agg (partial combine absorbs the fan-out) ->
    orderBy().limit() = TakeOrderedAndProject, a distributed top-k with
    per-partition heads — no global sort at any corpus size."""
    return (
        _docs(spark, sf)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word")).limit(_VOCAB_K)
    )


_BPE_K = 10

_BPE_SQL = f"""WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
v AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
p AS (
  SELECT substr(word, i, 2) AS pair, cnt
  FROM (SELECT word, cnt, unnest(generate_series(1, length(word) - 1)) AS i
        FROM v WHERE length(word) >= 2))
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weight FROM p GROUP BY pair
ORDER BY weight DESC, pair ASC LIMIT {_BPE_K}"""


@Q.register("bpe_merge_step", _BPE_SQL)
def q_bpe_merge_step(spark, sf):
    """One BPE-training merge iteration (Sennrich et al. 2016): adjacent
    character-pair counts over the word vocabulary, weighted by word
    frequency — the argmax row is the pair the tokenizer would merge next
    (top-{_BPE_K} returned; deterministic (weight DESC, pair ASC) order).

    Scale shape: pair extraction runs over the AGGREGATED vocabulary
    (|vocab| << corpus tokens — the same reduction real BPE trainers rely
    on), then one hash agg on a 2-char key + distributed top-k."""
    v = (
        _docs(spark, sf)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        v.where(F.length("word") >= 2)
        .select(
            F.expr("explode(transform(sequence(1, length(word) - 1), "
                   "i -> substr(word, i, 2)))").alias("pair"),
            "cnt",
        )
    )
    return (
        pairs.groupBy("pair").agg(F.sum("cnt").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("pair")).limit(_BPE_K)
    )


# -- CCNet-style paragraph dedup (Wenzek et al. 2020 §4.1): hash fixed
# 20-token blocks ("paragraphs" of the single-line fixture text), keep only
# the first corpus occurrence of each hash in (doc_id, idx) order, reassemble
# the surviving text.  The oracle replays the first-occurrence window rule.
_PARA_SQL = f"""WITH wrd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bl AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // {textops.PARA_BLOCK})) AS idx FROM wrd),
blk AS (SELECT doc_id, idx,
        array_to_string(list_slice(w, idx * {textops.PARA_BLOCK} + 1,
                                   idx * {textops.PARA_BLOCK} + {textops.PARA_BLOCK}), ' ') AS blk
        FROM bl),
r AS (SELECT doc_id, idx, blk,
      ROW_NUMBER() OVER (PARTITION BY md5(blk) ORDER BY doc_id, idx) AS rn FROM blk),
g AS (SELECT doc_id, COUNT(*) AS n_blocks,
      CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
      COALESCE(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY idx), '') AS kept_text
      FROM r GROUP BY 1)
SELECT doc_id, n_blocks, n_dup_blocks, length(kept_text) AS kept_chars, kept_text
FROM g ORDER BY doc_id"""


@Q.register("paragraph_dedup", _PARA_SQL)
def q_paragraph_dedup(spark, sf):
    return textops.paragraph_dedup(_docs(spark, sf))


# -- Exact-substring duplicate spans (Lee et al. 2021): K-token windows with
# corpus count >= 2 merge into maximal per-doc spans; the oracle replays the
# same lag/running-sum island construction.
_SUBSTR_SQL = f"""WITH wrd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - {textops.SUBSTR_K - 1})) AS p0
         FROM wrd WHERE len(w) >= {textops.SUBSTR_K}),
g AS (SELECT doc_id, p0 - 1 AS p,
      md5(array_to_string(list_slice(w, p0, p0 + {textops.SUBSTR_K - 1}), ' ')) AS h FROM wins),
dup AS (SELECT h FROM g GROUP BY 1 HAVING COUNT(*) >= 2),
dp AS (SELECT doc_id, p FROM g JOIN dup USING (h)),
m AS (SELECT doc_id, p,
      CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {textops.SUBSTR_K}
           THEN 1 ELSE 0 END AS brk FROM dp),
s AS (SELECT doc_id, p,
      SUM(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS span_id FROM m),
sp AS (SELECT doc_id, span_id, MAX(p) - MIN(p) + {textops.SUBSTR_K} AS span_len FROM s GROUP BY 1, 2),
agg AS (SELECT doc_id, COUNT(*) AS n_dup_spans, CAST(SUM(span_len) AS BIGINT) AS n_dup_tokens,
        CAST(MAX(span_len) AS BIGINT) AS max_span_len FROM sp GROUP BY 1)
SELECT d.doc_id, COALESCE(n_dup_spans, 0) AS n_dup_spans,
       COALESCE(n_dup_tokens, 0) AS n_dup_tokens,
       COALESCE(max_span_len, 0) AS max_span_len
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""


@Q.register("substring_dedup", _SUBSTR_SQL)
def q_substring_dedup(spark, sf):
    return textops.substring_spans(_docs(spark, sf))


# -- SemDeDup (Abbas et al. 2023): trained corpus-scaled coarse-quantizer
# clusters (shared _ivf_ctes chain), then inside each cluster prune every
# vector with a smaller same-cluster neighbor at cosine >= tau.  With
# n_lists = O(sqrt(n)) the within-list pair volume is O(n^1.5), never
# all-pairs.
def _semdedup_sql() -> str:
    S = simsearch
    pexp = (f"round({S.dot_expr('a.cv', 'b.cv', S.DUCK_AT)}"
            f" / sqrt(a.n) / sqrt(b.n), 6)")
    return f"""WITH {_ivf_ctes()},
alist AS (SELECT l.vec_id, e.embedding AS cv, l.list_id,
    {S.dot_expr('e.embedding', 'e.embedding', S.DUCK_AT)} AS n
  FROM ivl l JOIN embeddings e USING (vec_id)),
pr AS (SELECT DISTINCT b.vec_id FROM alist a JOIN alist b
       ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       WHERE {pexp} >= {S.SEMDEDUP_TAU}e0)
SELECT al.vec_id, al.list_id,
       CASE WHEN pr.vec_id IS NULL THEN 0 ELSE 1 END AS pruned
FROM alist al LEFT JOIN pr ON pr.vec_id = al.vec_id ORDER BY al.vec_id"""


@Q.register("semdedup", _semdedup_sql())
def q_semdedup(spark, sf):
    return simsearch.semdedup(_emb(spark, sf))


# -- Product quantization (Jégou et al. 2011): the encode pass and the
# IVF-PQ asymmetric-distance top-k.  Sub-distances are identical fixed-order
# chains on both engines; the per-candidate 8-way sum runs in integer
# micro-units (FLOOR(d * 1e6)) so aggregation order cannot perturb ranking.
def _pq_sub_cte(vec: str) -> str:
    """UNION ALL over the 8 subspaces of (id cols, s, d) chains for `vec`
    against sd.sv."""
    S = simsearch
    parts = [
        f"SELECT e.vec_id, sd.t, {s} AS s, "
        f"{S.sub_l2_expr(vec, 'sd.sv', S.DUCK_AT, s)} AS d FROM embeddings e, sd"
        for s in range(S.PQ_SUBS)
    ]
    return " UNION ALL ".join(parts)


def _pq_seeds_cte() -> str:
    """The 16-row PQ seed table (constant by design — the PQ codebook's
    size is corpus-independent; capacity comes from the 16^8 code space)."""
    seeds_vals = ", ".join(
        f"({t}, {sid})" for t, sid in enumerate(simsearch.PQ_SEED_IDS)
    )
    return (f"sd AS (SELECT m.t, emb.embedding AS sv "
            f"FROM (VALUES {seeds_vals}) m(t, sid) "
            f"JOIN embeddings emb ON emb.vec_id = m.sid)")


def _pq_codes_sql() -> str:
    return f"""WITH {_pq_seeds_cte()},
sub AS ({_pq_sub_cte('e.embedding')})
SELECT vec_id, s, code FROM
  (SELECT vec_id, s, t AS code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, t) AS rn FROM sub)
WHERE rn = 1 ORDER BY vec_id, s"""


@Q.register("pq_codes", _pq_codes_sql())
def q_pq_codes(spark, sf):
    return simsearch.pq_codes(_emb(spark, sf))


def _pq_full_l2(a: str, b: str) -> str:
    """Full 64-dim fixed-order L2 chain = the 8 subspace chains in order."""
    S = simsearch
    return "(" + " + ".join(
        S.sub_l2_expr(a, b, S.DUCK_AT, s) for s in range(S.PQ_SUBS)
    ) + ")"


def _ivf_pq_sql() -> str:
    S = simsearch
    lut_parts = " UNION ALL ".join(
        f"SELECT q.q_id, sd.t AS code, {s} AS s, "
        f"CAST(FLOOR(({S.sub_l2_expr('q.qv', 'sd.sv', S.DUCK_AT, s)}) * 1e6) AS BIGINT) AS dm "
        "FROM q, sd"
        for s in range(S.PQ_SUBS)
    )
    return f"""WITH {_ivf_ctes()},
{_pq_seeds_cte()},
alist AS (SELECT vec_id, list_id FROM ivl),
sub AS ({_pq_sub_cte('e.embedding')}),
codes AS (SELECT vec_id, s, code FROM
  (SELECT vec_id, s, t AS code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, t) AS rn FROM sub)
  WHERE rn = 1),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
{_ivf_probe_ctes()},
lut AS ({lut_parts}),
cand AS (SELECT qp.q_id, c.vec_id AS c_id, c.s, c.code
  FROM qp JOIN alist al USING (list_id) JOIN codes c ON c.vec_id = al.vec_id
  WHERE qp.q_id != al.vec_id),
ad AS (SELECT cand.q_id, cand.c_id, CAST(SUM(l.dm) AS BIGINT) AS adist_micro
  FROM cand JOIN lut l ON l.q_id = cand.q_id AND l.s = cand.s AND l.code = cand.code
  GROUP BY 1, 2),
short AS (SELECT q_id, c_id, adist_micro FROM
  (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist_micro, c_id) AS srn FROM ad)
  WHERE srn <= {S.PQ_RERANK}),
rer AS (SELECT sh.q_id, sh.c_id, sh.adist_micro,
  CAST(FLOOR(({_pq_full_l2('q.qv', 'e.embedding')}) * 1e6) AS BIGINT) AS l2_micro
  FROM short sh JOIN embeddings e ON e.vec_id = sh.c_id JOIN q ON q.q_id = sh.q_id),
r AS (SELECT q_id, c_id, adist_micro, l2_micro,
  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY l2_micro, c_id) AS rnk FROM rer)
SELECT q_id, c_id, adist_micro, l2_micro, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"""


@Q.register("ivf_pq_topk", _ivf_pq_sql())
def q_ivf_pq_topk(spark, sf):
    return simsearch.ivf_pq_topk(_emb(spark, sf))


# -- Temperature-scaled mixture reweighting (alpha = 0.5): per-source keep
# rate proportional to sqrt(count_s), normalized so the LARGEST source keeps
# 1000 permille — the standard low-resource-upweighting rule (mC4 / PaLM
# style alpha-sampling).  sqrt is correctly rounded in both engines and the
# rate is floored to integer permille, so the draw is engine-exact.
_TEMP_SQL = f"""WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
mx AS (SELECT MAX(cnt) AS mcnt FROM c),
r AS (SELECT lang, cnt,
      CAST(FLOOR(1e3 * sqrt(CAST(cnt AS DOUBLE)) / sqrt(CAST(mcnt AS DOUBLE))) AS BIGINT)
      AS rate_permille FROM c, mx)
SELECT d.doc_id, d.lang, r.cnt AS lang_count, r.rate_permille, {_MIX_U} AS u
FROM documents d JOIN r USING (lang)
WHERE {_MIX_U} < r.rate_permille ORDER BY doc_id"""


@Q.register("temperature_mix", _TEMP_SQL)
def q_temperature_mix(spark, sf):
    """Alpha-temperature mixture sampling over the language strata (the
    multilingual balancing case — `lang` is the skewed column in this
    corpus): the per-stratum rate table is a tiny aggregate (|langs| rows)
    crossed with a 1-row max — both broadcast — then a map-only LCG
    threshold keep over the corpus.  One hash agg + one broadcast hash
    join; no corpus-sized shuffle."""
    docs = _docs(spark, sf)
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    mx = c.agg(F.max("cnt").alias("mcnt"))
    r = c.crossJoin(F.broadcast(mx)).select(
        "lang", "cnt",
        F.expr("CAST(FLOOR(1e3 * sqrt(CAST(cnt AS DOUBLE)) / "
               "sqrt(CAST(mcnt AS DOUBLE))) AS BIGINT)").alias("rate_permille"),
    )
    return (
        docs.join(F.broadcast(r), "lang")
        .select("doc_id", "lang", F.col("cnt").alias("lang_count"),
                "rate_permille", F.expr(_MIX_U).alias("u"))
        .where(F.col("u") < F.col("rate_permille"))
        .orderBy("doc_id")
    )


# -- Hashed linear quality classifier (the fastText-architecture filter used
# for e.g. CCNet/GPT-3 quality scoring): score = mean over tokens of a
# deterministic integer weight keyed by the token hash.  Weights accumulate
# as exact BIGINTs (order-free); the single final division is the only float
# op, so both engines agree bitwise.
_QC_TOKS = """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       FROM documents),
th AS (SELECT doc_id, {hash} AS h FROM tok WHERE length(tok) > 0)"""

_QC_W = "((h * 48271) % 2147483648 - 1073741824)"

_QC_SQL = f"""WITH {_QC_TOKS.format(hash=textops.TOKEN_HASH)},
g AS (SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM({_QC_W}) AS BIGINT) AS logit_sum
      FROM th GROUP BY 1)
SELECT doc_id, n_toks, logit_sum,
       CAST(logit_sum AS DOUBLE) / n_toks / 1073741824e0 AS score,
       CASE WHEN logit_sum > 0 THEN 1 ELSE 0 END AS kept
FROM g ORDER BY doc_id"""


@Q.register("quality_classifier", _QC_SQL)
def q_quality_classifier(spark, sf):
    """One hash-agg pass: explode tokens, integer weight per token hash,
    exact BIGINT sum per doc.  Map-side partial aggregation absorbs the
    token fan-out; the only shuffle keys on doc_id."""
    toks = _docs(spark, sf).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.length("tok") > 0)
    g = (
        toks.select("doc_id", F.expr(textops.TOKEN_HASH).alias("h"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.expr(f"CAST(SUM({_QC_W}) AS BIGINT)").alias("logit_sum"),
        )
    )
    return g.select(
        "doc_id", "n_toks", "logit_sum",
        F.expr("CAST(logit_sum AS DOUBLE) / n_toks / 1073741824e0").alias("score"),
        F.expr("CASE WHEN logit_sum > 0 THEN 1 ELSE 0 END").alias("kept"),
    ).orderBy("doc_id")


# -- Unigram-LM log-probability filter (the CCNet perplexity-proxy shape):
# corpus unigram frequencies -> per-token surprisal quantized to integer
# MILLI-bits -> exact per-doc sum, one final division for the mean.
# Policy note: ln is transcendental — the two engines' libm results are not
# guaranteed bit-identical, so FLOOR-quantizing it technically risks a +-1
# flip when -1e3*log2(p) lands within an ulp of an integer.  The coarse
# milli grid keeps that probability ~x*1e3*2^-52 per distinct vocabulary
# value (~1e-13 here) — three orders of magnitude safer than a micro grid —
# and the quantized values then follow the exact-integer-moment policy.
_UG_SQL = f"""WITH {_QC_TOKS.format(hash="md5(tok)")},
v AS (SELECT h, COUNT(*) AS cnt FROM th GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v),
code AS (SELECT h, CAST(FLOOR(-1e3 * ln(CAST(cnt AS DOUBLE) / total) / ln(2e0)) AS BIGINT)
         AS bits_milli FROM v, tot),
g AS (SELECT t.doc_id, COUNT(*) AS n_toks, CAST(SUM(c.bits_milli) AS BIGINT) AS bits_sum
      FROM th t JOIN code c ON c.h = t.h GROUP BY 1)
SELECT doc_id, n_toks, bits_sum,
       CAST(bits_sum AS DOUBLE) / n_toks / 1e3 AS mean_bits
FROM g ORDER BY doc_id"""


@Q.register("unigram_logprob", _UG_SQL)
def q_unigram_logprob(spark, sf):
    """Vocabulary agg (hash groupBy on the token hash — uniform keys), a
    1-row total broadcast, then a hash equi-join of the token stream back
    against the coded vocabulary and a per-doc sum.  At web scale the
    vocabulary table shuffles once and the join is plain hash-partition —
    never a driver collect."""
    toks = _docs(spark, sf).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.length("tok") > 0).select("doc_id", F.md5("tok").alias("h"))
    v = toks.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    tot = v.agg(F.expr("CAST(SUM(cnt) AS BIGINT)").alias("total"))
    code = v.crossJoin(F.broadcast(tot)).select(
        "h",
        F.expr("CAST(FLOOR(-1e3 * ln(CAST(cnt AS DOUBLE) / total) / ln(2e0)) "
               "AS BIGINT)").alias("bits_milli"),
    )
    g = (
        toks.join(code, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"),
             F.expr("CAST(SUM(bits_milli) AS BIGINT)").alias("bits_sum"))
    )
    return g.select(
        "doc_id", "n_toks", "bits_sum",
        F.expr("CAST(bits_sum AS DOUBLE) / n_toks / 1e3").alias("mean_bits"),
    ).orderBy("doc_id")


# -- Full modern filter chain (Gopher/CCNet-style pipeline ending): the
# corpus_filter survivors (langid + token floor + exact-rep + near-dup
# canonical) further gated by the repetition metrics and the hashed linear
# classifier score.  Still ONE declarative plan — each stage is the
# already-audited shape; composition adds two doc_id equi-joins.
_CF2_SCORE = "-0.05e0"   # classifier floor
_CF2_DUP3 = "0.2e0"      # max duplicated-trigram char fraction
_CF2_DWR = "0.3e0"       # min distinct-word ratio


def _corpus_filter2_sql() -> str:
    return f"""SELECT cf.doc_id, cf.pred_lang, cf.n_tokens,
       r.dup_trigram_frac, r.distinct_word_ratio, qc.score
FROM ({_corpus_filter_sql()}) cf
JOIN ({_REP_SQL}) r USING (doc_id)
JOIN ({_QC_SQL}) qc USING (doc_id)
WHERE qc.score > {_CF2_SCORE}
  AND r.dup_trigram_frac <= {_CF2_DUP3}
  AND r.distinct_word_ratio >= {_CF2_DWR}
ORDER BY cf.doc_id"""


@Q.register("corpus_filter2", _corpus_filter2_sql())
def q_corpus_filter2(spark, sf):
    cf = q_corpus_filter(spark, sf)
    rep = textops.repetition_metrics(_docs(spark, sf)).select(
        "doc_id", "dup_trigram_frac", "distinct_word_ratio"
    )
    qc = q_quality_classifier(spark, sf).select("doc_id", "score")
    return (
        cf.join(rep, "doc_id")
        .join(qc, "doc_id")
        .where(F.expr(
            f"score > {_CF2_SCORE} AND dup_trigram_frac <= {_CF2_DUP3} "
            f"AND distinct_word_ratio >= {_CF2_DWR}"
        ))
        .select("doc_id", "pred_lang", "n_tokens", "dup_trigram_frac",
                "distinct_word_ratio", "score")
        .orderBy("doc_id")
    )


# -- Iterated BPE training (Sennrich et al. 2016): 3 full merge rounds with
# symbol-sequence REWRITING between rounds (bpe_merge_step only scores round
# one).  Symbol sequences live in a bracketed string ('|a||b||c|'): each
# symbol carries its own delimiters, so replace('|pa||pb|' -> '|papb|') is
# the exact greedy left-to-right non-overlapping BPE merge in BOTH engines
# (no boundary-sharing bug, no lambda fold needed).  All counts are exact
# integers; the merge argmax orders (weight DESC, pa, pb).
_BPE_ITERS = 3


def _bpe_train_sql() -> str:
    lvls = ["""v0 AS (SELECT word, cnt, regexp_replace(word, '(.)', '|\\1|', 'g') AS s
  FROM (SELECT word, COUNT(*) AS cnt FROM
        (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE length(word) > 0 GROUP BY 1))"""]
    stats = []
    for k in range(_BPE_ITERS):
        lvls.append(f"""a{k} AS (SELECT cnt, string_split(trim(s, '|'), '||') AS arr FROM v{k}),
p{k} AS (SELECT arr[i] AS pa, arr[i+1] AS pb, cnt
  FROM (SELECT cnt, arr, unnest(generate_series(1, len(arr) - 1)) AS i
        FROM a{k} WHERE len(arr) >= 2)),
w{k} AS (SELECT pa, pb, CAST(SUM(cnt) AS BIGINT) AS weight FROM p{k} GROUP BY 1, 2),
b{k} AS (SELECT pa, pb, weight FROM w{k} ORDER BY weight DESC, pa, pb LIMIT 1),
v{k + 1} AS (SELECT word, cnt,
  replace(s, '|' || pa || '||' || pb || '|', '|' || pa || pb || '|') AS s
  FROM v{k}, b{k})""")
        stats.append(
            f"SELECT {k} AS iter, pa, pb, weight, "
            f"CAST(SUM(cnt * ((length(s) - length(replace(s, '|', ''))) // 2)) AS BIGINT) "
            f"AS n_symbols FROM v{k + 1}, b{k} GROUP BY 1, 2, 3, 4"
        )
    return ("WITH " + ",\n".join(lvls) + "\n"
            + " UNION ALL ".join(stats) + " ORDER BY iter")


@Q.register("bpe_train", _bpe_train_sql())
def q_bpe_train(spark, sf):
    """The registry's 3-merge oracle-checked instance of the PARAMETERIZED
    trainer (operators/textops.py bpe_train — n_merges is an argument;
    tests/test_textpipe.py replays 50 merges against a sequential Python
    oracle).  See the operator docstring for the per-merge cost model."""
    return textops.bpe_train(_docs(spark, sf), n_merges=_BPE_ITERS)


# -- BPE encode: apply the 3 learned merges back to the corpus (the
# train -> encode loop closed).  The merge table is 3 rows; encoding is a
# map-only chain of the same bracketed-string replaces, applied per word
# and summed per document.
def _bpe_encode_sql() -> str:
    # reuse the training CTE levels; encode chains the 3 learned replaces
    train = _bpe_train_sql()
    head = train[: train.rindex("\n")]  # strip the final UNION/ORDER select
    rep = "regexp_replace(word, '(.)', '|\\1|', 'g')"
    for k in range(_BPE_ITERS):
        rep = (f"replace({rep}, '|' || (SELECT pa FROM b{k}) || '||' || "
               f"(SELECT pb FROM b{k}) || '|', '|' || (SELECT pa FROM b{k}) "
               f"|| (SELECT pb FROM b{k}) || '|')")
    return f"""{head}
SELECT doc_id, CAST(SUM((length(enc) - length(replace(enc, '|', ''))) // 2) AS BIGINT)
       AS n_bpe_tokens
FROM (SELECT doc_id, {rep} AS enc
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0)
GROUP BY 1 ORDER BY doc_id"""


@Q.register("bpe_encode", _bpe_encode_sql())
def q_bpe_encode(spark, sf):
    """Per-document token count under the 3-merge BPE model: the learned
    merge pairs arrive as three 1-row broadcasts (chained crossJoins of
    bounded sides); encoding is pure map-side string replaces over the
    exploded token stream, then one doc_id hash agg."""
    merges = q_bpe_train(spark, sf).select("iter", "pa", "pb")
    toks = (
        _docs(spark, sf)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .withColumn("enc", F.expr("regexp_replace(word, '(.)', '|$1|')"))
    )
    for it in range(_BPE_ITERS):
        m = merges.where(F.col("iter") == it).select(
            F.col("pa").alias(f"pa{it}"), F.col("pb").alias(f"pb{it}"))
        toks = toks.crossJoin(F.broadcast(m)).withColumn(
            "enc", F.expr(f"replace(enc, '|' || pa{it} || '||' || pb{it} || '|', "
                          f"'|' || pa{it} || pb{it} || '|')"))
    return (
        toks.groupBy("doc_id")
        .agg(F.expr("CAST(SUM((length(enc) - length(replace(enc, '|', ''))) DIV 2) "
                    "AS BIGINT)").alias("n_bpe_tokens"))
        .orderBy("doc_id")
    )


# -- PQ codebook training (one Lloyd round) + trained-codebook encode and
# search.  All arithmetic is integer-micro (elements and squared residuals
# quantize to BIGINT before any group sum; the centroid mean is one double
# division + FLOOR — identical IEEE ops in both engines).
def _pq_ex_cte(src: str, idc: str, vec: str) -> str:
    S = simsearch
    return (f"(SELECT {idc}, (p - 1) // {S.PQ_SUBDIM} AS s, "
            f"(p - 1) % {S.PQ_SUBDIM} + 1 AS dim, "
            f"CAST(list_extract({vec}, p) AS DOUBLE) AS x "
            f"FROM (SELECT {idc}, {vec}, unnest(generate_series(1, {S.DIM})) AS p "
            f"FROM {src}))")


_PQ_CB_CTES = None


def _pq_cb_ctes() -> str:
    """sd + seed-codebook codes0 + element long table + trained codebook."""
    return f"""{_pq_seeds_cte()},
sub AS ({_pq_sub_cte('e.embedding')}),
codes0 AS (SELECT vec_id, s, code FROM
  (SELECT vec_id, s, t AS code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, t) AS rn FROM sub)
  WHERE rn = 1),
ex AS {_pq_ex_cte('embeddings', 'vec_id', 'embedding')},
cb AS (SELECT c0.code, e.s, e.dim,
  CAST(FLOOR(SUM(CAST(FLOOR(e.x * 1e6) AS BIGINT)) / COUNT(*)) AS BIGINT) AS mi
  FROM ex e JOIN codes0 c0 ON c0.vec_id = e.vec_id AND c0.s = e.s
  GROUP BY 1, 2, 3)"""


@Q.register(
    "pq_codebook",
    f"WITH {_pq_cb_ctes()} SELECT code, s, dim, mi FROM cb ORDER BY code, s, dim",
)
def q_pq_codebook(spark, sf):
    return simsearch.pq_train_codebook(_emb(spark, sf))


_PQ_DTR = """dtr AS (SELECT e.vec_id, e.s, cb.code,
  CAST(SUM(CAST(FLOOR((e.x - cb.mi / 1e6) * (e.x - cb.mi / 1e6) * 1e6) AS BIGINT))
  AS BIGINT) AS d
  FROM ex e JOIN cb ON cb.s = e.s AND cb.dim = e.dim GROUP BY 1, 2, 3),
codes1 AS (SELECT vec_id, s, code FROM
  (SELECT vec_id, s, code,
          ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn FROM dtr)
  WHERE rn = 1)"""


@Q.register(
    "pq_codes_trained",
    f"WITH {_pq_cb_ctes()},\n{_PQ_DTR} "
    "SELECT vec_id, s, code FROM codes1 ORDER BY vec_id, s",
)
def q_pq_codes_trained(spark, sf):
    return simsearch.pq_codes_trained(_emb(spark, sf))


def _ivf_pq_trained_sql() -> str:
    S = simsearch
    return f"""WITH {_pq_cb_ctes()},
{_PQ_DTR},
{_ivf_ctes()},
alist AS (SELECT vec_id, list_id FROM ivl),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
{_ivf_probe_ctes()},
qsx AS {_pq_ex_cte('q', 'q_id', 'qv')},
lutt AS (SELECT qe.q_id, cb.code, qe.s,
  CAST(SUM(CAST(FLOOR((qe.x - cb.mi / 1e6) * (qe.x - cb.mi / 1e6) * 1e6) AS BIGINT))
  AS BIGINT) AS dm
  FROM qsx qe JOIN cb ON cb.s = qe.s AND cb.dim = qe.dim GROUP BY 1, 2, 3),
cand AS (SELECT qp.q_id, c.vec_id AS c_id, c.s, c.code
  FROM qp JOIN alist al USING (list_id) JOIN codes1 c ON c.vec_id = al.vec_id
  WHERE qp.q_id != al.vec_id),
ad AS (SELECT cand.q_id, cand.c_id, CAST(SUM(l.dm) AS BIGINT) AS adist_micro
  FROM cand JOIN lutt l ON l.q_id = cand.q_id AND l.s = cand.s AND l.code = cand.code
  GROUP BY 1, 2),
short AS (SELECT q_id, c_id, adist_micro FROM
  (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist_micro, c_id) AS srn FROM ad)
  WHERE srn <= {S.PQ_RERANK}),
rer AS (SELECT sh.q_id, sh.c_id, sh.adist_micro,
  CAST(FLOOR(({_pq_full_l2('q.qv', 'e.embedding')}) * 1e6) AS BIGINT) AS l2_micro
  FROM short sh JOIN embeddings e ON e.vec_id = sh.c_id JOIN q ON q.q_id = sh.q_id),
r AS (SELECT q_id, c_id, adist_micro, l2_micro,
  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY l2_micro, c_id) AS rnk FROM rer)
SELECT q_id, c_id, adist_micro, l2_micro, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"""


@Q.register("ivf_pq_topk_trained", _ivf_pq_trained_sql())
def q_ivf_pq_topk_trained(spark, sf):
    return simsearch.ivf_pq_topk_trained(_emb(spark, sf))
