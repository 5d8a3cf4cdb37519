"""SURVEY §2.10 registrations — LLM-data-pipeline operators (L1-L5)
over ``documents`` and ``embeddings``.

Oracle notes: the shared tokenizer is a single-space split with empty
tokens dropped — ``list_filter(string_split(text,' '), x -> x != '')``
in DuckDB, ``F.filter(F.split(text,' '), x -> x != '')`` in Spark.
MinHash / SimHash / IVF use xxhash64 (no DuckDB equivalent) → rows-only
driver checks; their semantics are pinned against the oracle-checked
exact forms in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..llm.similarity import label_centroids
from ..llm.text import tfidf_top_terms
from ..llm import (
    attach_payload,
    canonical_dedup_groups,
    cosine_topk,
    doc_fingerprints,
    embedding_near_dup_pairs,
    exact_dedup_groups,
    extract_binary_features,
    ivf_topk,
    langid_confusion,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    text_quality_by_lang,
    token_counts_by_source,
)
from .base import register

_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"


@register(
    "llm_dedup_exact",
    survey_ids="L1,A3",
    oracle=f"""
SELECT sha256(text) AS content_hash,
       min(doc_id) AS survivor_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact content dedup via sha256(text); deterministic survivor
    = min doc_id. One map-side hash + one shuffle at any scale."""
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "llm_dedup_canonical",
    survey_ids="L1,F6,F7",
    oracle=f"""
SELECT sha256(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
         AS canon_hash,
       min(doc_id) AS survivor_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
HAVING count(*) > 1
""",
)
def llm_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+: dedup on the sorted distinct token set — catches reordered
    copies (21 planted groups at sf0.01) while staying one hash-agg."""
    return canonical_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "llm_ngram_jaccard_pairs",
    survey_ids="L2,J2,A3",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1]))) AS sh
  FROM toks WHERE len(t) >= 2
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (x.n_sh + y.n_sh - common), 6) AS jaccard
FROM pairs
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
""",
)
def llm_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 ground truth: bigram-shingle Jaccard >= 0.5 pairs via shingle
    explode + self-join (the exact verifier behind the LSH paths)."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register("llm_minhash_pairs", survey_ids="L2,U3")
def llm_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 scale path: MinHash(32) + LSH(8 bands x 4) candidates, exact-
    Jaccard verified >= 0.5. Rows-only driver check (xxhash64 has no
    DuckDB twin); recall vs llm_ngram_jaccard_pairs pinned in tests."""
    return minhash_near_dup_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "llm_minhash_pairs_portable",
    survey_ids="L2,U3,J2",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1]))) AS sh
  FROM toks WHERE len(t) >= 2
), seeds AS (
  SELECT unnest(generate_series(0, 31)) AS seed
), mh AS (
  SELECT doc_id, seed,
         min(md5(CAST(seed AS VARCHAR) || '|' || sh)) AS mh
  FROM sh, seeds GROUP BY doc_id, seed
), sig AS (
  SELECT doc_id, list(mh ORDER BY seed) AS sig FROM mh GROUP BY doc_id
), bandids AS (
  SELECT unnest(generate_series(0, 7)) AS b
), bands AS (
  SELECT doc_id, b,
         md5(array_to_string(sig[b * 4 + 1 : b * 4 + 4], ',')) AS bucket
  FROM sig, bandids
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
  SELECT cand.doc_a, cand.doc_b, count(*) AS common
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (x.n_sh + y.n_sh - common), 6) AS jaccard
FROM pairs
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
""",
)
def llm_minhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: md5-hash-family MinHash+LSH — the full approximate pipeline
    (signatures, banding, bucket pairs, exact verification) replayed
    step-for-step by the DuckDB oracle. Proves the LSH machinery, not
    just its ground truth."""
    from ..llm.dedup import minhash_near_dup_pairs_portable

    return minhash_near_dup_pairs_portable(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


@register("llm_simhash_pairs", survey_ids="L2")
def llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: 64-bit SimHash pairs at Hamming <= 3 with pigeonhole chunk
    blocking (4 x 16-bit). Rows-only driver check (xxhash64 bits);
    ``llm_simhash_pairs_portable`` oracle-checks the same machinery."""
    return simhash_near_dup_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "llm_simhash_pairs_portable",
    survey_ids="L2",
    oracle=f"""
WITH tc AS (
  SELECT doc_id, tok, count(*) AS cnt FROM (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
  ) GROUP BY 1, 2
), bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN
               ((strpos('0123456789abcdef',
                        substr(md5(tok), j // 4 + 1, 1)) - 1)
                >> (3 - j % 4)) & 1 = 1
             THEN cnt ELSE -cnt END) AS s
  FROM tc, (SELECT unnest(generate_series(0, 63)) AS j)
  GROUP BY 1, 2
), sig AS (
  SELECT doc_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sh
  FROM bits GROUP BY 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(list_sum(list_transform(generate_series(1, 64),
         i -> CASE WHEN a.sh[i] != b.sh[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE list_sum(list_transform(generate_series(1, 64),
        i -> CASE WHEN a.sh[i] != b.sh[i] THEN 1 ELSE 0 END)) <= 3
""",
)
def llm_simhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: md5-bit SimHash pairs at Hamming <= 3 — the DuckDB oracle
    does the quadratic scan, and pigeonhole blocking (Hamming <= 3 over
    4 chunks forces a shared chunk) makes the blocked Spark output
    EQUAL to it, so the approximate path itself is oracle-checked."""
    from ..llm.dedup import simhash_near_dup_pairs_portable

    return simhash_near_dup_pairs_portable(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


@register(
    "llm_embedding_near_dup",
    survey_ids="L2,L3,J5",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < 1000
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))) >= 0.4
""",
)
def llm_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: embedding-cosine near-dup pairs (cos >= 0.4 — the corpus max
    is ~0.51). Exact all-pairs GROUND TRUTH, so the registration caps
    the quadratic scan at max_id=1000 vectors (covers all of sf0.01;
    the filter sits before the crossJoin in the plan) — llm_srp_pairs
    is the uncapped scale path."""
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, max_id=1000
    )


@register(
    "llm_cosine_topk",
    survey_ids="L3,O1,O3",
    oracle="""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, label,
       round(list_dot_product(embedding::DOUBLE[], qe)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qe, qe))), 6) AS cosine
FROM embeddings, q
WHERE vec_id != 0
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 baseline: exact cosine top-10 for the vec_id=0 query vector —
    broadcast query, one scan, TakeOrderedAndProject."""
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "llm_ivf_topk",
    survey_ids="L3",
    oracle="""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8
), q AS (
  SELECT v AS qe FROM e WHERE vec_id = 0
), assign AS (
  SELECT vec_id, label, v, centroid_id FROM (
    SELECT e.vec_id, e.label, e.v, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
               c.centroid_id
           ) AS rn
    FROM e, cent c
  ) WHERE rn = 1
), probe AS (
  SELECT centroid_id FROM (
    SELECT c.centroid_id,
           round(list_dot_product(c.cv, q.qe)
             / (sqrt(list_dot_product(c.cv, c.cv))
                * sqrt(list_dot_product(q.qe, q.qe))), 9) AS qcos
    FROM cent c, q
  ) ORDER BY qcos DESC, centroid_id LIMIT 4
)
SELECT vec_id, label, round(cos, 6) AS cosine FROM (
  SELECT a.vec_id, a.label,
         list_dot_product(a.v, q.qe)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(q.qe, q.qe))) AS cos
  FROM assign a JOIN probe USING (centroid_id), q
  WHERE a.vec_id != 0
)
ORDER BY round(cos, 6) DESC, vec_id
LIMIT 10
""",
)
def llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: IVF-pruned top-10 (8 coarse cells, probe 4) —
    deterministic tie-breaks make the whole pruned search replayable in
    SQL, so even the approximate path is oracle-checked; recall vs
    llm_cosine_topk additionally pinned in tests."""
    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_vec_id=0,
        k=10,
        n_centroids=8,
        nprobe=4,
    )


@register(
    "llm_text_quality",
    survey_ids="L4,A3",
    oracle=f"""
WITH per_doc AS (
  SELECT lang,
         length(text) AS n_chars,
         len({_TOKS}) AS n_tokens,
         len(list_distinct({_TOKS})) AS n_distinct_tokens,
         len(list_filter({_TOKS},
             x -> x IN ('the','a','of','and','to','in'))) * 1.0
           / len({_TOKS}) AS stopword_ratio,
         (length(text) - (len({_TOKS}) - 1)) * 1.0
           / len({_TOKS}) AS avg_token_len
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(avg(n_tokens), 6) AS avg_tokens,
       round(avg(n_distinct_tokens), 6) AS avg_distinct_tokens,
       round(avg(stopword_ratio), 6) AS avg_stopword_ratio,
       round(avg(avg_token_len), 6) AS avg_token_len
FROM per_doc GROUP BY lang
""",
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: quality-scoring profile per lang (length / diversity /
    stopword ratios) — the thresholds a data pipeline filters on."""
    return text_quality_by_lang(load_table(spark, sf_dir, "documents"))


@register(
    "llm_token_counts",
    survey_ids="L4,F6",
    oracle="""
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
           AS n_bpe
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       min(n_bpe) AS min_bpe,
       max(n_bpe) AS max_bpe,
       round(avg(n_bpe), 6) AS avg_bpe
FROM per_doc GROUP BY source
""",
)
def llm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: BPE-ish pre-tokenizer counts per source (token budgeting)."""
    return token_counts_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "llm_langid",
    survey_ids="L4,F9",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         len(list_filter({_TOKS}, x -> x IN ('the','a','and','of'))) AS s_en,
         len(list_filter({_TOKS}, x -> x IN ('der','die','und','nicht'))) AS s_de,
         len(list_filter({_TOKS}, x -> x IN ('el','la','que','los'))) AS s_es,
         len(list_filter({_TOKS}, x -> x IN ('le','la','et','les'))) AS s_fr,
         0 AS s_zh
  FROM documents
), pred AS (
  SELECT lang,
         CASE
           WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh)
                AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'en'
           WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh)
                AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'de'
           WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh)
                AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'es'
           WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh)
                AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'fr'
           WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh)
                AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'zh'
           ELSE 'und'
         END AS predicted
  FROM scored
)
SELECT lang, predicted, count(*) AS n_docs
FROM pred GROUP BY 1, 2
""",
)
def llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 (F9 generalized): marker-token language ID with fixed
    priority tie-break; labeled x predicted confusion counts."""
    return langid_confusion(load_table(spark, sf_dir, "documents"))


@register(
    "llm_fingerprints",
    survey_ids="L4,F10",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_TOKS},
             x -> CAST(length(x) * 31 + ascii(x) AS BIGINT))),
         (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fingerprint,
       length(text) AS n_chars
FROM documents
""",
)
def llm_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: order-sensitive polynomial rolling-hash fingerprint per doc
    — pure integer Column arithmetic (codegen'd, no UDF)."""
    return doc_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "llm_tfidf_top_terms",
    survey_ids="L4,W2,A3,U3",
    oracle=f"""
WITH tok AS (
  SELECT source,
         unnest(list_filter({_TOKS},
           x -> x NOT IN ('the','a','of','and','to','in'))) AS token
  FROM documents
), tf AS (
  SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.source, tf.token,
         round(tf.tf * ln((SELECT count(DISTINCT source) FROM documents)
                          * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token)
), ranked AS (
  SELECT source, token, tfidf,
         row_number() OVER (PARTITION BY source
                            ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT source, token, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: top-5 terms per source by tf-idf, relational form (inverted
    index build + per-source window top-k)."""
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=5)


@register(
    "llm_label_centroids",
    survey_ids="L3,L5,A3,U3",
    oracle="""
SELECT label, i AS pos,
       round(avg(embedding[i]), 6) AS avg_val
FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
GROUP BY label, i
""",
)
def llm_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3/L5: per-label embedding centroid, long (label, pos) form —
    the class-prototype computation behind nearest-centroid search."""
    return label_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "llm_quality_filter",
    survey_ids="L4,P7",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE length(text) BETWEEN 120 AND 450
  AND len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) >= 0.35
  AND len(list_filter({_TOKS},
        x -> x IN ('the','a','of','and','to','in'))) * 1.0
      / len({_TOKS}) <= 0.12
""",
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: the training-pipeline primitive the quality profile feeds —
    keep docs passing length / lexical-diversity / stopword-ratio
    thresholds. Pure predicates: pushes to the scan."""
    from ..llm.text import quality_columns

    docs = load_table(spark, sf_dir, "documents")
    q = quality_columns()
    diversity = q["n_distinct_tokens"] / q["n_tokens"]
    return docs.filter(
        q["n_chars"].between(120, 450)
        & (diversity >= 0.35)
        & (q["stopword_ratio"] <= 0.12)
    ).select("doc_id", "lang", "source")


@register(
    "llm_near_dedup_survivors",
    survey_ids="L1,L2,J4",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1]))) AS sh
  FROM toks WHERE len(t) >= 2
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), dup_pairs AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes x ON doc_a = x.doc_id
  JOIN sizes y ON doc_b = y.doc_id
  WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_b FROM dup_pairs)
""",
)
def llm_near_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L2 applied: the deduplicated corpus — drop every doc that is
    the higher-id member of a near-dup pair (greedy min-id survivor;
    anti-join against the pair table). At scale the pair table comes
    from the MinHash path; here the oracle-checked exact pairs prove
    the anti-join semantics."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


@register(
    "llm_dedup_clusters",
    survey_ids="L1,L2,J2",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1]))) AS sh
  FROM toks WHERE len(t) >= 2
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), dup_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) * 1.0 / (
    (SELECT n_sh FROM sizes WHERE doc_id = a.doc_id)
    + (SELECT n_sh FROM sizes WHERE doc_id = b.doc_id) - count(*)) >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
  UNION ALL SELECT doc_b, doc_a FROM dup_pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY 1
""",
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L2 applied: connected components over the exact near-dup pair
    graph — every doc labeled with the min doc_id of its dup cluster
    (singletons keep their own id). Spark side: HashMin label
    propagation, one co-partitioned shuffle per round; oracle side: the
    same fixpoint as a DuckDB recursive CTE. An oracle-checked
    ITERATIVE algorithm — the piece of a training-data dedup pipeline
    that plain SQL engines struggle to scale."""
    from ..llm.dedup import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return near_dup_clusters(docs, pairs)


@register(
    "llm_srp_pairs",
    survey_ids="L2,L3,J5",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bits AS (
  SELECT vec_id, p,
         CASE WHEN list_sum(list_transform(generate_series(1, 64),
           i -> v[i] * (strpos('0123456789abcdef',
                 substr(md5(CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)),
                        1, 1)) - 8))) > 0
         THEN '1' ELSE '0' END AS b
  FROM e, (SELECT unnest(generate_series(0, 31)) AS p)
), sig AS (
  SELECT vec_id, string_agg(b, '' ORDER BY p) AS sig FROM bits GROUP BY 1
), bands AS (
  SELECT vec_id, bnd, substr(sig, bnd * 4 + 1, 4) AS bucket
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS bnd)
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.bnd = b.bnd AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM (
  SELECT id_a, id_b,
         list_dot_product(x.v, y.v)
           / (sqrt(list_dot_product(x.v, x.v))
              * sqrt(list_dot_product(y.v, y.v))) AS cos
  FROM cand JOIN e x ON id_a = x.vec_id JOIN e y ON id_b = y.vec_id
)
WHERE cos >= 0.4
""",
)
def llm_srp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3: sign-random-projection LSH over embeddings — md5-derived
    integer hyperplanes make the signature, banding, candidate set and
    cosine verification all replayable in DuckDB, so the approximate
    ANN path itself is oracle-checked (the embedding analog of
    llm_minhash_pairs_portable)."""
    from ..llm.similarity import srp_near_dup_pairs

    return srp_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "llm_stratified_sample",
    survey_ids="L4,W1,P7",
    oracle="""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars FROM ranked WHERE rk <= 20
""",
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: balanced corpus subsampling — EXACTLY 20 docs per language,
    chosen by rank over a content-derived hash: deterministic,
    engine-independent, rerun-stable (TABLESAMPLE / rand() can be
    neither oracle-checked nor replayed). One window per stratum; at
    100 TB the per-stratum sort is bounded by the quota via
    rank-pushdown (WindowGroupLimit in the physical plan)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
        .drop("rk")
    )


@register(
    "llm_sequence_packing",
    survey_ids="L4,W4,F16",
    oracle="""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tok
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tok) / 512) AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY 1, 2
""",
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: sequence packing for pretraining — docs stream in doc_id
    order per source and are assigned to consecutive ~512-token packs
    by their running token count (pack = floor(prefix_sum/budget)).
    One window per source partition, no Python; the reduce-side state
    is a single running sum, so packing 100 TB is one sort-within-
    partition pass."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit("")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
    ).select(
        "source",
        "doc_id",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512).alias("pack_id"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
    )


@register(
    "llm_frame_sample",
    survey_ids="L5,U3,U1",
    oracle="""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(least(256, octet_length(encode(text)) - (i - 1) * 256) AS INT)
         AS frame_len,
       md5(substr(text, (i - 1) * 256 + 1, 256)) AS frame_md5
FROM documents,
     unnest(generate_series(1,
       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT))) AS u(i)
""",
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: frame sampling — each payload expands to fixed-size byte
    windows inside one mapInPandas pass (metadata + md5 out, raw bytes
    dropped in-task). Oracle replays the same windows with substr+md5
    (payload is the utf-8 text: ASCII corpus, so byte and char windows
    coincide)."""
    from ..llm.multimodal import sample_frames

    return sample_frames(attach_payload(load_table(spark, sf_dir, "documents")))


@register(
    "llm_hash_sample",
    survey_ids="L4,L1,A3,P7",
    oracle="""
SELECT source,
       count(*) AS n_sampled,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents
WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')
GROUP BY source
""",
)
def llm_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: deterministic content-hash sampling (~4/16 = 25%) — the
    reproducible corpus-subsetting technique: membership is a pure
    function of content, so reruns, engines, and partitionings all
    agree (rand()-based sampling can't be oracle-checked or replayed).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.substring(F.md5("text"), 1, 1).isin("0", "1", "2", "3"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "llm_multimodal_features",
    survey_ids="L5,U1,U4",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       ascii(substr(text, 1, 1)) AS first_byte,
       ascii(substr(text, length(text), 1)) AS last_byte,
       'stub' AS tag
FROM documents
""",
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-payload plumbing — utf-8 payload column + Arrow-
    batched mapInPandas feature extraction through the injected stub
    decoder (real-codec seam raises NotImplementedError by design)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_features(attach_payload(docs))
