"""Gate + oracle twins for WordPiece tokenizer training/segmentation
(operators/wordpiece). The oracles replay TRAINING itself — every
round's pair counts, symbol counts, the double-precision likelihood
ranking (cnt_ab / (cnt_a · cnt_b)), the greedy disjoint admission, and
the fused fold application — as recursive DuckDB CTEs running the same
op sequence, so a drift in the objective, tie-break, marker handling,
or fold greediness flips a merge and mismatches."""

from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir

from pyspark.sql import functions as F

_SEP2 = "chr(2) || chr(2)"

# a word as BERT-marked symbols, sentinel-delimited: first char plain,
# later chars ##-prefixed (the trainer's t0 representation)
_MARKED = """chr(2) || array_to_string(
           list_transform(range(1, len({w}) + 1),
             i -> CASE WHEN i = 1 THEN substr({w}, CAST(i AS INT), 1)
                  ELSE '##' || substr({w}, CAST(i AS INT), 1) END),
           chr(2) || chr(2)) || chr(2)"""


def _wp_train_ctes(
    batch: int, pool: int, rounds: int, corpus: str = "documents"
) -> tuple[str, str]:
    """(WITH-clause, admitted-merges-union) replaying
    wordpiece_learn(batch, pool, rounds) over ``corpus``."""
    ctes = [
        f"""w AS MATERIALIZED (
  SELECT tok AS w, COUNT(*) AS freq FROM (
    SELECT UNNEST(string_split(trim(text), ' ')) AS tok FROM {corpus}
  ) WHERE LENGTH(tok) > 0 GROUP BY tok
), t0 AS MATERIALIZED (
  SELECT freq, {_MARKED.format(w="w")} AS s
  FROM w
)"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT ls[j] AS l, ls[j + 1] AS r, SUM(freq) AS cnt
  FROM (SELECT freq,
               string_split(substr(s, 2, len(s) - 2), {_SEP2}) AS ls
        FROM t{i - 1}),
       UNNEST(range(1, len(ls))) AS u(j)
  GROUP BY 1, 2
), sc{i} AS MATERIALIZED (
  SELECT sym, SUM(freq) AS cnt FROM (
    SELECT freq,
           UNNEST(string_split(substr(s, 2, len(s) - 2), {_SEP2})) AS sym
    FROM t{i - 1}
  ) GROUP BY 1
), r{i} AS MATERIALIZED (
  -- the WordPiece objective: likelihood gain cnt_ab / (cnt_a * cnt_b),
  -- double precision exactly as the Spark trainer computes it
  SELECT l, r, m, rk FROM (
    SELECT p.l, p.r,
           p.l || CASE WHEN starts_with(p.r, '##') THEN substr(p.r, 3)
                       ELSE p.r END AS m,
           ROW_NUMBER() OVER (ORDER BY
             CAST(p.cnt AS DOUBLE)
               / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) DESC,
             p.l, p.r) AS rk
    FROM p{i} p
    JOIN sc{i} ca ON ca.sym = p.l
    JOIN sc{i} cb ON cb.sym = p.r
  ) WHERE rk <= {pool}
), s{i} AS (
  -- greedy disjoint admission in rank order (used set carries l, r AND
  -- the merge output m — WordPiece's m strips r's continuation marker)
  SELECT 0 AS rk, CAST('' AS VARCHAR) AS used, 0 AS n_acc,
         CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r,
         CAST(NULL AS VARCHAR) AS m, FALSE AS acc
  UNION ALL
  SELECT rk,
         CASE WHEN ok THEN used || mark ELSE used END,
         n_acc + CASE WHEN ok THEN 1 ELSE 0 END,
         l, r, m, ok
  FROM (
    SELECT c.rk, st.used, st.n_acc, c.l, c.r, c.m,
           (position(chr(2) || c.l || chr(2) IN st.used) = 0
            AND position(chr(2) || c.r || chr(2) IN st.used) = 0
            AND position(chr(2) || c.m || chr(2) IN st.used) = 0) AS ok,
           chr(2) || c.l || chr(2) || chr(2) || c.r || chr(2)
             || chr(2) || c.m || chr(2) AS mark
    FROM s{i} st JOIN r{i} c ON c.rk = st.rk + 1
    WHERE st.n_acc < {batch}
  )
), rules{i} AS MATERIALIZED (
  SELECT list(l || chr(3) || r || chr(3) || m ORDER BY rk) AS rs
  FROM s{i} WHERE acc
), t{i} AS MATERIALIZED (
  SELECT freq,
         list_reduce(
           list_prepend(s, COALESCE((SELECT rs FROM rules{i}),
                                    CAST([] AS VARCHAR[]))),
           (a, x) -> replace(a,
             chr(2) || split_part(x, chr(3), 1) || chr(2)
               || chr(2) || split_part(x, chr(3), 2) || chr(2),
             chr(2) || split_part(x, chr(3), 3) || chr(2))) AS s
  FROM t{i - 1}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rnd, rk, l, r, m FROM s{i} WHERE acc"
        for i in range(1, rounds + 1)
    )
    return "WITH RECURSIVE " + ",\n".join(ctes), union


# r10 fixture trim: 3 rounds x 12 merges (was 4x12) — still
# multi-round batched admission, one fewer pair+symbol aggregate
_WP_N, _WP_BATCH, _WP_POOL, _WP_ROUNDS = 36, 12, 48, 3


def _q_wordpiece_train(spark, sf_dir):
    """Distributed WordPiece TRAINING (wordpiece.wordpiece_learn,
    batched): 3 rounds over the documents vocabulary, each = a pair-
    count aggregate + a symbol-count aggregate + an aggregate-sized
    ranking join on the likelihood objective cnt_ab/(cnt_a·cnt_b)
    (double precision, ties (lhs, rhs) ascending), greedy admission of
    up to 12 symbol-disjoint merges (the used set includes each merge's
    OUTPUT with the continuation marker folded away), one fused fold
    pass per round. The oracle replays every round end-to-end; a drift
    in the objective, the marker algebra, or the admission rule flips a
    later merge and mismatches."""
    from ratatool_spark.operators.wordpiece import (
        _wp_merged,
        wordpiece_learn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = wordpiece_learn(
        docs, n_merges=_WP_N, batch=_WP_BATCH, pool=_WP_POOL,
        rounds=_WP_ROUNDS,
    )
    from ratatool_spark.functions.localrel import local_df

    return local_df(
        spark,
        [(i + 1, a, b, _wp_merged(a, b)) for i, (a, b) in enumerate(merges)],
        "step int, lhs string, rhs string, piece string",
    )


def _sql_wordpiece_train() -> str:
    ctes, union = _wp_train_ctes(_WP_BATCH, _WP_POOL, _WP_ROUNDS)
    return (
        ctes
        + f"""
SELECT ROW_NUMBER() OVER (ORDER BY rnd, rk) AS step,
       l AS lhs, r AS rhs, m AS piece
FROM ({union})
ORDER BY step LIMIT {_WP_N}"""
    )


def _q_wordpiece_segment(spark, sf_dir):
    """Train → persist → load → SEGMENT the corpus by merge replay
    (wordpiece.wordpiece_segment, Arrow kernel path — 36 merges exceed
    the expression threshold), the artifact chain gated end-to-end. The
    segmentation applies the learned list in training order with the
    WordPiece fold (merge output strips the right side's ## marker), so
    re-encoding reproduces the trainer's final symbol state; the oracle
    replays training AND the per-word fold application."""
    import os

    from ratatool_spark.operators.wordpiece import (
        load_wordpiece_tokenizer,
        save_wordpiece_tokenizer,
        wordpiece_learn,
        wordpiece_segment,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = wordpiece_learn(
        docs, n_merges=_WP_N, batch=_WP_BATCH, pool=_WP_POOL,
        rounds=_WP_ROUNDS,
    )
    path = os.path.join(scratch_dir(prefix="wp_tok_"), "wp.json")
    save_wordpiece_tokenizer(spark, path, merges)
    loaded, _ = load_wordpiece_tokenizer(spark, path)
    if loaded != merges:
        raise ValueError("wordpiece artifact round-trip drifted")
    out = wordpiece_segment(docs, loaded, text_col="text")
    return out.select(
        "doc_id",
        F.array_join("wp_syms", " ").alias("segmented"),
        "n_wp_tokens",
    )


def _sql_wordpiece_segment() -> str:
    ctes, union = _wp_train_ctes(_WP_BATCH, _WP_POOL, _WP_ROUNDS)
    base = _MARKED.format(w="w")
    fold = (
        f"list_reduce(list_prepend({base}, "
        "(SELECT rs FROM mergelist)), (a, x) -> replace(a, "
        "chr(2) || split_part(x, chr(3), 1) || chr(2) || chr(2) "
        "|| split_part(x, chr(3), 2) || chr(2), "
        "chr(2) || split_part(x, chr(3), 3) || chr(2)))"
    )
    seg = f"replace(substr({fold}, 2, len({fold}) - 2), {_SEP2}, ' ')"
    return (
        ctes
        + f""",
mergelist AS MATERIALIZED (
  SELECT list(l || chr(3) || r || chr(3) || m ORDER BY step) AS rs FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY rnd, rk) AS step, l, r, m
    FROM ({union})
    ORDER BY step LIMIT {_WP_N}
  )
),
docwords AS (
  SELECT doc_id, t.pos AS pos, ls[t.pos] AS w
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ls
        FROM documents),
       UNNEST(range(1, len(ls) + 1)) AS t(pos)
),
seg AS (
  SELECT doc_id, pos, {seg} AS sw,
         len(string_split({seg}, ' ')) AS nsyms
  FROM docwords WHERE LENGTH(w) > 0
)
SELECT d.doc_id,
       COALESCE(s.segmented, '') AS segmented,
       CAST(COALESCE(s.n_wp_tokens, 0) AS INT) AS n_wp_tokens
FROM documents d LEFT JOIN (
  SELECT doc_id, STRING_AGG(sw, ' ' ORDER BY pos) AS segmented,
         SUM(nsyms) AS n_wp_tokens
  FROM seg GROUP BY doc_id
) s USING (doc_id)"""
    )
