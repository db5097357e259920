"""Why docs_jaccard_near_pairs (UNCAPPED prefix filter) is excluded from
the sf0.5 slope table — measured evidence (round-13).

The r13 wave-2 sweep hung on this query: one Spark task ran 20+ minutes
and the DuckDB oracle ground ~45 minutes at sf0.5. This probe quantifies
the cause WITHOUT enumerating pairs: the synthetic corpus draws text from
a tiny near-uniform vocabulary, so the global rarest-token order that the
prefix-filter theorem relies on has almost no tail — at sf0.1 the whole
corpus emits only ~15 DISTINCT prefix tokens and the hottest bucket holds
~3.8k of 5k docs, i.e. ~13.4M exact candidate pairs (sf0.5: ~117 tokens,
~40M pairs). Both engines then verify millions of token-set
intersections; the quadratic is in the OPERATOR'S COMPLETE-candidate
contract on this corpus, not in either engine's plan.

Standing disposition: docs_jaccard_near_pairs stays the theorem-exact
reference (its oracle restates every step, so correctness checks remain
cheap at driver SFs); the production path at scale is
docs_jaccard_capped_pairs (salted ≤64-doc chunks + chain edges, O(n·B)
candidates per bucket) — THAT row carries the slope trend line.

Run:  python tools/jaccard_bucket_probe.py
"""

from __future__ import annotations

import duckdb

POINTS = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.5", "/root/repo/.localdata/sf0.5"),
)

Q = """
WITH ts AS (
    SELECT doc_id,
           list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts
    FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS tok FROM ts),
freq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
ordered AS (
    SELECT t.doc_id,
           list_transform(list_sort(list({'df': f.df, 'tok': t.tok})),
                          s -> s.tok) AS ot
    FROM tok t JOIN freq f USING (tok) GROUP BY t.doc_id
),
pref AS (
    SELECT doc_id,
           unnest(ot[1:(len(ot) - CAST(ceil(0.95 * len(ot)) AS INT) + 1)])
               AS tok
    FROM ordered
),
b AS (SELECT tok, count(*) AS c FROM pref GROUP BY tok)
SELECT count(*) AS n_prefix_tokens, max(c) AS max_bucket_docs,
       CAST(sum(c * (c - 1) / 2) AS BIGINT) AS exact_candidate_pairs
FROM b
"""


def main() -> None:
    for sf, path in POINTS:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/documents.parquet')"
        )
        n_tok, max_b, cand = con.execute(Q).fetchall()[0]
        print(
            f"{sf}: prefix_tokens={n_tok} max_bucket={max_b} "
            f"candidate_pairs={cand}"
        )


if __name__ == "__main__":
    main()
