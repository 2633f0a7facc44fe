#!/usr/bin/env python3
"""10x standing check for ann_recall_audit, tier-split.

The audit's single composed oracle (four tier replays as CTEs of ONE
query) exceeds DuckDB's spill envelope at the 10x corpus (measured:
>78 GB of temp, r12) because every tier's materialized Lloyd chain is
live at once. Each tier replay FITS individually (the hier tier has
carried a 10x oracle standing since r8), and recall is per-tier
arithmetic — so this script runs the identical math sequentially:

  1. brute-force top-k truth over the corpus (one linear DuckDB query),
  2. each tier's EXISTING hash-proven oracle SQL, one at a time
     (connection recycled between tiers so spill is freed),
  3. recall = |tier ∩ truth| / |truth|, compared against the Spark-side
     audit rows.

Dev tool only (the sf0.01 driver gate runs the composed oracle as-is).

Usage: python3 tools/ann_recall_check.py <sfDir> <verifyOutDir> [oracleJson]
  (verifyOutDir must hold ann_recall_audit/ parquet; oracleJson defaults
   to <verifyOutDir>/oracle_sql.json and must carry the four ann tier
   rows — subset Verify runs dump only their subset, so point this at a
   full run's dump when needed)
"""
import sys, os, json, glob
import duckdb

TRUTH_K = 3

TRUTH_SQL = f"""
WITH e AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (SELECT q.q_id, e.vec_id,
    list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i]))
    / (sqrt(list_sum(list_transform(qv, x -> x * x)))
       * sqrt(list_sum(list_transform(v, x -> x * x)))) AS sim
  FROM q JOIN e ON q.q_id <> e.vec_id)
SELECT q_id, vec_id AS n_id FROM (SELECT q_id, vec_id,
    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk
  FROM scored) WHERE rk <= {TRUTH_K}
"""

TIERS = {  # audit tier name -> the tier's own oracle row (hash-proven)
    "pq": "ann_pq_topk",
    "ivf_pq": "ann_ivf_pq_topk",
    "ivf_pq_hier": "ann_ivf_pq_hier_topk",
    "opq_ivf": "ann_opq_ivf_topk",
}


def fresh_con(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle_path = (sys.argv[3] if len(sys.argv) > 3
                   else os.path.join(out_dir, "oracle_sql.json"))
    oracle = json.load(open(oracle_path))
    files = glob.glob(os.path.join(out_dir, "ann_recall_audit", "*.parquet"))
    spark = {r[0]: r for r in duckdb.sql(
        f"SELECT tier, n_queries, k, hits, recall "
        f"FROM read_parquet({files!r})").fetchall()}

    con = fresh_con(sf_dir)
    truth = set(map(tuple, con.execute(TRUTH_SQL).fetchall()))
    con.close()
    n_q = len({t[0] for t in truth})
    ok = True
    for tier, row_name in TIERS.items():
        con = fresh_con(sf_dir)          # spill freed between tiers
        got = con.execute(oracle[row_name]).fetchall()
        con.close()
        pairs = {(r[0], r[2]) for r in got}   # (q_id, rank, n_id, sim)
        if tier == "opq_ivf":
            # planted corpus: the tier's oracle IS its brute force
            t_truth, t_nq = pairs, len({p[0] for p in pairs})
        else:
            t_truth, t_nq = truth, n_q
        hits = len(pairs & t_truth)
        recall = round(hits / len(t_truth), 6)
        want = (tier, t_nq, TRUTH_K, hits, recall)
        have = spark.get(tier)
        line = f"{tier:12} duckdb={want} spark={have}"
        if (have is None or tuple(have[:4]) != want[:4]
                or abs(have[4] - recall) > 1e-9):
            print("FAIL " + line); ok = False
        else:
            print("ok   " + line)

    # opq_ivf_real: the learned rotation is not SQL-replayable, so the
    # 10x standing is the ENGINE-measured floor verdict against the
    # engine's own brute truth (bruteTopK is hash-proven at sf via
    # sim_brute_topk). r14 reshaped the row to the closed-form
    # (tier, n_queries, k, recall_floor, recall_ok) contract — recall_ok
    # is the measured recall@k >= recall_floor comparison.
    real = glob.glob(os.path.join(out_dir, "ann_opq_real_recall",
                                  "*.parquet"))
    if real:
        row = duckdb.sql(
            f"SELECT tier, n_queries, k, recall_floor, recall_ok "
            f"FROM read_parquet({real!r})").fetchall()[0]
        line = f"{'opq_ivf_real':12} spark-measured={row}"
        if row[4] is True and row[3] >= 0.9:
            print("ok   " + line)
        else:
            print("FAIL " + line + " (recall_ok false or floor lowered)")
            ok = False
    print("== PASS" if ok else "== FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
