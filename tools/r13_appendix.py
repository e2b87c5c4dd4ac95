#!/usr/bin/env python3
"""Append the full per-query A/B table to OPTIMIZATION_r13.md.
Usage: r13_appendix.py OLD.json NEW.json
OLD/NEW are the alternating-binary pair (r12-close vs r13 HEAD, same
host window, tools/jrun.sh, min of 4 passes)."""
import json, sys

# queries whose PLAN a round-13 structural change lands in
CHANGED = {
    # interval family (shared keyed exchange / single boundary sweep)
    "q_interval_overlap", "q_peak_concurrency",
    # posting-miner REPARTITION_BY_NUM pin (merge at session width)
    "q_dedup_ngram", "q_dedup_prefix", "q_dedup_sweep", "q_dedup_filtered",
    "q_dedup_containment", "q_dedup_minhash", "q_dedup_minhash_v",
    "q_dedup_minhash_mid", "q_dedup_winnow", "q_tf_cosine", "q_dup_matrix",
    "q_passage_dedup", "q_dedup_groups", "q_dup_cluster_sizes",
    "q_split_leakage",
    # blockingRecall flag-union rewrite (+ miners)
    "q_dedup_recall",
    # basketLift single aggregated-set pass
    "q_basket_lift",
    # knnGraphIvf probe-rides-assignment + footer count
    "q_knn_graph_ivf",
    # GlobalRank range-partitioned global row_number
    "q_rank_ensemble", "q_quantile_norm", "q_zonemap", "q_zorder_key",
}
# iterative loops: IterState one-roll-defer free is in their round path
ITER = {
    "q_pagerank", "q_pagerank_seeded", "q_hits", "q_markov_stationary",
    "q_label_prop", "q_kcore", "q_bfs_depth", "q_bfs_reach", "q_top_eigen",
    "q_ann_ivf_kmeans", "q_knn_descent", "q_bpe_train", "q_bpe_encode",
}
TRIED_REVERTED = {}  # shingle-pin consumers overlap CHANGED; noted in text


def main(old_path, new_path):
    o = json.load(open(old_path))
    n = json.load(open(new_path))
    oq, nq = o["queries"], n["queries"]
    lines = [
        "\n## Appendix: every query, r12-close vs r13 (sf0.1, alternating-"
        "binary A/B, one host window, min of 4 passes)\n",
        f"Old sentinels {o['sentinel_before_s']}/{o['sentinel_after_s']}, "
        f"new {n['sentinel_before_s']}/{n['sentinel_after_s']} (nominal "
        f"{o['sentinel_nominal_s']}). Legend: `changed` = a round-13"
        " structural rewrite lands in this query's plan; `iter` = the"
        " IterState one-roll-defer fix is in its iteration loop (no plan"
        " change); `untouched` = no r13 change in its path — its ratio is"
        " the window's noise band.\n",
        "| query | r12-close s | r13 s | ratio | status |",
        "|---|---|---|---|---|",
    ]
    for q in sorted(set(oq) | set(nq)):
        bb, aa = oq.get(q), nq.get(q)
        bb = float(bb) if bb is not None else None
        aa = float(aa) if aa is not None else None
        ratio = f"{aa/bb:.2f}" if bb and aa and bb > 0 else "-"
        st = ("changed" if q in CHANGED else
              "iter" if q in ITER else "untouched")
        bbs = f"{bb:.2f}" if bb is not None else "-"
        aas = f"{aa:.2f}" if aa is not None else "-"
        lines.append(f"| {q} | {bbs} | {aas} | {ratio} | {st} |")
    with open("/root/repo/OPTIMIZATION_r13.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(set(oq) | set(nq))} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
