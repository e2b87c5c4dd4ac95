#!/usr/bin/env python3
"""Append the full per-query before/after table to OPTIMIZATION_r12.md.
Usage: r12_appendix.py BEFORE.json AFTER.json
"""
import json, sys

CHANGED = {
    "q_pagerank", "q_pagerank_seeded", "q_hits", "q_markov_stationary",
    "q_join_discovery", "q_peak_concurrency", "q_knn_graph",
    "q_dedup_ngram", "q_dedup_containment", "q_dedup_prefix",
    "q_dedup_minhash", "q_dedup_minhash_v", "q_dedup_minhash_mid",
    "q_dedup_sorted", "q_dedup_winnow", "q_tf_cosine",
    "q_dedup_sweep", "q_dedup_groups", "q_dup_cluster_sizes",
    "q_split_leakage", "q_dedup_filtered", "q_dedup_recall",
    "q_dup_matrix", "q_dedup_incremental", "q_novelty",
    "q_source_overlap", "q_ann_topk", "q_dedup_embed",
    "q_hard_negatives", "q_ann_recall", "q_library_cycle",
    "q_reload_readback", "q_stream_ingest", "q_rollup_maintenance",
    "q_delete_reload", "q_upsert", "q_snapshot_at", "q_cdc_apply",
}
TRIED_REVERTED = {"q_knn_descent", "q_dedup_edit", "q_dedup_simhash",
                  "q_dedup_weighted"}

def main(before_path, after_path):
    b = json.load(open(before_path))
    a = json.load(open(after_path))
    bq, aq = b["queries"], a["queries"]
    lines = [
        "\n## Appendix: every query, before → after (sf0.1, pinned sbt"
        " driver config, min of 4 passes)\n",
        "Legend: `changed` = an optimization from the sections above"
        " lands in this query's plan; `tried-reverted` = a change was"
        " measured and rolled back (finding recorded above); `global"
        " only` = examined, touched only by the suite-wide schema-cache"
        " fix, left structurally alone (reason classes in 'Examined,"
        " left alone').\n",
        "| query | before s | after s | ratio | status |",
        "|---|---|---|---|---|",
    ]
    for q in sorted(set(bq) | set(aq)):
        bb, aa = bq.get(q), aq.get(q)
        ratio = f"{aa/bb:.2f}" if bb and aa and bb > 0 else "-"
        st = ("changed" if q in CHANGED else
              "tried-reverted" if q in TRIED_REVERTED else "global only")
        # a query present in only one run must not crash the report
        bbs = f"{bb:.2f}" if bb is not None else "-"
        aas = f"{aa:.2f}" if aa is not None else "-"
        lines.append(f"| {q} | {bbs} | {aas} | {ratio} | {st} |")
    with open("/root/repo/OPTIMIZATION_r12.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(bq)} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
