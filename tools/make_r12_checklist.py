#!/usr/bin/env python3
"""Render OPTIMIZATION_r12.md's per-operator checklist: every bench entry
with its r12-before/r12-after seconds and this round's disposition.

Usage: make_r12_checklist.py BENCH_LOCAL_r12_before.json BENCH_LOCAL.json
"""
import json
import sys

CHANGED = {
    "st": ("streaming family: checkpoint file checksums off (Change 1); "
           "st7 additionally gets the MergeSink one-file-per-bucket write "
           "(Change 4)"),
    "d12": "native sorted_intersect_count verify (Change 2)",
}

# disposition per query (exact name > prefix); examined = every row.
DISPOSITIONS = [
    # exact-name dispositions first
    ("st7_stream_upsert", "CHANGED: checksums off + MergeSink clusters by "
     "bucket before the dynamic-partition write (was ≤ tasks×buckets "
     "fragments per batch, re-read by every later batch; spec pins one "
     "file per bucket)"),
    ("d12_prefix_jaccard", "CHANGED: verify is the native codegen "
     "sorted-merge intersect over pre-sorted token sets (was interpreted "
     "array_intersect building a hash set per candidate pair); plan diff "
     "in plans/r12/; D12Probe end-to-end 13.3→4.5 s, identical 964,854 "
     "pairs"),
    ("d12b_prefix_clean", "CHANGED: same native verify as d12 (shared "
     "operator)"),
    ("pipeline_flow", "examined (FitProbe phase split): lda.fit is 7-11 s "
     "of the entry — online-LDA aggregates a dense 73,640×10 matrix per "
     "layout partition per iteration; layout pinned at 64 by the golden "
     "fixture contract; cuts/featurize/score stages ~1 s each. LEFT "
     "ALONE (shrinking layout = local-only tuning; the layoutPartitions "
     "knob is the cluster lever, benched in *_w256 stages)"),
    ("pipeline_events", "examined: same fit-bound shape as flow (smaller "
     "vocab); left alone per the flow analysis"),
    ("pipeline_events_approx", "examined: sketch-cuts variant; fit-bound; "
     "left alone"),
    ("pipeline_dns", "examined: fit-bound (pd_stage_lda_fit); left alone"),
    ("pipeline_proxy", "examined: fit-bound (pp_stage_lda_fit); left alone"),
    ("pipe_events_fixedmodel", "examined: loads a fixed model, two "
     "broadcast joins + TakeOrdered; sub-second; left alone"),
    ("v10_semantic_dedup", "examined (sampler): task threads parked — "
     "√n-kmeans + components are small-frame ITERATIVE jobs; wall time is "
     "per-round fixed cost, the correct 100 TB shape (cells bound the "
     "join, centroids broadcast); left alone"),
    ("d13b_simhash_clusters_wide", "examined (sampler): park-dominated — "
     "distinct-fingerprint band join + pointer-doubling components; "
     "per-round orchestration, linear data volumes; left alone"),
    ("d13_simhash_clusters", "examined: same operator at 16-bit; left "
     "alone"),
    ("d8_retain_best", "examined: jaccard pairs + components + winner "
     "aggregate; iterative orchestration like d13b; left alone"),
    ("d6_near_dup_clusters", "examined: connectedComponents rounds are "
     "already ~2 jobs each (lazy checkpoints materialize inside the "
     "round's one eager job); left alone"),
    ("x15_cluster_split", "examined: d6's components + hash-mod split; "
     "left alone"),
    ("st14_stream_warc", "examined (sampler): warm probe 2.85 s — the "
     "bench's elevated median is host noise; WARC DSv2 micro-batches are "
     "source-bound, not state-bound (checksums-off barely moves it); "
     "left alone"),
    ("x33_tfidf_cosine", "examined: integer-exact inverted-index join, "
     "native shingle hashes; left alone"),
    ("x37_warc_datasource", "examined: r11's member-indexed range splits; "
     "the ADVICE indexesFor LRU round-trip was already fixed in the "
     "inherited commits (hits ++ built direct map); left alone"),
]

PREFIX_DISPOSITIONS = [
    ("st", "CHANGED: checkpoint file checksums off (Change 1) — results "
     "byte-identical, gate oracle-green"),
    ("pe_", "stage split entry (see pipeline_events)"),
    ("pf_", "stage split entry (see pipeline_flow)"),
    ("pd_", "stage split entry (see pipeline_dns)"),
    ("pp_", "stage split entry (see pipeline_proxy)"),
    ("g", "examined: iterative graph op (pagerank/triangles/label-prop/"
     "reach) — small-frame rounds, park-dominated; left alone"),
    ("v", "examined: vector/PQ family already native (codegen dot/ADC "
     "expressions, broadcast centroids, bucketed index); left alone"),
    ("d", "examined: dedup family — banded/inverted-index shapes, native "
     "signature/shingle expressions from earlier rounds; left alone"),
    ("m", "examined: multimodal decoders are mapPartitions over opaque "
     "bytes (forced); sub-second; left alone"),
    ("x", "examined: text ops are map-side-combined aggregations / "
     "map-only codegen chains; sub-second to ~1 s; left alone"),
    ("a", "examined: aggregate/sketch gates, map-side combined; left "
     "alone"),
    ("j", "examined: join gates — broadcast/AQE-planned; left alone"),
    ("z", "examined: layout/lakehouse gates (write-bound); left alone"),
    ("o", "examined: format round-trips (write-bound); left alone"),
    ("u", "examined: merge/diff/SCD gates; left alone"),
    ("w", "examined: window gates, per-key bounded frames; left alone"),
    ("f", "examined: scalar feature functions, codegen; left alone"),
    ("s", "examined: scan/projection gates (pruned ReadSchema); left "
     "alone"),
    ("t", "examined: TakeOrderedAndProject top-k; left alone"),
    ("c", "examined: curation pipelines (map-only rule batteries); left "
     "alone"),
    ("p", "examined: predicate gates; left alone"),
]


def disposition(name):
    for n, d in DISPOSITIONS:
        if name == n:
            return d
    for p, d in PREFIX_DISPOSITIONS:
        if name.startswith(p):
            return d
    return "examined; left alone"


def main():
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    rows = []
    names = list(after["queries"].keys())
    for n in names:
        b = before["queries"].get(n)
        a = after["queries"][n]
        ratio = f"{a / b:.2f}" if b and b > 0 else "—"
        bs = f"{b:.2f}" if b else "—"
        rows.append((n, bs, f"{a:.2f}", ratio, disposition(n)))
    print("| query | r12 before (s) | r12 after (s) | ratio | disposition |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -float(r[2])):
        print("| " + " | ".join(r) + " |")
    print()
    print("| stage | before | after |")
    print("|---|---|---|")
    for n, a in sorted(after.get("stages", {}).items(), key=lambda x: -x[1]):
        b = before.get("stages", {}).get(n)
        print(f"| {n} | {b:.2f} | {a:.2f} |" if b else f"| {n} | — | {a:.2f} |")


if __name__ == "__main__":
    main()
