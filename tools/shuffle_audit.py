"""Shuffle audit: measured shuffle volume per operator, as direct evidence
for the scale-design claims in SCALE.md / the operator docstrings.

For each audited registry entry this runs the query to completion through
the `noop` sink (full materialization, no driver collect) under a
UI-enabled session, then attributes the *new* completed stages' metrics
(input bytes, shuffle write bytes, shuffle read bytes) to that entry via
the Spark REST status API. The interesting numbers are the absolute
shuffle-write volume and its growth across a 10x input step — shuffle is
the only cost that crosses the network on a real cluster, so these, not
local wall seconds, are what survive a 1000-executor 100 TB run. The
shuffle:input ratio is additionally meaningful for the scan-heavy
text/embedding operators (minhash should move a few % of what it scans);
for KB-scale dictionary-compressed dimensional scans it is an artifact of
parquet compression and the growth column is the claim.

Usage:
    python tools/shuffle_audit.py [sf_dir ...]     # default sf0.1 + composed sf1
Writes tools/shuffle_results.json and renders SHUFFLE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from big_data_player_analysis_spark.registry import all_queries
from big_data_player_analysis_spark.session import get_spark

UI_PORT = 4077

# Batch operators whose shuffle profile carries a design claim. Streaming
# entries are excluded (micro-batch stage attribution is noisy); so are
# sub-second scalar maps with nothing to exchange.
AUDITED = [
    "q00_duel_edges",
    "q01_count_per_key",
    "q06_distinct_pairs",
    "q08_having_count_distinct",
    "olap_tpch_q1_pricing_summary",
    "olap_tpch_q5_region_volume",
    "q16_heroic_iterative",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "llm_line_dedup",
    "llm_near_dedup_survivors",
    "llm_semantic_dedup",
    "llm_top_ngrams",
    "llm_pack_sequences",
    "sim_bruteforce_topk",
    "dedup_embedding_cosine",
    "olap_funnel_conversion",
    "olap_retention_cohorts",
    "llm_bpe_train",
    "olap_cdc_upsert",
    "olap_scd2_history",
    "olap_key_skew_profile",
    "olap_hll_shard_merge",
    "olap_triangle_count",
    "olap_gap_fill",
    "llm_title_hamming_dedup",
    "llm_weighted_sample",
    "olap_tpch_q18_large_orders",
    "olap_quantile_binning",
    "olap_rolling_average",
    "olap_anomaly_zscore",
    "llm_bigram_surprisal",
    "llm_repetition_profile",
    "llm_substring_dup_spans",
    "llm_cdc_chunks",
    "stream_near_dedup_ingest",
    "dedup_simhash_web",
    "llm_curation_pipeline",
    "olap_event_transitions",
    "olap_min_cost_supplier",
    "llm_heavy_ngrams_sketch",
    "olap_quantile_shard_merge",
    "olap_ks_drift",
    "olap_cogroup_order_lag",
    "multimodal_phash_dedup",
    "multimodal_ipframe_decode",
    "llm_bpe_encode",
    "stream_curation_ingest",
    "ann_lsh_pairs",
    "llm_substring_dedup",
    "llm_shard_assign",
    "multimodal_mcframe_decode",
    "llm_decontaminate",
    "llm_repetition_profile",
]


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _api("/applications")[0]["id"]


def _stage_metrics(app_id: str) -> dict[tuple[int, int], dict]:
    """(stageId, attemptId) -> metrics for every non-active stage."""
    out = {}
    for st in _api(f"/applications/{app_id}/stages"):
        if st["status"] == "ACTIVE":
            continue
        out[(st["stageId"], st["attemptId"])] = {
            "input": st.get("inputBytes", 0),
            "sw": st.get("shuffleWriteBytes", 0),
            "sr": st.get("shuffleReadBytes", 0),
        }
    return out


def audit_sf(spark, app_id: str, sf_dir: str, names) -> dict[str, dict]:
    specs = all_queries()
    results = {}
    for name in names:
        spec = specs.get(name)
        if spec is None:
            continue
        before = _stage_metrics(app_id)
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.3)  # let the status store absorb the final stage
        after = _stage_metrics(app_id)
        new = [m for k, m in after.items() if k not in before]
        results[name] = {
            "input_bytes": sum(m["input"] for m in new),
            "shuffle_write_bytes": sum(m["sw"] for m in new),
            "shuffle_read_bytes": sum(m["sr"] for m in new),
            "stages": len(new),
            "wall_s": round(wall, 2),
        }
        r = results[name]
        print(
            f"{sf_dir.rsplit('/', 1)[-1]:>6} {name:<28} "
            f"in={r['input_bytes'] / 1e6:9.1f}MB "
            f"sw={r['shuffle_write_bytes'] / 1e6:9.1f}MB "
            f"stages={r['stages']:>3} {r['wall_s']:6.2f}s",
            flush=True,
        )
    return results


def _fmt_mb(b: int) -> str:
    return f"{b / 1e6:.1f}"


# Design explanation per outlier — rendered under the table so the
# numbers never stand uninterpreted.
NOTES = {
    "llm_repetition_profile": (
        "within-doc Gopher repetition signals, round-9 optimization: a "
        "pure per-document projection with ZERO exchanges — per gram "
        "order the xxhash64 gram array is sorted and a run-length scan "
        "yields max/duplicated/total counts in place. The pre-r9 form "
        "exploded (doc, n, gh) triples through three hash exchanges "
        "plus a join-back; nothing about this quantity ever needed to "
        "leave its document."
    ),
    "llm_line_dedup": (
        "C4 boilerplate-window removal, round-9 rebuild: the persisted "
        "window stream is narrow (doc_id, widx, whash) int64 triples — "
        "window TEXT never shuffles. Exchanges are the distinct "
        "(doc, whash) document-frequency aggregate (partial-agged, "
        "8-byte keys), the size-gated frequent-set broadcast, and a "
        "tiny per-doc bad-window-index aggregate (bounded by duplicated "
        "occurrences) that joins back onto the corpus row where a "
        "hash-based array_except cuts windows in place. The pre-r9 "
        "rebuild re-assembled documents with a groupBy over surviving "
        "window text — a corpus-sized exchange this shape deletes."
    ),
    "llm_decontaminate": (
        "the eval shingle set broadcasts as int64 xxhash64 values (round "
        "9: ~4x smaller than the k=32 char strings it replaced), so the "
        "corpus-side shingle stream never exchanges on the shingle key; "
        "the only wide exchange is the per-doc shared-count aggregate — "
        "fixed-width (doc, long) rows, partial-aggregated map-side."
    ),
    "multimodal_phash_dedup": (
        "payload bytes never shuffle: the decode scan emits one "
        "(doc_id, 7-int segment array) row per image, so both sw columns "
        "read ~0 MB; the ratio is ~0.01 MB -> ~0.1 MB of segment rows + "
        "candidate pairs — linear in docs, band-volume candidates "
        "(n^2 * 7/2^18; SCALE.md's 64x cell runs linear at 6.7 s after "
        "the image-geometry fix that removed degenerate grid-row "
        "duplication)."
    ),
    "llm_bpe_encode": (
        "the 11.8x sw growth on 10x input is vocabulary growth, not a "
        "plan transition: composed copies rewrite text through rotated "
        "alphabets, so every copy mints NEW distinct words and the "
        "distinct-word encode table + the per-doc token-id reassembly "
        "(posexplode -> join-back -> array_sort collect) grow with "
        "distinct words x docs; on a natural corpus the vocab saturates "
        "(Heaps' law) and the join-back side dominates linearly. Token "
        "TEXT never shuffles with the corpus — only (word, id-array) "
        "and (doc, pos, ids) rows."
    ),
    "stream_curation_ingest": (
        "per-micro-batch curation: shuffle is ~0.12x input at both "
        "scales (window-frequency aggregate + band exchange + survivor "
        "joins), linear 6.7x on 10x data; the corpus side of the "
        "incremental stage is never exchanged on the band key (same "
        "contract as stream_near_dedup_ingest)."
    ),
    "olap_key_skew_profile": (
        "global exact percentiles with no global sort: the exchanges are "
        "the per-key partial count and the KB-scale count-of-counts "
        "histogram — shuffle stays O(distinct keys) regardless of row "
        "growth."
    ),
    "olap_hll_shard_merge": (
        "the sketch exchange is O(shards x 1.5KB) at every scale; shuffle "
        "bytes should stay flat as input grows (the exact-distinct "
        "comparison column contributes the only data-sized aggregate)."
    ),
    "dedup_ngram_jaccard": (
        "the 10x-input jump is a one-time broadcast->shuffle transition, "
        "not asymptotic growth: the exact verify attaches each doc's full "
        "shingle-array to its candidate pairs, and at sf1 the doc->array "
        "table (~50k docs x ~2KB) crosses the 64MB auto-broadcast "
        "threshold, so pairs+arrays start moving through a shuffle join "
        "(measured: rare-shingle set 60k rows, gate open at both scales; "
        "candidates/doc constant). Beyond the transition growth is linear "
        "at ~2.4x input bytes — the documented cost of the exact "
        "contract; dedup_minhash_lsh (0.02x input) is the scale path."
    ),
    "dedup_embedding_cosine": (
        "blocked all-pairs GEMM: shuffle is O(n*(B+1)) with the block "
        "count B auto-sized up as n grows (keeps per-task matrices "
        "~0.5GB), so shuffle bytes grow superlinearly BY CONTRACT while "
        "compute stays BLAS-bound; the ANN/semantic entries are the "
        "sub-quadratic paths."
    ),
    "llm_semantic_dedup": (
        "the exchange is one pass of (id, vec) rows hashed on the "
        "sign-bucket into the per-bucket GEMM (applyInPandas) — O(n*dim) "
        "bytes, 8.6MB at sf1; bucket width auto-sizes from the data so "
        "within-bucket compute stays bounded while the shuffle stays "
        "linear in the corpus."
    ),
    "q16_heroic_iterative": (
        "per-iteration score vectors broadcast; the shuffled bytes are "
        "the ONE materialization of the duels window exchange (round 7: "
        "the duels input is eagerly persisted before the three-consumer "
        "edge build — the old broadcast-hint futures raced three "
        "column-pruned copies of that exchange that ReuseExchange cannot "
        "dedup, which was the r6 sf1 row's sr:sw 4.2) plus the distinct-"
        "edge and per-iteration vector aggregates, lineage truncated by "
        "localCheckpoint. Measured post-fix at composed sf1: sw 95.8 -> "
        "36.3 MB, sr:sw 1.0; re-recorded r8 on the bucketed duels "
        "derivation at 40.2 MB — the small delta is the derivation's "
        "firsts/stitch branches, not a new consumer."
    ),
    "llm_substring_dedup": (
        "the rewrite half of EXACTSUBSTR: same exchanges as the profile "
        "row (window-hash partial agg, size-gated dup-set, islands merge "
        "over duplicated positions only) plus ONE keyed join of per-doc "
        "span arrays back onto the corpus — span arrays are "
        "duplicated-region-sized; the rebuilt text never exchanges (the "
        "token filter is a narrow codegen'd projection)."
    ),
    "q06_distinct_pairs": (
        "hash-distinct over lineitem's (l_partkey, l_suppkey): partial "
        "dedup before the exchange, so the shuffle carries the distinct "
        "pairs themselves — O(output), linear; sw:in is the usual "
        "dictionary-compressed-parquet artifact (header note). Row "
        "re-recorded r8 with the rest of the reference surface after the "
        "duels-derivation rewrite — q06/q08 read lineitem, not duels, so "
        "their bytes moved only within noise."
    ),
    "olap_triangle_count": (
        "the exchanged bytes are the oriented edge stream plus the wedge "
        "join's probe side — O(E^1.5)-bounded by the (deg, id) "
        "orientation; the composed step scales disjoint duel subgraphs, "
        "so growth stays at/below linear. Re-recorded r8: the canonical "
        "edge list and degree table are now tracked-persisted — their "
        "four/three consumers previously re-executed the whole upstream "
        "derivation every read (19.8 vs 7.5 MB shuffled at sf0.1 on the "
        "bucketed duels input). The extra ~2.5 s this persists cost at "
        "sf0.1 (bench 2.3 -> 4.8 s) is the small-scale price of not "
        "re-deriving a 100 TB corpus four times."
    ),
    "olap_quantile_binning": (
        "the only exchange is the exact sample percentile's "
        "single-partition merge, which moves the SAMPLED VALUES — "
        "O(sample_fraction x rows), linear here because the demo keeps "
        "fraction fixed at 25%. At scale the knob is sized to a bounded "
        "sample COUNT (fraction ~ target/n, the RangePartitioner "
        "contract), making this exchange O(target). Bucket assignment "
        "itself — the part that replaces ntile's global sort — never "
        "shuffles: a broadcast scalar compare."
    ),
    "llm_bigram_surprisal": (
        "exchanges move (key, count) aggregates — per-doc bigram counts "
        "(linear in docs) and the corpus model tables (bounded by "
        "distinct-bigram volume, which the composed corpus holds "
        "constant) — never token instances; the pair fan-out itself is a "
        "narrow zip."
    ),
    "llm_cdc_chunks": (
        "the rolling-hash boundary scan is a narrow Arrow pass (no "
        "exchange); the shuffled bytes are the emitted (doc_id, chunk "
        "bounds, chunk hash) rows — O(output chunks), linear in the "
        "corpus. The 64x SCALE cell (18.2 s) is scan+hash compute, not "
        "exchange pressure."
    ),
    "stream_near_dedup_ingest": (
        "per micro-batch: the batch's own survivor closure (minhash "
        "bands, ~0.02x of the batch) plus the incremental check's "
        "new-batch band table, size-gate-broadcast against the "
        "accumulated-corpus band stream — the corpus side is never "
        "exchanged on the band key; the driver entry runs the whole "
        "table as ONE batch, so its bytes track the batch dedup. The "
        "64x SCALE cell (40 s) is the micro-batch runtime + sink "
        "rewrite, linear across the row."
    ),
    "dedup_simhash_web": (
        "the web-scale default (4 bands x 16-bit buckets): same "
        "signature pass and exchange shape as the strict entry, but "
        "per-band candidate volume is ~n^2/2^16 vs n^2/2^7 — shuffle "
        "bytes are signatures + the sparse candidate pairs, staying "
        "linear where the strict config's within-bucket pairs grow "
        "quadratic-ish (49.6 s vs 1.68 s at the 64x probe)."
    ),
    "llm_curation_pipeline": (
        "the end-to-end composition (quality gate -> line dedup -> "
        "near-dedup survivors -> decontaminate -> pack): its exchange "
        "budget is the SUM of its stages' own SHUFFLE rows — compare "
        "against llm_line_dedup + dedup_minhash_lsh + "
        "llm_near_dedup_survivors + llm_pack_sequences above; a larger "
        "number would mean a stage recomputes an upstream stage (the "
        "plan is linear, every stage consumed exactly once). CLOSING "
        "round-7 ask #3 (share the shingle/band exchange between the "
        "survivor and decontamination stages): the two stages shingle "
        "in DIFFERENT spaces by design — near-dedup MinHash-bands k=8 "
        "WORD shingles of the cleaned text (SHINGLE_K, the published "
        "fuzzy-dedup operating point), decontamination exact-joins "
        "k=32 CHARACTER shingles (PIPE_DECONTAM_K, the published "
        "long-n-gram contamination contract so only genuine eval "
        "near-copies match) — so there is no common (shingle, doc) "
        "exchange to reuse: the keys, normalization, and even "
        "tokenization units differ. The round-8 cost work instead "
        "removed the one genuine recomputation: `gated` (scatter + "
        "25-replace-pass quality/language gate) is now the fourth lazy "
        "stage boundary — it was re-executed under both the line-dedup "
        "frequency gate and the cleaned materialization (same-session "
        "A/B: 13.7 -> 12.0 s on a contended host). CLOSING round-8 ask "
        "#3 (shave below ~8 s sf0.1): the round-9 per-stage floor "
        "measurement (see curation_pipeline_q's docstring) shows the "
        "wall IS the sum of the five stage minima — gate ~2.0 s, line "
        "dedup ~2.2 s, survivors ~3.1 s, decontaminate ~1.5 s, pack "
        "~0.7 s — with no cross-stage re-execution left; at sf0.1 the "
        "binding constraint is the ~0.3-0.5 s per-job scheduler "
        "constant across ~15 sequential jobs (the corpus is 0.6 MB in "
        "one row group), which amortizes away at real scale. Round-9 "
        "cuts that DO survive at scale: the components closure is one "
        "union-find task below 4M verified pairs (zero sweep jobs), "
        "the decontamination broadcast halves to int64 hashes, and "
        "partition-aware _scatter never re-exchanges an already-wide "
        "checkpointed stage."
    ),
    "q00_duel_edges": (
        "the events->duels derivation itself (round-7 wrong #1, fixed "
        "r8): the old form's lead() window partitioned on the 5-value "
        "event_type — a 5-task corpus sort at any scale. Now ts-range "
        "bucketed: the corpus moves through ONE exchange hashed on "
        "(event_type, bucket) = n_types x 64 window partitions, the "
        "bucket-firsts branch is map-side-combined min_by (KB-scale "
        "exchange), and the boundary stitch is a broadcast join of the "
        "tiny firsts table. Output pinned row-identical to the direct "
        "window (oracle + tests/test_plans.py)."
    ),
    "multimodal_ipframe_decode": (
        "inter-frame I/P decode: payload bytes never shuffle (narrow "
        "Arrow map); the frame fold is sequential per document, so "
        "parallelism rides the document axis and the exchanged bytes "
        "are the per-frame feature rows only — O(frames), linear."
    ),
    "ann_lsh_pairs": (
        "the exchanges carry signatures + id pairs only; round 8 "
        "AUTO-SIZES the signature width from a corpus count "
        "(lsh_band_bits_for: 45 bits at sf0.1's 2k vectors, 60 at "
        "composed sf1's 20k), so per-band candidate volume is "
        "~occupancy*n/2 BY CONSTRUCTION. The growth column is a "
        "small-base artifact here: absolute volumes are ~0.06 MB at "
        "sf0.1 and ~0.6 MB at sf1 — linear in n and FOUR ORDERS OF "
        "MAGNITUDE below the fixed 16-bit demo width's 94.9 MB sf1 "
        "exchange that this row measured in round 7 (the 120x-growth "
        "finding this sizing closes). The all-pairs DuckDB oracle "
        "recomputes the same width and hash-matches at both scales."
    ),
}


def render(all_results: dict[str, dict[str, dict]]) -> str:
    sfs = list(all_results)
    lines = [
        "# SHUFFLE — measured exchange volume per operator",
        "",
        "Bytes are summed over the stages each query executed (Spark REST",
        "status API, `noop` sink so nothing is collected to the driver).",
        "Wall seconds on local[32] measure one machine; bytes through the",
        "exchange are what a 1000-executor 100 TB run pays for, so the",
        "scale claims here are (1) ABSOLUTE shuffle-write volume and (2)",
        "its GROWTH across the 10x input step sf0.1 -> composed sf1:",
        "~10x = linear (shuffle proportional to data — fine), well under",
        "10x = sublinear (bounded state, e.g. sketches), well over 10x =",
        "either a plan transition or fan-out, each explained in the notes",
        "under the table. The sw:in ratio (shuffle-write / input bytes) is",
        "only meaningful for the scan-heavy text/embedding operators —",
        "for the small dimensional aggregates the parquet input is a few",
        "dictionary-compressed KB and the ratio is an artifact of",
        "compression, not a design property. The headline rows:",
        "dedup_minhash_lsh moves ~0.02-0.03x of what it scans (banded",
        "candidate generation, signatures computed in one narrow pass)",
        "and llm_near_dedup_survivors ~0.01x; both hold that ratio flat",
        "across the 10x step.",
        "",
        "| operator | "
        + " | ".join(f"{sf}: in MB / sw MB / sw:in" for sf in sfs)
        + " | sw growth |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    names = [n for n in AUDITED if any(n in all_results[sf] for sf in sfs)]
    for name in names:
        cells = []
        sws = []
        for sf in sfs:
            r = all_results[sf].get(name)
            if not r:
                cells.append("—")
                continue
            inb, sw = r["input_bytes"], r["shuffle_write_bytes"]
            ratio = f"{sw / inb:.2f}" if inb else "—"
            cells.append(f"{_fmt_mb(inb)} / {_fmt_mb(sw)} / {ratio}")
            sws.append(sw)
        growth = (
            f"{sws[-1] / sws[0]:.1f}x" if len(sws) == len(sfs) and sws[0] else "—"
        )
        lines.append(f"| {name} | " + " | ".join(cells) + f" | {growth} |")
    lines.append("")
    lines.append("## Notes on the outliers")
    lines.append("")
    for name, note in NOTES.items():
        if any(name in all_results[sf] for sf in sfs):
            lines.append(f"- **{name}** — {note}")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--render-only"]
    out = os.path.join(os.path.dirname(__file__), "shuffle_results.json")
    if "--render-only" in sys.argv:
        with open(out) as f:
            all_results = json.load(f)
        with open(
            os.path.join(os.path.dirname(__file__), "..", "SHUFFLE.md"), "w"
        ) as f:
            f.write(render(all_results))
        print("re-rendered SHUFFLE.md from", out)
        return 0
    # --only a,b,c: re-measure just those operators (when one
    # implementation changed), merging into the committed results so the
    # other rows keep the numbers tied to their unchanged code
    audited = list(AUDITED)
    if "--only" in args:
        i = args.index("--only")
        audited = [n for n in args[i + 1].split(",") if n in AUDITED]
        args = args[:i] + args[i + 2 :]
    from big_data_player_analysis_spark.workspace import cache_root, clean_scratch

    clean_scratch()
    sf_dirs = args or [
        "/root/testdata/sf0.1",
        os.path.join(cache_root(), "composed", "sf1"),
    ]
    sf_dirs = [d for d in sf_dirs if os.path.isdir(d)]
    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "20000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    app_id = _app_id()
    all_results = {}
    if audited != list(AUDITED) and os.path.exists(out):
        with open(out) as f:
            all_results = json.load(f)
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        all_results.setdefault(label, {}).update(
            audit_sf(spark, app_id, sf_dir, audited)
        )

    with open(out, "w") as f:
        json.dump(all_results, f, indent=1)
    with open(os.path.join(os.path.dirname(__file__), "..", "SHUFFLE.md"), "w") as f:
        f.write(render(all_results))
    print("wrote SHUFFLE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
