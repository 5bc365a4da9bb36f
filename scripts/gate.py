#!/usr/bin/env python
"""One-command round-close gate (VERDICT r3 item 7).

Reproduces every claim a round-close makes, in one run, and writes a
machine-readable ``GATE.json`` next to the repo root:

1. full oracle sweep at sf0.001 (every declared key vs DuckDB),
2. full oracle sweep at sf0.01 (the driver's scale),
3. heavy-subset oracle sweep at sf0.1 (the bench scale),
4. the pytest suite.

Each stage shells out to the existing tools (scripts/check_oracle.py /
pytest) in a FRESH interpreter — same isolation the driver and judge get,
no shared SparkSession state between scales.

Usage: python scripts/gate.py [--skip-pytest] [--skip-sf1] [--rotate N]
                              [--sf1-stress]
Exit code 0 iff every stage is green.

``--sf1-stress`` (VERDICT r5 item 4) additionally value-proves every
scale-stress key (SCALE_STRESS.json) against the synthesized sf1 fixture
(testdata_sf1/, 10x bench scale) with the DuckDB per-key budget scaled
10x to match the data (600 s) — correctness under spills/AQE re-plans/
decimal widths at 10x is exactly the drift class the sf0.1 sweep caught
in round 2.

``--rotate N`` (VERDICT r4 item 9) additionally runs a deterministic
50-key subset at sf0.01 — the keys ranked by md5("N:key"), lowest 50 —
and publishes the subset under ``rotation`` in GATE.json so a
fixed-subset driver gate can consume a different slice every round;
over rounds every key gets driver-grade coverage. The schedule is pure
(same N -> same subset, no state), so any round is re-checkable later.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The sf0.1 heavy subset: heaviest shape per operator family (NOTES_r3 §7's
# sweep plus the spatial/event/html keys the r3 judge re-verified). The
# MinHash-LSH family keys are included — their sf0.1 oracles are the cheap
# pair-fixture rewrites (round 4), no longer super-linear in DuckDB.
HEAVY_SF01 = [
    "q_flagship_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q21", "q_join_star", "q_agg_group", "q_win_running", "q_topk",
    "q_sessionize", "q_funnel", "q_event_pattern", "q_spatial_radius_join",
    "q_html_extract", "q_text_tfidf", "q_text_lm_score", "q_corpus_curation",
    "q_cosine_topk", "q_emb_centroids", "q_dedup", "q_dedup_exact",
    "q_dedup_ngram", "q_dedup_substring", "q_pack_sequences",
    "q_chunk_documents", "q_percentile_exact", "q_join_asof",
    "q_sketch_quantile_hdr", "q_phrase_search",
    # MinHash-LSH family: sf0.1-cheap prefix-filter oracles since round 4
    "q_dedup_minhash", "q_dedup_best", "q_dedup_keep", "q_dedup_clusters",
    "q_dedup_incremental", "q_decontaminate", "q_corpus_pipeline",
    # round-4 batch
    "q_url_parse", "q_ip_cidr_join", "q_join_asof_nearest",
    "q_record_linkage", "q_join_bucketed", "q_dp_noise_counts",
    "q_sketch_theta_kmv",
    # round-5 batches (B62-B64)
    "q_fuzzy_symdelete", "q_dedup_semantic", "q_corpus_mix",
    "q_dedup_lines", "q_shard_manifest", "q_bpe_pair_counts",
    "q_text_dedup_consecutive",
    # round-6 batch (B65)
    "q_bpe_encode", "q_bpe_corpus_stats", "q_quality_drift_psi",
    "q_length_filter_adaptive", "q_sample_temperature",
    # round-6 batch 2 (B66): retrieval stack + learned linkage weights
    "q_inverted_index", "q_hybrid_rrf", "q_unigram_viterbi",
    "q_linkage_fs_em",
    # round-6 batch 3 (B66 #2): contamination report, KS drift, RAG context
    "q_contamination_ngrams", "q_ks_drift", "q_rag_context",
    # round-6 batch 4 (B67): CCNet ppl, DSIR, GD probe, curriculum
    "q_ccnet_perplexity", "q_dsir_select", "q_quality_probe_gd",
    "q_curriculum_interleave",
    # round-6 batch 5 (B68): vocab OOV audit, Wilson CI, Rocchio PRF
    "q_vocab_prune_oov", "q_eval_winrate_wilson", "q_prf_expand",
    # round-6 batch 6 (B69): PMI collocations, power iteration
    "q_collocations_pmi", "q_power_iteration",
    # round-6 batch 7 (B70): source-centroid embedding outliers
    "q_source_centroid_outliers",
    # round-6 batch 8 (B71): n-gram novelty, ABTT debias
    "q_ngram_novelty", "q_emb_debias_abtt",
    # round-6 batch 9 (B72): probe calibration + dup provenance
    "q_probe_calibration", "q_dup_source_matrix",
    # round-6 batch 10 (B73): entropy gate + stopword lexicon
    "q_char_entropy_filter", "q_stopword_discovery",
    # round-6 capstone (B74): composed selection pipeline
    "q_selection_pipeline",
    # round-7 batches (B75-B79): blocking audits (32+64-bit), eval
    # family, drift, diversity, VAD, LPA — the heavy new shapes
    "q_fuzzy_passjoin", "q_bleu_eval", "q_span_corruption",
    "q_audio_vad_segments", "q_dedup_blocking_audit",
    "q_blocking_tradeoff", "q_rouge_n", "q_js_divergence",
    "q_simhash64_portable", "q_dedup_blocking_audit64", "q_rouge_l",
    "q_chrf_eval", "q_t_closeness", "q_heaps_fit", "q_label_propagation",
]


def _run(cmd: list[str], env: dict | None = None) -> tuple[int, str, float]:
    t0 = time.time()
    proc = subprocess.run(
        cmd,
        cwd=ROOT,
        env={**os.environ, **(env or {})},
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    return proc.returncode, proc.stdout, time.time() - t0


# The sf1 oracle stage (VERDICT r5 item 4): value-proof of the scale-stress
# keys at 10x bench scale, against the synthesized testdata_sf1 fixture
# (scripts/make_sf1.py). The DuckDB per-key budget scales with the data —
# 60 s is calibrated for sf0.1, so the sf1 stage allows 10x (600 s); an
# oracle only counts as super-linear if it exceeds the SCALED budget
# (q_corpus_pipeline's composed LSH oracle runs ~90 s at sf1 — linear).
SF1_DIR = os.path.join(ROOT, "testdata_sf1")
SF1_BUDGET_S = "600"


def _sf1_stress_keys() -> list[str]:
    with open(os.path.join(ROOT, "SCALE_STRESS.json")) as f:
        return sorted(json.load(f)["results"])


def _oracle_stage(sf: str, names: list[str] | None) -> dict:
    cmd = [sys.executable, "scripts/check_oracle.py", "--sf", sf]
    if names:
        cmd += names
    rc, out, secs = _run(cmd)
    m = re.search(r"(\d+)/(\d+) queries match", out)
    failing = []
    fm = re.search(r"^failing: (.+)$", out, re.M)
    if fm:
        failing = fm.group(1).split()
    return {
        "rc": rc,
        "matched": int(m.group(1)) if m else None,
        "total": int(m.group(2)) if m else None,
        "failing": failing,
        "seconds": round(secs, 1),
    }


def rotation_subset(round_no: int, size: int = 50) -> list[str]:
    """Deterministic per-round 50-key slice of the full registry: rank
    every declared key by md5(f"{round}:{key}") and take the lowest
    ``size``. Uniform, stateless, and different every round."""
    import hashlib

    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry_mod

    keys = sorted(entry_mod.queries())
    ranked = sorted(
        keys, key=lambda k: hashlib.md5(f"{round_no}:{k}".encode()).hexdigest()
    )
    return sorted(ranked[:size])


def main(argv: list[str]) -> int:
    stages: dict[str, dict] = {}
    rotate_round = None
    if "--rotate" in argv:
        i = argv.index("--rotate")
        rotate_round = int(argv[i + 1])

    print("== stage 1/4: full oracle sweep @ sf0.001 ==", flush=True)
    stages["oracle_sf0.001"] = _oracle_stage("0.001", None)
    print(json.dumps(stages["oracle_sf0.001"]), flush=True)

    print("== stage 2/4: full oracle sweep @ sf0.01 ==", flush=True)
    stages["oracle_sf0.01"] = _oracle_stage("0.01", None)
    print(json.dumps(stages["oracle_sf0.01"]), flush=True)

    if "--skip-sf1" not in argv:
        print("== stage 3/4: heavy subset @ sf0.1 ==", flush=True)
        stages["oracle_sf0.1_heavy"] = _oracle_stage("0.1", HEAVY_SF01)
        print(json.dumps(stages["oracle_sf0.1_heavy"]), flush=True)

    if "--sf1-stress" in argv:
        keys = _sf1_stress_keys()
        print(
            f"== sf1 stress stage: {len(keys)} scale-stress keys @ sf1 ==",
            flush=True,
        )
        cmd = [sys.executable, "scripts/check_oracle.py"] + keys
        rc, out, secs = _run(
            cmd,
            env={
                "SPARK_GRAFT_SF_DIR": SF1_DIR,
                "SPARK_GRAFT_ORACLE_BUDGET_S": SF1_BUDGET_S,
            },
        )
        m = re.search(r"(\d+)/(\d+) queries match", out)
        fm = re.search(r"^failing: (.+)$", out, re.M)
        stages["oracle_sf1_stress"] = {
            "rc": rc,
            "matched": int(m.group(1)) if m else None,
            "total": int(m.group(2)) if m else None,
            "failing": fm.group(1).split() if fm else [],
            "seconds": round(secs, 1),
        }
        print(json.dumps(stages["oracle_sf1_stress"]), flush=True)

    if "--skip-pytest" not in argv:
        print("== stage 4/4: pytest ==", flush=True)
        rc, out, secs = _run([sys.executable, "-m", "pytest", "tests/", "-q"])
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        stages["pytest"] = {"rc": rc, "tail": tail, "seconds": round(secs, 1)}
        print(json.dumps(stages["pytest"]), flush=True)

    rotation = None
    if rotate_round is not None:
        subset = rotation_subset(rotate_round)
        print(
            f"== rotation stage: round {rotate_round} 50-key subset @ sf0.01 ==",
            flush=True,
        )
        stages["oracle_rotation"] = _oracle_stage("0.01", subset)
        print(json.dumps(stages["oracle_rotation"]), flush=True)
        rotation = {"round": rotate_round, "keys": subset}

    green = all(s["rc"] == 0 for s in stages.values())
    gate = {"green": green, "stages": stages}
    if rotation is not None:
        gate["rotation"] = rotation
    with open(os.path.join(ROOT, "GATE.json"), "w") as f:
        json.dump(gate, f, indent=1)
    print(f"\nGATE {'GREEN' if green else 'RED'} -> GATE.json", flush=True)
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
