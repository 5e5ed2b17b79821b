#!/usr/bin/env python
"""Headline benchmark — SIFT-like ANN workload on one TPU chip.

North-star metric (BASELINE.md): SIFT-1M recall@10 vs QPS for an HNSW
ef_search sweep, plus build wall-clock.  SIFT itself can't be fetched
(zero-egress image), so the workload is a deterministic SIFT-shaped
surrogate: N × 128-d vectors drawn from a clustered mixture (SIFT's local
structure), 1,000 held-out queries, exact top-10 ground truth computed on
device.

Prints exactly ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   plus context fields (recall, build_s, config)}

``vs_baseline`` compares against PG_BASELINE_QPS — an assumed
single-process pgvector 0.8.6 HNSW figure for this workload shape
(m=16, ef_search tuned to the same recall; the reference repo itself
publishes no numbers, SURVEY.md §6).  The BASELINE.json target is ≥10×.

Environment knobs: BENCH_N (default 50000), BENCH_Q (1000),
BENCH_BATCH (250), BENCH_EF (sweep list).
"""

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

import numpy as np

PG_BASELINE_QPS = 1000.0  # assumed pgvector single-core QPS at recall≈0.95


def make_data(n, nq, dim=128, seed=0):
    """Clustered surrogate for SIFT: gaussian mixture with overlapping
    clusters (center scale 1.5 ≈ SIFT-like difficulty: nearest neighbors
    cross cluster boundaries, so recall@10 actually sweeps with ef instead
    of saturating at 1.0)."""
    rng = np.random.default_rng(seed)
    n_centers = 1024
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32) * 1.5
    assign = rng.integers(0, n_centers, size=n)
    db = centers[assign] + rng.normal(size=(n, dim)).astype(np.float32)
    qa = rng.integers(0, n_centers, size=nq)
    qs = centers[qa] + rng.normal(size=(nq, dim)).astype(np.float32)
    return db.astype(np.float32), qs.astype(np.float32)


def main():
    import jax

    # persistent compilation cache — first round pays remote compiles once
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pgvector_tpu.index.flat import FlatIndex
    from pgvector_tpu.index.hnsw import HNSWIndex
    from pgvector_tpu.ops.metric import Metric
    from pgvector_tpu.store.table import DenseTable

    n = int(os.environ.get("BENCH_N", 50_000))  # bounded so remote-compile overhead + build fit a round
    nq = int(os.environ.get("BENCH_Q", 1000))
    batch = int(os.environ.get("BENCH_BATCH", 250))
    ef_sweep = [int(x) for x in os.environ.get("BENCH_EF", "40,100").split(",")]  # 2 ef points = 2 query compiles (remote compiles dominate wall)
    expand = int(os.environ.get("BENCH_EXPAND", 4))
    k = 10

    log(f"bench: n={n} nq={nq} backend={jax.default_backend()}")
    db, qs = make_data(n, nq)
    table = DenseTable(128, capacity=n)
    table.insert(db)
    log("bench: data loaded")

    # ground truth (exact, on device)
    flat = FlatIndex(table, Metric.L2, tile=16384)
    t0 = time.time()
    _, gt = flat.search(qs, k)
    gt_s = time.time() - t0
    log(f"bench: exact ground truth {gt_s:.1f}s")

    # build
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                    wave_size=1024, dedup=False, beam_expand=expand)
    build_s = time.time() - t0
    log(f"bench: hnsw build {build_s:.1f}s")

    results = []
    for ef in ef_sweep:
        # warm up/compile
        idx.search(qs[:batch], k, ef_search=ef)
        log(f"bench: ef={ef} compiled")
        t0 = time.time()
        got = []
        for s in range(0, nq, batch):
            _, r = idx.search(qs[s: s + batch], k, ef_search=ef)
            got.append(r)
        dt = time.time() - t0
        r = np.concatenate(got)
        hits = sum(
            len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt)
        )
        recall = hits / (nq * k)
        results.append({"ef": ef, "recall_at_10": round(recall, 4),
                        "qps": round(nq / dt, 1)})

    # headline: best QPS at recall ≥ 0.95 (else the highest-recall point)
    ok = [r for r in results if r["recall_at_10"] >= 0.95]
    head = max(ok, key=lambda r: r["qps"]) if ok else max(
        results, key=lambda r: r["recall_at_10"])
    out = {
        "metric": "hnsw_qps_at_recall095_sift100k_surrogate",
        "value": head["qps"],
        "unit": "qps",
        "vs_baseline": round(head["qps"] / PG_BASELINE_QPS, 3),
        "recall_at_10": head["recall_at_10"],
        "ef_search": head["ef"],
        "build_s": round(build_s, 1),
        "exact_gt_s": round(gt_s, 1),
        "n": n,
        "beam_expand": expand,
        "sweep": results,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
