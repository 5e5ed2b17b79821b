#!/usr/bin/env python
"""Query-path experiment harness: build the 1M surrogate HNSW index ONCE,
checkpoint it, then time query variants cheaply by reloading.

Usage (TPU, serial):
    python experiments/exp_query_sweep.py build     # ~10 min, writes ckpt
    python experiments/exp_query_sweep.py sweep     # variants from env

Variants are driven by env knobs the library already honors:
    PGVECTOR_TPU_PACKED_SCAN=off|f32|bf16|int8
    PGVECTOR_TPU_QUERY_MAX_STEPS=N
    EXP_QEXPAND, EXP_EF, EXP_BATCH

EXP_BENCH_CACHE=1 reuses bench.py's .bench_cache graph checkpoint (same
deterministic workload) instead of this harness's own EXP_CKPT, so the
sweep costs zero build time right after a bench run.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = os.environ.get("EXP_CKPT", "/tmp/exp_1m_ckpt")
N = int(os.environ.get("EXP_N", 1_000_000))
NQ = int(os.environ.get("EXP_Q", 4000))


def data():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_data

    return make_data(N, NQ)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from pgvector_tpu.index.flat import FlatIndex
    from pgvector_tpu.index.hnsw import HNSWIndex
    from pgvector_tpu.io import load_hnsw, load_table, save_hnsw, save_table
    from pgvector_tpu.ops.metric import Metric
    from pgvector_tpu.store.table import DenseTable

    cmd = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    db, qs = data()
    if cmd == "build":
        table = DenseTable(128, capacity=N)
        table.insert(db)
        cap = 1
        while cap < N:
            cap *= 2
        t0 = time.time()
        idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                        wave_size=1024, dedup=False, beam_expand=4,
                        capacity=cap)
        print(f"build {time.time()-t0:.1f}s", flush=True)
        save_table(table, CKPT + "/table")
        save_hnsw(idx, CKPT + "/index")
        t0 = time.time()
        _, gt = FlatIndex(table, Metric.L2).search(qs, 10)
        print(f"gt {time.time()-t0:.1f}s", flush=True)
        np.save(CKPT + "/gt.npy", gt)
        return

    if os.environ.get("EXP_BENCH_CACHE", "0") == "1":
        import glob

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cands = sorted(glob.glob(os.path.join(
            here, ".bench_cache", f"hnsw_n{N}_clustered_*")))
        assert cands, "no bench graph cache — run bench.py first"
        table = DenseTable(128, capacity=N)
        table.insert(db)
        idx = load_hnsw(table, cands[-1])
        gt_npy = cands[-1] + f"_gt{NQ}.npy"
        if os.path.exists(gt_npy):
            gt = np.load(gt_npy)
        else:
            t0 = time.time()
            _, gt = FlatIndex(table, Metric.L2).search(qs, 10)
            gt = np.asarray(gt)
            print(f"gt {time.time()-t0:.1f}s", flush=True)
            np.save(gt_npy, gt)
    else:
        table = load_table(CKPT + "/table")
        idx = load_hnsw(table, CKPT + "/index")
        gt = np.load(CKPT + "/gt.npy")
    qexpand = int(os.environ.get("EXP_QEXPAND", 8))
    batch = int(os.environ.get("EXP_BATCH", 4000))
    efs = [int(x) for x in os.environ.get("EXP_EF", "40").split(",")]
    idx.beam_expand = qexpand
    out = []
    for ef in efs:
        idx.search(qs[:batch], 10, ef_search=ef)  # compile
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            got = [idx.search(qs[s: s + batch], 10, ef_search=ef)[1]
                   for s in range(0, NQ, batch)]
            dt = min(dt, time.time() - t0)
        r = np.concatenate(got)[:NQ]
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(r, gt))
        rec = {"ef": ef, "recall": round(hits / (NQ * 10), 4),
               "qps": round(NQ / dt, 1),
               "hops": int(idx._last_scan_steps),
               "packed": os.environ.get("PGVECTOR_TPU_PACKED_SCAN", "auto"),
               "max_steps": os.environ.get("PGVECTOR_TPU_QUERY_MAX_STEPS", "0"),
               "qexpand": qexpand, "batch": batch}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    return out


if __name__ == "__main__":
    main()
