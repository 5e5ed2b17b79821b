# BQ + exact re-rank on sign-informative data (VERDICT r3 #5): the
# headline surrogate's 1024 clusters put ~1000 rows behind each sign
# pattern, so the rerank pool (k x rerank_factor) drowns and BQ recall vs
# float GT caps at 0.25-0.43 (BASELINE.md round-3).  This lane runs the
# SAME pipeline (reference README.md:589-609) on a workload whose Hamming
# neighborhoods fit the pool: 512-d, ~25 rows/cluster (cluster size
# between k and rerank_factor*k), center scale 1.5.  CPU pilot (20k rows,
# 1024 clusters): exact-Hamming-top-40 + rerank oracle = 0.9995 vs float
# GT, so any shortfall here is graph loss, not pipeline loss.
import time, json, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.rerank import BinaryQuantizedIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable

# write into the repo so the artifact survives the session (the round-4
# 200k run's raw JSON was lost with /tmp; its numbers live in BASELINE.md)
OUT = os.environ.get(
    "LANE_OUT", "/root/repo/experiments/results/lane_bq_signful_r4.json")
n = int(os.environ.get("BQ_N", 500_000))
nq, k, batch, dim = 4000, 10, 4000, 512
ncl = max(n // 25, 64)
rng = np.random.default_rng(9)
centers = rng.normal(size=(ncl, dim)).astype(np.float32) * 1.5
db = np.empty((n, dim), np.float32)
for s in range(0, n, 100_000):
    e = min(s + 100_000, n)
    db[s:e] = (centers[rng.integers(0, ncl, e - s)]
               + rng.normal(size=(e - s, dim)).astype(np.float32))
qs = (centers[rng.integers(0, ncl, nq)]
      + rng.normal(size=(nq, dim)).astype(np.float32))
t = DenseTable(dim, capacity=n)
t.insert(db)
print("loaded", flush=True)
lane = {"n": n, "dim": dim, "clusters": ncl, "rows_per_cluster": n / ncl,
        "sweep": []}


def save():
    with open(OUT, "w") as f:
        json.dump(lane, f)


t0 = time.time()
_, gt = FlatIndex(t, Metric.L2, tile=16384).search(qs, k)
gt = np.asarray(gt)
lane["gt_s"] = round(time.time() - t0, 1)
save()
print("gt", lane["gt_s"], flush=True)
t0 = time.time()
bq = BinaryQuantizedIndex(t, Metric.L2, m=16, ef_construction=64,
                          rerank_factor=4, wave_size=1024, beam_expand=4)
lane["build_s"] = round(time.time() - t0, 1)
save()
print("build", lane["build_s"], flush=True)
bq.index.beam_expand = 8
for rf in (4, 8):
    bq.rerank_factor = rf
    for ef in (40, 100):
        bq.search(qs[:batch], k, ef_search=ef)  # compile
        t0 = time.time()
        r = np.concatenate(
            [np.asarray(bq.search(qs[s:s + batch], k, ef_search=ef)[1])
             for s in range(0, nq, batch)])[:nq]
        dt = time.time() - t0
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(r, gt))
        lane["sweep"].append({"rerank_factor": rf, "ef": ef,
                              "recall_at_10_vs_float_gt": round(hits / (nq * k), 4),
                              "qps": round(nq / dt, 1)})
        save()
        print(json.dumps(lane["sweep"][-1]), flush=True)
print(json.dumps(lane), flush=True)
print("DONE", flush=True)
