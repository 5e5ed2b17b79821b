# 10M x 128-d single-chip lane (VERDICT r2 weak #4b), after memory fixes:
# exact capacity (10,000,128 slots, not 16.8M), donated table append.
# Phase 1: exact GT + IVF (fast).  HNSW 10M runs as a separate lane
# (build is ~1.5 h at steady 1,820 rows/s).
import time, json, sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from pgvector_tpu.store.table import DenseTable
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric
from bench import make_data

nq, k, batch = 4000, 10, 4000
n = 10_000_000
db, qs = make_data(n, nq)
table = DenseTable(128, capacity=n)
# chunked insert: one 5.1 GB host->device transfer wedges the tunnel less
# than it used to, but chunks also bound the donated-update block size
for s in range(0, n, 2_500_000):
    table.insert(db[s:s+2_500_000])
del db
print("loaded", table.count, table.capacity, flush=True)
out = {"n": n}
flat = FlatIndex(table, Metric.L2)
t0 = time.time()
_, gt = flat.search(qs, k)
gt = np.asarray(gt)
out["exact_gt_s"] = round(time.time() - t0, 1)
out["exact_path"] = flat.last_path
print("gt", out["exact_gt_s"], out["exact_path"], flush=True)
# lists ~ sqrt(n) guidance for >1M rows (reference README.md:336-342)
t0 = time.time()
ivf = IVFFlatIndex(table, Metric.L2, lists=4000, seed=0)
out["ivf_build_s"] = round(time.time() - t0, 1)
print("ivf build", out["ivf_build_s"], flush=True)
for probes in (40, 63):
    ivf.search(qs[:batch], k, probes=probes)
    t0 = time.time()
    d, r = ivf.search(qs, k, probes=probes)
    r = np.asarray(r); dt = time.time() - t0
    hits = sum(len(set(map(int,a)) & set(map(int,e))) for a,e in zip(r, gt))
    out[f"ivf_probes{probes}"] = {"recall_at_10": round(hits/(nq*k),4),
                                  "qps": round(nq/dt,1)}
    print(json.dumps(out[f"ivf_probes{probes}"]), flush=True)
print(json.dumps(out), flush=True)
with open("/tmp/lane_10m_v2.json", "w") as f:
    json.dump(out, f)
print("DONE", flush=True)
