# Second-distribution robustness lane (VERDICT r2 weak #8): all prior
# recall numbers come from the 1024-cluster gaussian surrogate; this lane
# runs uniform [0,1)^128 data (no cluster structure at all) at 1M for both
# AMs to guard against surrogate-specific tuning.
import time, json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from pgvector_tpu.store.table import DenseTable
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric

nq, k, batch = 4000, 10, 4000
n = 1_000_000
rng = np.random.default_rng(23)
db = rng.random((n, 128), dtype=np.float32)
qs = rng.random((nq, 128), dtype=np.float32)
table = DenseTable(128, capacity=n)
table.insert(db)
del db
print("loaded", flush=True)
out = {"n": n, "distribution": "uniform[0,1)^128"}
flat = FlatIndex(table, Metric.L2)
t0 = time.time()
_, gt = flat.search(qs, k)
gt = np.asarray(gt)
out["exact_gt_s"] = round(time.time() - t0, 1)
print("gt", out["exact_gt_s"], flush=True)
t0 = time.time()
idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                wave_size=1024, dedup=False, beam_expand=4)
out["hnsw_build_s"] = round(time.time() - t0, 1)
print("build", out["hnsw_build_s"], flush=True)
idx.beam_expand = 8
out["hnsw"] = []
for ef in (40, 100):
    idx.search(qs[:batch], k, ef_search=ef)
    t0 = time.time()
    r = np.concatenate([np.asarray(idx.search(qs[s:s+batch], k, ef_search=ef)[1])
                        for s in range(0, nq, batch)])[:nq]
    dt = time.time() - t0
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt))
    out["hnsw"].append({"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
                        "qps": round(nq/dt, 1)})
    print(json.dumps(out["hnsw"][-1]), flush=True)
idx._nbr_vals = None  # release the packed scan copy before IVF build
del idx
t0 = time.time()
ivf = IVFFlatIndex(table, Metric.L2, lists=1000, seed=0)
out["ivf_build_s"] = round(time.time() - t0, 1)
ivf.search(qs[:batch], k, probes=10)
t0 = time.time()
d, r = ivf.search(qs, k, probes=10)
r = np.asarray(r); dt = time.time() - t0
hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt))
out["ivf_probes10"] = {"recall_at_10": round(hits/(nq*k), 4),
                       "qps": round(nq/dt, 1)}
print(json.dumps(out), flush=True)

# ---- heavy-tailed-norm IP phase (hub domination stress) ----
from bench import make_data
del table, flat, ivf
hdb, hqs = make_data(n, nq, dist="heavy", seed=29)
htab = DenseTable(128, capacity=n)
htab.insert(hdb)
del hdb
hflat = FlatIndex(htab, Metric.IP)
t0 = time.time()
_, hgt = hflat.search(hqs, k)
hgt = np.asarray(hgt)
out["heavy_ip"] = {"exact_gt_s": round(time.time() - t0, 1)}
print("heavy gt", out["heavy_ip"]["exact_gt_s"], flush=True)
t0 = time.time()
hidx = HNSWIndex(htab, Metric.IP, m=16, ef_construction=64,
                 wave_size=1024, dedup=False, beam_expand=4)
out["heavy_ip"]["build_s"] = round(time.time() - t0, 1)
print("heavy build", out["heavy_ip"]["build_s"], flush=True)
hidx.beam_expand = 8
out["heavy_ip"]["sweep"] = []
for ef in (40, 100):
    hidx.search(hqs[:batch], k, ef_search=ef)
    t0 = time.time()
    r = np.concatenate([np.asarray(hidx.search(hqs[s:s+batch], k, ef_search=ef)[1])
                        for s in range(0, nq, batch)])[:nq]
    dt = time.time() - t0
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, hgt))
    out["heavy_ip"]["sweep"].append(
        {"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
         "qps": round(nq/dt, 1)})
    print(json.dumps(out["heavy_ip"]["sweep"][-1]), flush=True)

print(json.dumps(out), flush=True)
with open("/tmp/lane_uniform.json", "w") as f:
    json.dump(out, f)
print("DONE", flush=True)
