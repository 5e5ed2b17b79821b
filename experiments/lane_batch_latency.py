# batch-size sweep (dispatch amortization past 4000) + small-batch latency
import time, json, sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from pgvector_tpu.io import load_table, load_hnsw
from pgvector_tpu.index.ivfflat import IVFFlatIndex
from pgvector_tpu.ops.metric import Metric
from bench import make_data

CKPT = "/tmp/exp_1m_ckpt"
table = load_table(os.path.join(CKPT, "table"))
idx = load_hnsw(table, os.path.join(CKPT, "index"))
idx.beam_expand = 8
_, qs16 = make_data(1_000_000, 16000, seed=1)  # fresh query set, qps-only
print("loaded", flush=True)
out = {}
for batch in (4000, 8000, 16000):
    q = qs16[:batch]
    idx.search(q, 10, ef_search=40)  # compile
    t0 = time.time()
    for s in range(0, 16000, batch):
        idx.search(qs16[s:s+batch], 10, ef_search=40)
    dt = time.time() - t0
    out[f"hnsw_batch{batch}_qps"] = round(16000/dt, 1)
    print(batch, out[f"hnsw_batch{batch}_qps"], flush=True)
# small-batch latency (per-call wall, warm)
for nb in (1, 16, 256):
    q = qs16[:nb]
    idx.search(q, 10, ef_search=40)
    reps = 50 if nb <= 16 else 10
    t0 = time.time()
    for _ in range(reps):
        idx.search(q, 10, ef_search=40)
    out[f"hnsw_lat_ms_b{nb}"] = round((time.time()-t0)/reps*1000, 2)
    print(nb, out[f"hnsw_lat_ms_b{nb}"], "ms", flush=True)
ivf = IVFFlatIndex(table, Metric.L2, lists=1000, seed=0)
for nb in (1, 256, 4000):
    q = qs16[:nb]
    ivf.search(q, 10, probes=10)
    reps = 20 if nb <= 256 else 3
    t0 = time.time()
    for _ in range(reps):
        ivf.search(q, 10, probes=10)
    dt = (time.time()-t0)/reps
    out[f"ivf_lat_ms_b{nb}"] = round(dt*1000, 2)
    out[f"ivf_qps_b{nb}"] = round(nb/dt, 1)
    print(nb, out[f"ivf_lat_ms_b{nb}"], "ms", flush=True)
print(json.dumps(out), flush=True)
print("DONE", flush=True)
