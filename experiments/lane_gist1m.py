# GIST-shaped lane at FULL 1M x 960-d bf16 (VERDICT r2 weak #4a), after
# the memory fixes: bf16 index values for 16-bit tables, identity-gather
# skip in _insert_rows, donated table appends.
import time, json, sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from pgvector_tpu.store.table import DenseTable
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from bench import make_data

nq, k, batch = 4000, 10, 4000
expand, qexpand = 4, 8
gn = 1_000_000
gdb, gqs = make_data(gn, nq, dim=960, seed=7)
gtab = DenseTable(960, dtype=jnp.bfloat16, capacity=gn)
gtab.insert(gdb)
del gdb
print("loaded", flush=True)
t0 = time.time()
_, ggt = FlatIndex(gtab, Metric.L2).search(gqs, k)
ggt = np.asarray(ggt)
gt_s = time.time() - t0
print("gt", round(gt_s, 1), flush=True)
t0 = time.time()
gidx = HNSWIndex(gtab, Metric.L2, m=16, ef_construction=64,
                 wave_size=1024, dedup=False, beam_expand=expand)
g_build = time.time() - t0
print("build", round(g_build, 1), flush=True)
gidx.beam_expand = qexpand
gist = {"n": gn, "dim": 960, "dtype": "bfloat16",
        "build_s": round(g_build, 1), "gt_s": round(gt_s, 1), "sweep": []}
for ef in (40, 100):
    gidx.search(gqs[:batch], k, ef_search=ef)
    t0 = time.time()
    r = np.concatenate([np.asarray(gidx.search(gqs[s:s+batch], k, ef_search=ef)[1])
                        for s in range(0, nq, batch)])[:nq]
    dt = time.time() - t0
    hits = sum(len(set(map(int,a)) & set(map(int,e))) for a,e in zip(r, ggt))
    gist["sweep"].append({"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
                          "qps": round(nq/dt, 1)})
    print(ef, gist["sweep"][-1], flush=True)
print(json.dumps(gist), flush=True)
with open("/tmp/lane_gist1m_v2.json", "w") as f:
    json.dump(gist, f)
print("DONE", flush=True)
