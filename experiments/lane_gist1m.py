# GIST-shaped lane at FULL 1M x 960-d bf16 (VERDICT r3 weak #2), now with
# the sketched packed-adjacency scan: the full-width (cap, 2m, 960) cache
# would need 61 GB, so hops ride a bf16 D->D' random projection slab cache
# (largest 128-multiple fitting the HBM budget, capped at 256) with exact
# f32 re-rank of the final pool.
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

OUT = os.environ.get("LANE_OUT",
                     "/root/repo/experiments/results/lane_gist1m_r4.json")
nq, k, batch = 4000, 10, 4000
expand, qexpand = 4, 8
gn = int(os.environ.get("LANE_N", 1_000_000))
gdb, gqs = make_data(gn, nq, dim=960, seed=7)
gtab = DenseTable(960, dtype=jnp.bfloat16, capacity=gn)
gtab.insert(gdb)
del gdb
print("loaded", flush=True)
gist = {"n": gn, "dim": 960, "dtype": "bfloat16", "sweep": []}


def save():
    with open(OUT, "w") as f:
        json.dump(gist, f)


t0 = time.time()
_, ggt = FlatIndex(gtab, Metric.L2).search(gqs, k)
ggt = np.asarray(ggt)
gist["gt_s"] = round(time.time() - t0, 1)
save()
print("gt", gist["gt_s"], flush=True)
t0 = time.time()
gidx = HNSWIndex(gtab, Metric.L2, m=16, ef_construction=64,
                 wave_size=1024, dedup=False, beam_expand=expand)
gist["build_s"] = round(time.time() - t0, 1)
save()
print("build", gist["build_s"], flush=True)
gidx.beam_expand = qexpand
pdt, sk = gidx._packed_plan()
gist["packed_scan"] = (
    f"sketch{sk}+prune{os.environ.get('PGVECTOR_TPU_SKETCH_PRUNE', '64')}"
    if sk else jnp.dtype(pdt).name if pdt else "off")
for ef in (40, 100):
    gidx.search(gqs[:batch], k, ef_search=ef)
    t0 = time.time()
    r = np.concatenate([np.asarray(gidx.search(gqs[s:s+batch], k, ef_search=ef)[1])
                        for s in range(0, nq, batch)])[:nq]
    dt = time.time() - t0
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, ggt))
    gist["sweep"].append({"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
                          "qps": round(nq/dt, 1)})
    save()
    print(ef, gist["sweep"][-1], flush=True)
print(json.dumps(gist), flush=True)
print("DONE", flush=True)
