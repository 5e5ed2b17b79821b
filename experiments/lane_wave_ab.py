# Build wave-size A/B at ~205k rows (the bench steady-build shape).
# Decides the 10M lane's LANE_WAVE: r4's 10M build ran 8,599 s at wave
# 1024 and landed no serving numbers before the session ended (VERDICT r4
# weak #3).  Waves are independent batched beam searches with strongly
# sublinear batch cost, so fatter waves should raise rows/s; the question
# is how much graph quality (recall at fixed ef) pays for intra-wave
# independence.  ~8 min of chip time buys the answer before betting 2 h.
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PGVECTOR_TPU_WAVE_SYNC_EVERY", "64")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from bench import make_data
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable

OUT = os.environ.get("LANE_OUT",
                     "/root/repo/experiments/results/lane_wave_ab.json")
n, nq, k = 204_800, 2000, 10
db, qs = make_data(n, nq)
table = DenseTable(128, capacity=n)
table.insert(db)
_, gt = FlatIndex(table, Metric.L2).search(qs, k)
gt = np.asarray(gt)
out = {"n": n, "lanes": []}
for wave in [int(w) for w in
             os.environ.get("AB_WAVES", "1024,2048,4096").split(",")]:
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                    wave_size=wave, dedup=False, beam_expand=4)
    build_s = time.time() - t0
    idx.beam_expand = 8
    lane = {"wave": wave, "build_s": round(build_s, 1),
            "rows_per_s": round(n / build_s, 1), "sweep": []}
    for ef in (40, 100):
        idx.search(qs, k, ef_search=ef)  # compile
        t0 = time.time()
        _, r = idx.search(qs, k, ef_search=ef)
        dt = time.time() - t0
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(np.asarray(r), gt))
        lane["sweep"].append({"ef": ef,
                              "recall_at_10": round(hits / (nq * k), 4),
                              "qps": round(nq / dt, 1)})
    idx._nbr_vals = None
    del idx
    out["lanes"].append(lane)
    print(json.dumps(lane), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f)
print("DONE", flush=True)
