# Single-query / small-batch latency lane (VERDICT r3 #4: p50 68.5 ms at
# batch 1 from ~24 sequential layer-0 hops; target p50 < 10 ms at 1M).
#
# Sweeps the latency levers at batch 1/16/256 on the 1M x 128-d surrogate:
#   - query beam expand (wider beam => fewer data-dependent hops; at tiny
#     batches a hop costs nearly the same regardless of width)
#   - visited mode (the hash probe is ~half the hop op count)
# and reports p50/p99 over repeated single dispatches.
import time, json, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

OUT = "/tmp/lane_latency.json"
N = int(os.environ.get("LAT_N", 1_000_000))
EF = int(os.environ.get("LAT_EF", 40))
REPS = int(os.environ.get("LAT_REPS", 30))

from bench import make_data
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable

db, qs = make_data(N, 512)
table = DenseTable(128, capacity=N)
table.insert(db)
print("loaded", flush=True)
t0 = time.time()
idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64, wave_size=1024,
                dedup=False, beam_expand=4)
print("build", round(time.time() - t0, 1), flush=True)

out = {"n": N, "ef": EF, "lanes": []}


def save():
    with open(OUT, "w") as f:
        json.dump(out, f)


for expand in (8, 16, 32, 40):
    idx.beam_expand = expand
    for batch in (1, 16, 256):
        q = qs[:batch]
        idx.search(q, 10, ef_search=EF)  # compile
        lats = []
        for r in range(REPS):
            t0 = time.time()
            idx.search(qs[r % 256: r % 256 + batch][:batch] if batch > 1
                       else qs[r % 256: r % 256 + 1], 10, ef_search=EF)
            lats.append((time.time() - t0) * 1e3)
        lats.sort()
        row = {"expand": expand, "batch": batch,
               "p50_ms": round(lats[len(lats) // 2], 2),
               "p99_ms": round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 2),
               "hops": int(idx._last_scan_steps)}
        out["lanes"].append(row)
        print(json.dumps(row), flush=True)
        save()

# recall check at the chosen latency config (expand must not cost recall):
# exact GT over the first 1000 queries
from pgvector_tpu.index.flat import FlatIndex

_, gt = FlatIndex(table, Metric.L2, tile=16384).search(qs[:512], 10)
gt = np.asarray(gt)
for expand in (8, 40):
    idx.beam_expand = expand
    _, r = idx.search(qs[:512], 10, ef_search=EF)
    rec = np.mean([len(set(map(int, a)) & set(map(int, e))) / 10
                   for a, e in zip(np.asarray(r), gt)])
    out[f"recall_ef{EF}_expand{expand}"] = round(float(rec), 4)
    print("recall", expand, out[f"recall_ef{EF}_expand{expand}"], flush=True)
save()
print("DONE", flush=True)
