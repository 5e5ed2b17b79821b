# Pallas fused hop-tail A/B at 1M (BENCH_NOTES roadmap #3): build one
# standard-surrogate graph, then sweep ef=40/100 with the XLA tail vs the
# fused VMEM tail (PGVECTOR_TPU_PALLAS_TAIL) in the same process.  The
# kernel is documented bit-identical to the unfused tail, so recall must
# match exactly; the question is wall-clock.
import time, json, sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from pgvector_tpu.store.table import DenseTable
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from bench import make_data

nq, k, batch = 4000, 10, 4000
n = 1_000_000
db, qs = make_data(n, nq)
table = DenseTable(128, capacity=n)
table.insert(db)
del db
print("loaded", flush=True)
flat = FlatIndex(table, Metric.L2)
t0 = time.time()
_, gt = flat.search(qs, k)
gt = np.asarray(gt)
print("gt", round(time.time() - t0, 1), flat.last_path, flush=True)
t0 = time.time()
idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                wave_size=1024, dedup=False, beam_expand=4)
build_s = round(time.time() - t0, 1)
print("build", build_s, flush=True)
idx.beam_expand = 8
out = {"n": n, "build_s": build_s, "lanes": {}}
for tail in ("0", "1"):
    os.environ["PGVECTOR_TPU_PALLAS_TAIL"] = tail
    name = "xla_tail" if tail == "0" else "pallas_tail"
    out["lanes"][name] = []
    for ef in (40, 100):
        idx.search(qs[:batch], k, ef_search=ef)  # warm this variant
        t0 = time.time()
        r = np.concatenate(
            [np.asarray(idx.search(qs[s:s+batch], k, ef_search=ef)[1])
             for s in range(0, nq, batch)])[:nq]
        dt = time.time() - t0
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(r, gt))
        rec = {"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
               "qps": round(nq/dt, 1)}
        out["lanes"][name].append(rec)
        print(name, json.dumps(rec), flush=True)
os.environ.pop("PGVECTOR_TPU_PALLAS_TAIL", None)
# batch-8000 check on the faster tail variant
best = max(out["lanes"], key=lambda z: out["lanes"][z][0]["qps"])
os.environ["PGVECTOR_TPU_PALLAS_TAIL"] = "1" if best == "pallas_tail" else "0"
b8 = 8000
idx.search(qs[:b8 // 2], k, ef_search=40)
qs8 = np.concatenate([qs, qs])[:b8]
idx.search(qs8, k, ef_search=40)
t0 = time.time()
for _ in range(3):
    r = np.asarray(idx.search(qs8, k, ef_search=40)[1])
dt = (time.time() - t0) / 3
out["batch8000_qps_best_tail"] = {"tail": best, "qps": round(b8/dt, 1)}
print(json.dumps(out), flush=True)
with open("/tmp/lane_ptail.json", "w") as f:
    json.dump(out, f)
print("DONE", flush=True)
