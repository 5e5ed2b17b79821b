# GIST-200k x 960-d int8 packed-scan tier A/B (VERDICT r4 #9): same graph,
# same queries, scan via (a) the int8 packed slab cache (per-dim dequant
# scale + exact f32 re-rank) vs (b) exact bf16 row gathers — does the tier
# beat row-gather at equal recall?  Round 4 committed an empty artifact
# because the int8 scan OOM'd at compile (XLA copied the 8 GB cache into
# the hop loop); round 5's donated-cache aliasing removes the copy.
#
# Saves incrementally; build checkpoint under /tmp survives retries.
import time, json, os, sys
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

OUT = os.environ.get(
    "LANE_OUT", "/root/repo/experiments/results/lane_gist200k_int8_r5.json")
nq, k, batch = 4000, 10, 4000
n = int(os.environ.get("LANE_N", 200_000))
db, qs = make_data(n, nq, dim=960, seed=7)
table = DenseTable(960, dtype=jnp.bfloat16, capacity=n)
table.insert(db)
del db
print("loaded", table.count, flush=True)
out = {"n": n, "dim": 960, "dtype": "bfloat16", "modes": {}}


def save():
    with open(OUT, "w") as f:
        json.dump(out, f)


GT_NPY = "/tmp/lane_gist_int8_gt.npy"
CKPT = "/tmp/lane_gist_int8_ckpt"
if os.path.exists(GT_NPY):
    gt = np.load(GT_NPY)
    prior = json.load(open(OUT)) if os.path.exists(OUT) else {}
    out["exact_gt_s"] = prior.get("exact_gt_s", -1.0)
else:
    t0 = time.time()
    _, gt = FlatIndex(table, Metric.L2).search(qs, k)
    gt = np.asarray(gt)
    out["exact_gt_s"] = round(time.time() - t0, 1)
    np.save(GT_NPY, gt)
save()
print("gt", out["exact_gt_s"], flush=True)
if os.path.isdir(CKPT):
    from pgvector_tpu.io import load_hnsw

    idx = load_hnsw(table, CKPT)
    prior = json.load(open(OUT)) if os.path.exists(OUT) else {}
    out["build_s"] = prior.get("build_s", -1.0)
    print("build loaded from checkpoint", flush=True)
else:
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                    wave_size=1024, dedup=False, beam_expand=4)
    out["build_s"] = round(time.time() - t0, 1)
    save()
    print("build", out["build_s"], flush=True)
    from pgvector_tpu.io import save_hnsw

    save_hnsw(idx, CKPT)
    print("checkpointed", flush=True)
save()
idx.beam_expand = 8
for mode in ("int8", "off"):
    os.environ["PGVECTOR_TPU_PACKED_SCAN"] = mode
    idx._nbr_vals = None  # free the other mode's cache before switching
    rows = []
    for ef in (40, 80, 100):
        idx.search(qs[:batch], k, ef_search=ef)  # compile + cache build
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            r = np.concatenate(
                [np.asarray(idx.search(qs[s:s+batch], k, ef_search=ef)[1])
                 for s in range(0, nq, batch)])[:nq]
            dt = min(dt, time.time() - t0)
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(r, gt))
        rows.append({"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
                     "qps": round(nq/dt, 1)})
        print(mode, json.dumps(rows[-1]), flush=True)
        out["modes"][mode] = rows
        save()
print(json.dumps(out), flush=True)
print("DONE", flush=True)
