# 10M x 128-d single-chip HNSW lane (VERDICT r3 missing #2, 10M half).
# bf16 (halfvec-style) table: f32 would need ~12.5 GB (table + index value
# copy + graph) of 15.75 GB HBM — too tight for a 1.5 h build; the
# reference's own guidance at 10M rows is fp16 indexing (README.md:558-569).
# The 16-bit table rule stores bf16 index values -> ~7.5 GB total.
#
# Saves incrementally after every milestone (the round-3 attempt lost its
# build when the tunnel relay died mid-run).
import time, json, os, sys
sys.path.insert(0, "/root/repo")
# visible build progress + real CPU accrual for the wedge watchdog (the
# async wave loop otherwise queues ~10k waves silently for hours)
os.environ.setdefault("PGVECTOR_TPU_WAVE_SYNC_EVERY", "64")
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
                     "/root/repo/experiments/results/lane_10m_hnsw_r5.json")
nq, k, batch = 4000, 10, 4000
n = int(os.environ.get("LANE_N", 10_000_000))
# wave size is the build-throughput lever at 10M: waves are independent
# batched beam searches, and batch efficiency is strongly sublinear (the
# 1M latency table: batch 256 costs ~1.2x batch 1), so fewer, fatter waves
# raise rows/s.  r4's 8,599 s build ran wave 1024; r5 defaults to 2048
# after an on-chip 205k A/B (see lane JSON build_wave field).
WAVE = int(os.environ.get("LANE_WAVE", 2048))
# efc floor is 2*m (the reference's own constraint); efc=40 cuts the
# per-wave search/connect work ~40% vs r4's efc=64 run so the session
# reaches the serving sweep — the r4 row keeps the efc=64 build_s
# evidence, this lane's JSON records its own config.
EFC = int(os.environ.get("LANE_EFC", 64))
db, qs = make_data(n, nq)
# LANE_CAP lets a smaller-n run reuse programs compiled for a bigger
# capacity: wave/search program shapes are capacity-specialized, and a
# fresh capacity costs a ~10-15 min remote compile stall on this image —
# the 4M pivot rides the cap-16M programs the 10M attempt just compiled.
CAP = int(os.environ.get("LANE_CAP", 0)) or n
table = DenseTable(128, dtype=jnp.bfloat16, capacity=CAP)
for s in range(0, n, 2_500_000):
    table.insert(db[s:s+2_500_000])
del db
print("loaded", table.count, flush=True)
out = {"n": n, "dim": 128, "dtype": "bfloat16", "sweep": []}


def save():
    with open(OUT, "w") as f:
        json.dump(out, f)


# resumable milestones: the axon worker can wedge mid-lane (watchdog_run
# kills + retries); GT and the built graph persist so a retry never
# repeats a finished 1.5 h phase.  Paths are n-specific: the r5 session
# briefly shared one GT path between the 10M and 4M configs, which would
# have silently scored one lane's recall against the other's GT on resume.
GT_NPY = f"/tmp/lane10m_gt_{n}.npy"
CKPT = f"/tmp/lane10m_ckpt_{n}"
if os.path.exists(GT_NPY):
    gt = np.load(GT_NPY)
    prior = json.load(open(OUT)) if os.path.exists(OUT) else {}
    out["exact_gt_s"] = prior.get("exact_gt_s", -1.0)
    out["exact_path"] = prior.get("exact_path", "grouped(cached)")
    print("gt cached", flush=True)
else:
    flat = FlatIndex(table, Metric.L2)
    t0 = time.time()
    _, gt = flat.search(qs, k)
    gt = np.asarray(gt)
    out["exact_gt_s"] = round(time.time() - t0, 1)
    out["exact_path"] = flat.last_path
    np.save(GT_NPY, gt)
save()
print("gt", out["exact_gt_s"], out["exact_path"], flush=True)
if os.path.isdir(CKPT):
    from pgvector_tpu.io import load_hnsw

    t0 = time.time()
    idx = load_hnsw(table, CKPT)
    prior = json.load(open(OUT)) if os.path.exists(OUT) else {}
    out["build_s"] = prior.get("build_s", -1.0)
    print("build loaded from checkpoint in", round(time.time() - t0, 1),
          flush=True)
else:
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=EFC,
                    wave_size=WAVE, dedup=False, beam_expand=4)
    out["build_s"] = round(time.time() - t0, 1)
    out["build_wave"] = WAVE
    out["build_efc"] = EFC
    save()
    print("build", out["build_s"], flush=True)
    from pgvector_tpu.io import save_hnsw

    save_hnsw(idx, CKPT)
    print("checkpointed", flush=True)
save()
idx.beam_expand = 8
pdt, sk = idx._packed_plan()
out["packed_scan"] = f"sketch{sk}" if sk else str(pdt)
for ef in (40, 100):
    idx.search(qs[:batch], k, ef_search=ef)
    t0 = time.time()
    r = np.concatenate([np.asarray(idx.search(qs[s:s+batch], k, ef_search=ef)[1])
                        for s in range(0, nq, batch)])[:nq]
    dt = time.time() - t0
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt))
    out["sweep"].append({"ef": ef, "recall_at_10": round(hits/(nq*k), 4),
                         "qps": round(nq/dt, 1)})
    save()
    print(json.dumps(out["sweep"][-1]), flush=True)
print(json.dumps(out), flush=True)
print("DONE", flush=True)
