# Device-only single-query latency probe (VERDICT r3 #4, second half).
#
# lane_latency.py measured the tunneled per-call p50 (30.9 ms at batch 1,
# expand=40) and showed batch-16 p50 ~= batch-1 p50 — i.e. the remote axon
# tunnel's dispatch round-trip dominates.  This lane isolates the two
# components the production (non-tunneled) serving path cares about:
#   1. bare dispatch round-trip: a trivial jitted scalar add, p50 over reps;
#   2. device-only search cost: REPS full searches (greedy descent +
#      layer-0 beam, the same mono-jit body production uses) back-to-back
#      INSIDE one fori_loop, total time / REPS — no per-search dispatch.
# The reference answers one hnswgettuple in ~1 ms class on a warm cache
# (hnswscan.c:189-331); the device-only number is our comparable figure.
#
# Resumable: the 1M graph persists at /tmp/lane1m_lat_ckpt; if the 10M
# lane's checkpoint (/tmp/lane10m_ckpt) exists, a 10M probe row is added.
import time, json, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from bench import make_data
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.index.flat import FlatIndex
from pgvector_tpu.index import hnsw_kernels as K
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.store.table import DenseTable

OUT = os.environ.get("LAT_OUT",
                     "/root/repo/experiments/results/lane_device_latency_r4.json")
EF = int(os.environ.get("LAT_EF", 40))
out = {"ef": EF, "rows": []}


def save():
    with open(OUT, "w") as f:
        json.dump(out, f)


# 1. bare dispatch round-trip through the tunnel --------------------------
_one = jax.jit(lambda x: x + 1.0)
_one(jnp.float32(0)).block_until_ready()
lats = []
for _ in range(60):
    t0 = time.time()
    _one(jnp.float32(1)).block_until_ready()
    lats.append((time.time() - t0) * 1e3)
lats.sort()
out["bare_dispatch_p50_ms"] = round(lats[len(lats) // 2], 2)
out["bare_dispatch_p99_ms"] = round(lats[-1], 2)
print("bare dispatch", out["bare_dispatch_p50_ms"], "ms", flush=True)
save()


def probe(idx, qs, label, expands=(8, 40), reps=50):
    idx._sync_device_meta()
    pdt, sk = idx._packed_plan()
    packed = idx._ensure_nbr_vals(pdt, sk) if pdt is not None else None

    # graph arrays enter as jit ARGUMENTS, not closure captures: captured
    # device arrays lower as constants baked into the program (8.91 GB at
    # 1M — the compile wedged through the tunnel until the lane timeout)
    def _loop_search(values, nbr0, nbr_up, up_slot, elem_rows, valid,
                     packed_v, qs_dev, reps: int, expand: int):
        def body(i, acc):
            q = jax.lax.dynamic_slice(
                qs_dev, (i % qs_dev.shape[0], 0), (1, qs_dev.shape[1]))
            d, r, _, _ = K.query_search(
                idx.kind, idx.metric, values, nbr0, nbr_up,
                up_slot, elem_rows, valid, None,
                q, jnp.int32(idx.entry), jnp.int32(idx.entry_level),
                ef=EF, m=idx.m, l_unroll=idx._l_unroll, k=10, heaptids=10,
                expand=expand, packed_vals=packed_v,
                rerank=(pdt is not None and pdt != jnp.float32),
                user_dist=True,
            )
            return acc + d[0, 0] + jnp.float32(r[0, 0])

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    loop_jit = jax.jit(_loop_search, static_argnums=(8, 9))
    args = (idx.values, idx.nbr0, idx.nbr_up, idx._up_slot_dev,
            idx._elem_rows_dev, idx.table.valid, packed)
    qs_dev, _ = idx._query_rep(qs[:256])  # same coercion production uses
    for expand in expands:
        loop_jit(*args, qs_dev, 1, expand).block_until_ready()  # compile
        t0 = time.time()
        loop_jit(*args, qs_dev, reps, expand).block_until_ready()
        total_ms = (time.time() - t0) * 1e3
        t0 = time.time()
        loop_jit(*args, qs_dev, 1, expand).block_until_ready()
        one_ms = (time.time() - t0) * 1e3
        # total includes one dispatch; (total - one)/(reps-1) cancels it
        dev_ms = (total_ms - one_ms) / (reps - 1)
        row = {"lane": label, "expand": expand,
               "device_only_ms_per_query": round(dev_ms, 2),
               "single_dispatch_total_ms": round(one_ms, 2)}
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        save()


# 2. 1M probe (graph checkpointed for watchdog retries) -------------------
N = int(os.environ.get("LAT_N", 1_000_000))
db, qs = make_data(N, 512)
table = DenseTable(128, capacity=N)
table.insert(db)
del db
# the bench graph cache (.bench_cache/hnsw_n1000000_…_w1024) is the SAME
# build — same deterministic make_data db, same m/efc/expand/wave/capacity
# — so LAT_CKPT can point there and skip the ~680 s rebuild entirely
CKPT = os.environ.get("LAT_CKPT", "/tmp/lane1m_lat_ckpt")
if os.path.isdir(CKPT):
    from pgvector_tpu.io import load_hnsw

    idx = load_hnsw(table, CKPT)
    print("1M graph loaded from checkpoint", flush=True)
else:
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=16, ef_construction=64,
                    wave_size=1024, dedup=False, beam_expand=4)
    out["build_s_1m"] = round(time.time() - t0, 1)
    print("1M build", out["build_s_1m"], flush=True)
    from pgvector_tpu.io import save_hnsw

    save_hnsw(idx, CKPT)
probe(idx, qs, "1m_f32")

# recall at the latency expands (a wider beam must not cost recall)
_, gt = FlatIndex(table, Metric.L2, tile=16384).search(qs[:512], 10)
gt = np.asarray(gt)
for expand in (8, 40):
    idx.beam_expand = expand
    _, r = idx.search(qs[:512], 10, ef_search=EF)
    rec = float(np.mean([len(set(map(int, a)) & set(map(int, e))) / 10
                         for a, e in zip(np.asarray(r), gt)]))
    out["rows"].append({"lane": "1m_f32_recall", "expand": expand,
                        "recall_at_10": round(rec, 4)})
    print(out["rows"][-1], flush=True)
    save()

# 3. optional 10M probe off the scale lane's checkpoint -------------------
CKPT10 = "/tmp/lane10m_ckpt"
if os.path.isdir(CKPT10) and os.environ.get("LAT_SKIP_10M", "") != "1":
    del idx, table
    n10 = 10_000_000
    db, qs10 = make_data(n10, 512)
    t10 = DenseTable(128, dtype=jnp.bfloat16, capacity=n10)
    for s in range(0, n10, 2_500_000):
        t10.insert(db[s:s + 2_500_000])
    del db
    from pgvector_tpu.io import load_hnsw

    idx10 = load_hnsw(t10, CKPT10)
    print("10M graph loaded", flush=True)
    probe(idx10, qs10, "10m_bf16", expands=(8,), reps=30)

print(json.dumps(out), flush=True)
print("DONE", flush=True)
