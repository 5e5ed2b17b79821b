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

OUT = os.environ.get("LAT_OUT", "/tmp/lane_latency.json")
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

# device-only latency: run REPS searches back-to-back INSIDE one jitted
# program (lax.fori_loop over the mono-jit body) and divide — excludes the
# per-dispatch tunnel round-trip, isolating the algorithmic serial-hop cost
# a production (non-tunneled) serving path would see.
import jax
import jax.numpy as jnp
from pgvector_tpu.index import hnsw_kernels as K

idx._sync_device_meta()
pdt, sk = idx._packed_plan()
packed = idx._ensure_nbr_vals(pdt, sk) if pdt is not None else None


def _loop_search(qs_dev, reps: int, expand: int):
    def body(i, acc):
        # vary the query each iteration so no step is dead code
        q = jax.lax.dynamic_slice(qs_dev, (i % qs_dev.shape[0], 0),
                                  (1, qs_dev.shape[1]))
        d, r, _, _ = K.query_search(
            idx.kind, idx.metric, idx.values, idx.nbr0, idx.nbr_up,
            idx._up_slot_dev, idx._elem_rows_dev, idx.table.valid, None,
            q, jnp.int32(idx.entry), jnp.int32(idx.entry_level),
            ef=EF, m=idx.m, l_unroll=idx._l_unroll, k=10, heaptids=10,
            expand=expand, packed_vals=packed,
            rerank=(pdt is not None and pdt != jnp.float32),
            user_dist=True,
        )
        return acc + d[0, 0] + jnp.float32(r[0, 0])

    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))


loop_jit = jax.jit(_loop_search, static_argnums=(1, 2))
qs_dev = jnp.asarray(qs[:256])
for expand in (8, 40):
    loop_jit(qs_dev, 1, expand).block_until_ready()  # compile
    t0 = time.time()
    loop_jit(qs_dev, 50, expand).block_until_ready()
    dev_ms = (time.time() - t0) / 50 * 1e3
    # subtract one dispatch's fixed cost using the 1-rep call
    t0 = time.time()
    loop_jit(qs_dev, 1, expand).block_until_ready()
    one_ms = (time.time() - t0) * 1e3
    row = {"expand": expand, "device_only_ms_per_query": round(dev_ms, 2),
           "single_dispatch_ms": round(one_ms, 2)}
    out.setdefault("device_only", []).append(row)
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
