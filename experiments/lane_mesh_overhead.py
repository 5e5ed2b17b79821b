#!/usr/bin/env python
"""Measure the collective (all_gather) share of the mesh-parallel HNSW
build phases on the virtual 8-device CPU mesh (VERDICT r4 weak #6 / next
#6): the v5e-8 build projection divides the device phases by the chip
count assuming zero collective overhead — this lane bounds that optimism
with a measured number instead of an assumption.

Method: jit the production sharded programs (wave_search_sharded,
connect_level_sharded) on representative 1M-build shapes (wave 1024,
m=16, efc=64, 128-d), time them steady-state, then rebuild the SAME
programs with jax.lax.all_gather ablated to a local concatenate of the
device's own shard (identical output shapes, zero cross-device traffic)
and time again.  collective_frac = 1 - t_ablated / t_full per phase,
combined with the measured 1M phase split (search 45.7 s / connect 83.4 s,
BASELINE.md round-4 table).

Caveat (recorded in the output JSON): CPU virtual-mesh collectives are
host memcpys, while the projection's target is ICI — whose bandwidth is
engineered to overlap exactly this traffic.  The CPU-measured fraction is
therefore a CONSERVATIVE (pessimistic) bound; bench.py publishes the
projection as [ideal, ideal/(1-collective_frac)] using this file.

Writes experiments/results/mesh_overhead.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgvector_tpu.index import hnsw_kernels as K
from pgvector_tpu.index.hnsw import HNSWIndex
from pgvector_tpu.ops.metric import Metric
from pgvector_tpu.parallel import make_mesh
from pgvector_tpu.store.table import DenseTable


def _time(fn, reps=5):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def main():
    ndev = 8
    mesh = make_mesh(ndev)
    n, dim, m, efc, wave = int(os.environ.get("MO_N", 65536)), 128, 16, 64, 1024
    rng = np.random.default_rng(3)
    db = rng.normal(size=(n, dim)).astype(np.float32)
    table = DenseTable(dim, capacity=n)
    table.insert(db)
    # a realistically-occupied graph to search/connect against
    idx = HNSWIndex(table, Metric.L2, m=m, ef_construction=efc,
                    wave_size=wave, dedup=False, seed=0, beam_expand=4)
    idx._sync_device_meta()

    # representative wave inputs (the last full wave's shapes)
    elems = np.arange(n - wave, n, dtype=np.int64)
    lv = np.asarray(idx.levels[n - wave: n], np.int32)
    qs = idx._elems_as_queries(jnp.asarray(elems.astype(np.int32)))
    args = (idx.values, idx.nbr0, idx.nbr_up, idx._up_slot_dev, qs,
            jnp.asarray(elems.astype(np.int32)), jnp.asarray(lv),
            jnp.int32(idx.entry), jnp.int32(idx.entry_level))
    kw = dict(ef=efc, m=m, l_unroll=idx._l_unroll, exclude_self=True,
              expand=4, vmode=K.visited_mode())

    def run_search():
        return K.wave_search_sharded(mesh, "dense", Metric.L2, *args, **kw)

    t_search_full = _time(run_search)
    out_d, out_i = run_search()

    # connect inputs for level 0 (the dominant connect cost: full wave)
    lm = 2 * m
    e_lvl = jnp.asarray(elems.astype(np.int32))
    elig = jnp.ones(wave, jnp.bool_)
    chunk = min(2048, wave * lm)
    c_args = dict(level0=True, m=m, mi=min(m, wave), smax=lm, chunk=chunk,
                  sdim=0)

    def run_connect():
        # NON-donating copies each call so repeated timing is legal
        return K.connect_level_sharded(
            mesh, "dense", Metric.L2, idx.values,
            idx.nbr0 + 0, idx.nbr_up + 0,
            jnp.logical_or(idx.kept0, False),
            jnp.logical_or(idx.kept_up, False),
            idx._up_slot_dev, e_lvl, elig, jnp.int32(0),
            out_d[0], out_i[0], **c_args)

    t_connect_full = _time(run_connect)

    # ---- ablated programs: all_gather → local concat (same shapes, no
    # cross-device traffic).  Clear the program caches so the builders
    # re-trace under the patched primitive, and again after restoring.
    real_ag = jax.lax.all_gather

    def fake_ag(x, axis_name, *, axis=0, tiled=False, **kwargs):
        reps = [x] * ndev
        return (jnp.concatenate(reps, axis=axis) if tiled
                else jnp.stack(reps, axis=axis))

    K._wave_search_sharded_fn.cache_clear()
    K._connect_sharded_fn.cache_clear()
    jax.lax.all_gather = fake_ag
    try:
        t_search_abl = _time(run_search)
        t_connect_abl = _time(run_connect)
    finally:
        jax.lax.all_gather = real_ag
        K._wave_search_sharded_fn.cache_clear()
        K._connect_sharded_fn.cache_clear()

    cf_search = max(0.0, 1.0 - t_search_abl / t_search_full)
    cf_connect = max(0.0, 1.0 - t_connect_abl / t_connect_full)
    # weight by the round-4 measured 1M phase split (search 45.7 s,
    # connect 83.4 s — BASELINE.md)
    w_s, w_c = 45.7, 83.4
    cf = (cf_search * w_s + cf_connect * w_c) / (w_s + w_c)
    out = {
        "method": "jitted sharded programs timed steady-state on the "
                  "8-device CPU virtual mesh, then re-traced with "
                  "jax.lax.all_gather ablated to a same-shape local concat",
        "caveat": "CPU-mesh collectives are host memcpys; on ICI this "
                  "fraction is an upper bound (pessimistic) for the "
                  "v5e-8 projection",
        "wave": wave, "n_graph": n, "dim": dim, "m": m,
        "t_search_full_s": round(t_search_full, 4),
        "t_search_ablated_s": round(t_search_abl, 4),
        "t_connect_full_s": round(t_connect_full, 4),
        "t_connect_ablated_s": round(t_connect_abl, 4),
        "collective_frac_search": round(cf_search, 4),
        "collective_frac_connect": round(cf_connect, 4),
        "phase_weights_s": [w_s, w_c],
        "collective_frac": round(cf, 4),
    }
    res = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                       "mesh_overhead.json")
    os.makedirs(os.path.dirname(res), exist_ok=True)
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
