#!/usr/bin/env python
"""Headline benchmark — SIFT-1M-shaped ANN workload on one TPU chip.

North-star metric (BASELINE.md): SIFT-1M recall@10 vs QPS for an HNSW
ef_search sweep, plus build wall-clock.  SIFT itself can't be fetched
(zero-egress image), so the workload is a deterministic SIFT-shaped
surrogate: N × 128-d vectors drawn from a clustered mixture with
overlapping clusters (SIFT's local structure at comparable difficulty —
the recall sweep must move off 1.0 to be meaningful), 1,000 held-out
queries, exact top-10 ground truth computed on device.

Prints exactly ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   plus context: recall sweep, steady-state vs total build time, MFU,
   IVF probe-scan numbers}

``vs_baseline`` compares against PG_BASELINE_QPS — an assumed
single-process pgvector 0.8.6 HNSW figure for this workload shape.
Provenance: the reference repo publishes no numbers (SURVEY.md §6);
public ANN-Benchmarks-style runs of pgvector HNSW (m=16) on SIFT-1M
typically land at several hundred to ~2k QPS per core at recall@10≈0.95,
so 1,000 QPS is taken as the single-core baseline.  The BASELINE.json
target is ≥10×.

Environment knobs: BENCH_N (default 1_000_000), BENCH_Q (8000),
BENCH_BATCH (8000 — throughput saturates at ~8k queries/batch:
11,566 → 12,472 qps going 4000 → 8000 at 1M, flat at 16000; fixed
per-op dispatch overhead dominates below ~2k), BENCH_EF (sweep
list), BENCH_EXPAND (4), BENCH_QEXPAND (8),
BENCH_IVF (1 = also benchmark IVFFlat probes=10).

Every BASELINE.json config runs by default so the driver JSON alone
substantiates the whole matrix (VERDICT r3 #1) — at time-budgeted sizes
where a 1M build would dominate the run (each sub-lane reports its n):
BENCH_GIST/BENCH_BIT/BENCH_SPARSE/BENCH_LATENCY (default 1, 0 disables),
BENCH_METRICS (default "ip,cosine", "" disables), with sizes under
BENCH_GIST_N (200k), BENCH_BIT_N (200k), BENCH_SPARSE_N (100k),
BENCH_METRICS_N (250k).  The full-1M versions of these lanes live in
experiments/ and their latest on-chip numbers ride along under
``measured_lanes`` with provenance.
"""

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

import numpy as np

#: partial-result state shared with the __main__ crash wrapper and the
#: dead-man timer: stages fill it in as they complete, so a crash or hang
#: mid-run still emits every number measured up to that point.
_PARTIAL = {}


def _attach_measured(out):
    """Ride the latest full-scale experiment summary along (provenance-
    labeled) so time-budgeted or truncated runs still carry the on-chip
    1M/10M lane numbers from experiments/."""
    here = os.path.dirname(os.path.abspath(__file__))
    for summ in ("summary_r04.json", "summary_r03.json"):
        try:
            with open(os.path.join(here, "experiments", "results",
                                   summ)) as f:
                out["measured_lanes"] = json.load(f)
            break
        except Exception:
            pass


def _emit_partial(reason):
    _PARTIAL.setdefault("error", reason)
    _attach_measured(_PARTIAL)
    print(json.dumps(_PARTIAL), flush=True)

#: assumed pgvector single-core QPS at recall@10 ≈ 0.95 on SIFT-1M — see
#: module docstring for provenance; the reference publishes no numbers.
PG_BASELINE_QPS = 1000.0
#: v5e bf16 MXU peak per chip (public spec: 394 TFLOP/s bf16).  Distance
#: math here runs f32 (~1/2 of bf16 throughput on v5e) — both numbers are
#: reported so the utilization is interpretable either way.
V5E_BF16_PEAK = 394e12


def make_data(n, nq, dim=128, seed=0, dist="clustered"):
    """Workload surrogates (zero-egress image — real SIFT unfetchable).

    - ``clustered`` (default): gaussian mixture with overlapping clusters
      (center scale 1.5 ≈ SIFT-like difficulty: nearest neighbors cross
      cluster boundaries, so recall@10 actually sweeps with ef instead of
      saturating at 1.0).
    - ``uniform``: i.i.d. uniform cube — no cluster structure at all; a
      guard against tuning that exploits the mixture surrogate
      (VERDICT r2 weak #8).
    - ``heavy``: clustered values with lognormal per-row norm scaling —
      heavy-tailed norms stress IP/cosine orderings (hub domination).
    """
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        db = np.empty((n, dim), np.float32)
        chunk = 250_000
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            db[s:e] = rng.random((e - s, dim), dtype=np.float32) * 4.0
        qs = rng.random((nq, dim), dtype=np.float32) * 4.0
        return db, qs
    n_centers = 1024
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32) * 1.5
    db = np.empty((n, dim), np.float32)
    chunk = 250_000  # bound host temp memory at 1M rows
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        assign = rng.integers(0, n_centers, size=e - s)
        db[s:e] = centers[assign] + rng.normal(size=(e - s, dim)).astype(np.float32)
    qa = rng.integers(0, n_centers, size=nq)
    qs = (centers[qa] + rng.normal(size=(nq, dim)).astype(np.float32)).astype(np.float32)
    if dist == "heavy":
        scale = rng.lognormal(0.0, 0.75, size=n).astype(np.float32)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            db[s:e] *= scale[s:e, None]
        qs *= rng.lognormal(0.0, 0.75, size=nq).astype(np.float32)[:, None]
    return db, qs


def main():
    import jax

    # persistent compilation cache — first round pays remote compiles once
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # preflight BEFORE importing pgvector_tpu: on this image the axon TPU
    # backend rides a local relay (ports 8082-8117); if the relay daemon
    # has died, the first device op hangs forever with no error (observed
    # round 3) — and importing the package already runs device ops
    # (module-level jnp constants).  Fail fast with a diagnostic JSON line.
    _platforms = str(getattr(jax.config, "jax_platforms", None) or "")
    if os.environ.get("PALLAS_AXON_POOL_IPS") and "axon" in _platforms:
        import socket

        def _port_open(p):
            s = socket.socket()
            s.settimeout(0.25)
            try:
                s.connect(("127.0.0.1", p))
                return True
            except OSError:
                return False
            finally:
                s.close()

        if not any(_port_open(p) for p in (8082, 8092, 8102, 8112)):
            out = {
                "metric": "hnsw_qps_at_recall095_sift1m_surrogate",
                "value": 0, "unit": "qps", "vs_baseline": 0,
                "error": "axon TPU tunnel relay is down (no listener on "
                         "8082/8092/8102/8112) — device ops would hang; "
                         "restart the terminal/relay and re-run",
            }
            # surface the last committed on-hardware run (clearly labeled
            # as such) so a dead tunnel doesn't erase the measured state
            here = os.path.dirname(os.path.abspath(__file__))
            for prior in ("BENCH_r04_local.json", "BENCH_r03_local.json"):
                try:
                    with open(os.path.join(here, prior)) as f:
                        out["last_measured_on_tpu"] = json.load(f)
                    break
                except Exception:
                    pass
            for summ in ("summary_r04.json", "summary_r03.json"):
                try:
                    with open(os.path.join(here, "experiments", "results",
                                           summ)) as f:
                        out["measured_lanes"] = json.load(f)
                    break
                except Exception:
                    pass
            print(json.dumps(out))
            return

    from pgvector_tpu.index.flat import FlatIndex
    from pgvector_tpu.index.hnsw import HNSWIndex
    from pgvector_tpu.index.ivfflat import IVFFlatIndex
    from pgvector_tpu.ops.metric import Metric
    from pgvector_tpu.store.table import DenseTable
    from pgvector_tpu.utils.telemetry import Progress

    n = int(os.environ.get("BENCH_N", 1_000_000))
    nq = int(os.environ.get("BENCH_Q", 8000))
    batch = int(os.environ.get("BENCH_BATCH", 8000))
    ef_sweep = [int(x) for x in os.environ.get("BENCH_EF", "24,40,64,100").split(",")]
    expand = int(os.environ.get("BENCH_EXPAND", 4))        # build-side beam
    qexpand = int(os.environ.get("BENCH_QEXPAND", 8))     # query-side beam
    run_ivf = os.environ.get("BENCH_IVF", "1") == "1"
    dist = os.environ.get("BENCH_DIST", "clustered")
    k = 10
    m = 16

    # ---- run protection: the driver captures ONE stdout JSON line; that
    # line must materialize even if a lane crashes, the wall budget runs
    # out, or a device op / remote compile hangs (a faulted axon worker
    # hangs the client with no exception — BENCH_NOTES.md "wedge mode").
    t_run0 = time.time()
    budget_s = int(os.environ.get("BENCH_BUDGET_S", 7200))
    _PARTIAL.clear()
    _PARTIAL.update({
        "metric": "hnsw_qps_at_recall095_sift1m_surrogate",
        "value": 0, "unit": "qps", "vs_baseline": 0,
        "stage": "data", "n": n, "backend": jax.default_backend(),
    })

    import threading

    def _deadman():
        _emit_partial(
            f"dead-man timer: no completion after {budget_s + 900}s — a "
            "device op or remote compile hung at stage "
            f"'{_PARTIAL.get('stage')}'; emitting partial results")
        os._exit(3)

    _deadman_t = threading.Timer(budget_s + 900, _deadman)
    _deadman_t.daemon = True
    _deadman_t.start()

    import signal as _signal

    def _on_term(signum, frame):
        # a driver-side timeout SIGTERMs the run — flush what we measured
        _emit_partial(f"terminated by signal {signum} at stage "
                      f"'{_PARTIAL.get('stage')}'")
        os._exit(4)

    try:
        _signal.signal(_signal.SIGTERM, _on_term)
    except Exception:
        pass

    def lane_budget(name, est_s):
        """None when the lane fits the remaining wall budget, else a skip
        record — the lane's JSON field then documents WHY it has no
        numbers, and a driver with a tighter budget truncates tail lanes
        instead of losing the whole run."""
        left = budget_s - (time.time() - t_run0)
        if left < est_s:
            log(f"bench: skip {name} — {left:.0f}s budget left < ~{est_s}s")
            return {"skipped":
                    f"time budget: {left:.0f}s left < est {est_s}s"}
        return None

    log(f"bench: n={n} nq={nq} dist={dist} backend={jax.default_backend()}")
    db, qs = make_data(n, nq, dist=dist)
    table = DenseTable(128, capacity=n)
    table.insert(db)
    log("bench: data loaded")
    _PARTIAL["stage"] = "exact_gt"

    # ground truth (exact, on device).  First pass includes the remote
    # kernel compile (40s–10min of congestion noise on this image); the
    # second pass is the steady capability.
    flat = FlatIndex(table, Metric.L2, tile=16384)
    t0 = time.time()
    _, gt = flat.search(qs, k)
    gt_s = time.time() - t0
    t0 = time.time()
    flat.search(qs, k)
    gt_steady_s = time.time() - t0
    log(f"bench: exact ground truth {gt_s:.1f}s cold / "
        f"{gt_steady_s:.1f}s steady ({flat.last_path})")
    _PARTIAL.update(stage="hnsw_build", exact_gt_s=round(gt_s, 1),
                    exact_gt_steady_s=round(gt_steady_s, 1))

    # build — build() blocks until the graph is materialized, so build_s
    # is honest wall-clock including remote compiles.  Steady state is
    # measured directly: a second, smaller build with every jit variant
    # already warm (same capacity → identical kernel shapes → zero
    # compiles), scaled to n.  (The driver wants both; VERDICT round 1.)
    cap = 1
    while cap < n:
        cap *= 2
    t0 = time.time()
    idx = HNSWIndex(table, Metric.L2, m=m, ef_construction=64,
                    wave_size=1024, dedup=False, beam_expand=expand,
                    capacity=cap)
    build_s = time.time() - t0
    log(f"bench: hnsw build {build_s:.1f}s total (cold, incl. compiles)")
    _PARTIAL.update(stage="steady_build", build_s=round(build_s, 1))
    # The steady-state build doubles as the phase profile: timers +
    # per-phase device syncs attribute search vs connect time honestly
    # (async dispatch otherwise charges device time to whichever phase
    # blocks next — hnsw._insert_wave_fused).  BOTH build phases are
    # data-parallel over a mesh with bit-identical results
    # (wave_search_sharded + connect_level_sharded), so the v5e-8 build
    # projection divides the search AND connect terms by the chip count
    # and keeps only the host terms serial.  It assumes ideal scaling of
    # the device terms (the per-wave all_gathers ride ICI and move
    # (B, ef)/(E, lm) int32 blocks — KBs against the pairwise FLOPs they
    # distribute); the CPU-mesh equality test + dryrun_multichip validate
    # the path itself, one real chip forbids measuring it here.
    from pgvector_tpu.utils.telemetry import timers as _timers

    steady_n = min(int(os.environ.get("BENCH_STEADY_N", 204_800)), n)
    s_table = DenseTable(db.shape[1])
    s_table.insert(db[:steady_n])
    _timers.reset()
    _timers.enabled = True
    os.environ["PGVECTOR_TPU_PHASE_SYNC"] = "1"
    t0 = time.time()
    HNSWIndex(s_table, Metric.L2, m=m, ef_construction=64,
              wave_size=1024, dedup=False, beam_expand=expand, capacity=cap)
    steady_build_s = time.time() - t0
    _timers.enabled = False
    os.environ.pop("PGVECTOR_TPU_PHASE_SYNC", None)
    steady_rate = steady_n / max(steady_build_s, 1e-9)
    build_steady_s = n / steady_rate
    rep = _timers.report()
    search_s = rep.get("hnsw.wave.search", {}).get("total_s", 0.0)
    connect_s = rep.get("hnsw.wave.connect", {}).get("total_s", 0.0)
    build_phases = {k: round(v["total_s"], 1) for k, v in rep.items()
                    if k.startswith("hnsw.")}
    search_frac = min(search_s / max(steady_build_s, 1e-9), 1.0)
    par_frac = min((search_s + connect_s) / max(steady_build_s, 1e-9), 1.0)
    build_proj_8chip_s = round(
        build_steady_s * (1.0 - par_frac + par_frac / 8.0), 1)
    log(f"bench: steady {steady_rate:.0f} rows/s → {build_steady_s:.1f}s at n; "
        f"phases {build_phases} (device-parallel {par_frac:.0%}) → "
        f"8-chip projection {build_proj_8chip_s}s")

    results = []
    idx.beam_expand = qexpand  # query-side beam width (build used expand)
    for ef in ef_sweep:
        idx.search(qs[:batch], k, ef_search=ef)  # warm up/compile
        log(f"bench: ef={ef} compiled")
        dt = float("inf")
        for _trial in range(2):  # best-of-2: tunnel hiccups distort singles
            t0 = time.time()
            got = []
            hops = 0
            q_flops = 0
            for s in range(0, nq, batch):
                bs = min(batch, nq - s)
                _, r = idx.search(qs[s: s + bs], k, ef_search=ef)
                steps = int(idx._last_scan_steps)
                hops += steps
                q_flops += steps * bs * (qexpand * 2 * m) * 128 * 3
                got.append(r)
            dt = min(dt, time.time() - t0)
        r = np.concatenate(got)[:nq]
        hits = sum(
            len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt)
        )
        recall = hits / (nq * k)
        # distance FLOPs: each hop scores (expand × 2m) neighbors × 128-d
        # L2 (3 flops/dim: sub, mul, add) for every query in the batch
        flops = q_flops
        mfu = flops / max(dt, 1e-9) / V5E_BF16_PEAK
        results.append({"ef": ef, "recall_at_10": round(recall, 4),
                        "qps": round(nq / dt, 1),
                        "mfu_vs_bf16_peak": round(mfu, 5),
                        "layer0_hops": hops})

    # headline: best QPS at recall ≥ 0.95 (else the highest-recall point)
    ok = [r for r in results if r["recall_at_10"] >= 0.95]
    head = max(ok, key=lambda r: r["qps"]) if ok else max(
        results, key=lambda r: r["recall_at_10"])
    _PARTIAL.update(
        stage="ivf", value=head["qps"],
        vs_baseline=round(head["qps"] / PG_BASELINE_QPS, 3),
        recall_at_10=head["recall_at_10"], ef_search=head["ef"],
        sweep=results, build_steady_s=round(build_steady_s, 1),
        build_proj_8chip_s=build_proj_8chip_s)

    # Optional lanes from here on: each is wall-budget-gated and crash-
    # isolated (try at one extra half-step keeps lane bodies diff-clean) —
    # a lane-specific OOM or worker fault records an error in that lane's
    # field instead of erasing every lane after it.
    ivf = None
    if run_ivf and not (ivf := lane_budget("ivf", 240)):
      try:
        # release the HNSW scan cache (the packed bf16 neighbor copy is
        # ~8 GB at 1M — holding it while IVF materializes its posting
        # slabs OOMs a 16 GB chip)
        idx._nbr_vals = None
        lists = max(min(n // 1000, 32768), 32)  # README.md:336-342 sizing
        t0 = time.time()
        ividx = IVFFlatIndex(table, Metric.L2, lists=lists, seed=1)
        ivf_build_s = time.time() - t0
        ividx.search(qs[:batch], k, probes=10)  # compile
        t0 = time.time()
        got = []
        for s in range(0, nq, batch):
            _, r = ividx.search(qs[s: s + batch], k, probes=10)
            got.append(r)
        dt = time.time() - t0
        r = np.concatenate(got)[:nq]
        hits = sum(
            len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt)
        )
        ivf = {"lists": lists, "probes": 10,
               "recall_at_10": round(hits / (nq * k), 4),
               "qps": round(nq / dt, 1), "build_s": round(ivf_build_s, 1)}
        log(f"bench: ivf {ivf}")
      except Exception as e:
        log(f"bench: ivf lane failed: {e!r}")
        ivf = {**(ivf or {}), "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="gist", ivf=ivf)

    # GIST-1M-shaped halfvec lane (960-d, bf16 storage) — BASELINE.md's
    # "halfvec fp16 HNSW on GIST-1M with bf16 kernels" target, default-on
    # at a time-budgeted n (BENCH_GIST_N; the full-1M numbers live in
    # experiments/lane_gist1m.py → measured_lanes)
    gist = None
    if (os.environ.get("BENCH_GIST", "1") == "1"
            and not (gist := lane_budget("gist", 900))):
      try:
        import jax.numpy as jnp

        gn = int(os.environ.get("BENCH_GIST_N", 200_000))
        gdb, gqs = make_data(gn, nq, dim=960, seed=7)
        gtab = DenseTable(960, dtype=jnp.bfloat16)
        gtab.insert(gdb)
        _, ggt = FlatIndex(gtab, Metric.L2).search(gqs, k)
        t0 = time.time()
        gidx = HNSWIndex(gtab, Metric.L2, m=m, ef_construction=64,
                         wave_size=1024, dedup=False, beam_expand=expand)
        g_build = time.time() - t0
        gist = {"n": gn, "dim": 960, "dtype": "bfloat16",
                "build_s": round(g_build, 1), "sweep": []}
        for ef in (40, 100):
            gidx.search(gqs[:batch], k, ef_search=ef)
            dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                got = [gidx.search(gqs[s: s + batch], k, ef_search=ef)[1]
                       for s in range(0, nq, batch)]
                dt = min(dt, time.time() - t0)
            r = np.concatenate(got)[:nq]
            hits = sum(len(set(map(int, a)) & set(map(int, e)))
                       for a, e in zip(r, ggt))
            gist["sweep"].append({"ef": ef,
                                  "recall_at_10": round(hits / (nq * k), 4),
                                  "qps": round(nq / dt, 1)})
        pdt_g, sk_g = gidx._packed_plan()
        gist["packed_scan"] = (
            "sketch%d+prune%s" % (sk_g, os.environ.get(
                "PGVECTOR_TPU_SKETCH_PRUNE", "64"))
            if sk_g else jnp.dtype(pdt_g).name if pdt_g else "off")
        gidx._nbr_vals = None
        del gidx, gtab
        log(f"bench: gist {gist}")
      except Exception as e:
        log(f"bench: gist lane failed: {e!r}")
        gist = {**(gist or {}), "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="bit", gist_halfvec=gist)

    # bit/Hamming + binary-quantization re-rank lane — BASELINE.md's
    # "bit/binary-quantized Hamming + re-rank pipeline" (README.md:589-609),
    # default-on at a time-budgeted slice of the main table (BENCH_BIT_N).
    bit_lane = None
    if (os.environ.get("BENCH_BIT", "1") == "1"
            and not (bit_lane := lane_budget("bit", 1500))):
      try:
        from pgvector_tpu.rerank import BinaryQuantizedIndex
        from pgvector_tpu.store.table import BitTable

        idx._nbr_vals = None  # release the ~8 GB packed scan copy

        bn = min(int(os.environ.get("BENCH_BIT_N", 200_000)), n)
        btab = DenseTable(db.shape[1], capacity=bn)
        btab.insert(db[:bn])
        _, bgt = FlatIndex(btab, Metric.L2, tile=16384).search(qs, k)
        bgt = np.asarray(bgt)
        t0 = time.time()
        bq = BinaryQuantizedIndex(btab, Metric.L2, m=m,
                                  ef_construction=64, rerank_factor=4,
                                  wave_size=1024, beam_expand=expand)
        bq_build = time.time() - t0
        bq.index.beam_expand = qexpand
        bq.search(qs[:batch], k, ef_search=40)  # compile
        t0 = time.time()
        got = [bq.search(qs[s: s + batch], k, ef_search=40)[1]
               for s in range(0, nq, batch)]
        dt = time.time() - t0
        r = np.concatenate(got)[:nq]
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(r, bgt))
        # raw Hamming HNSW (no re-rank) for the pure-bit number
        braw = bq.index
        qbits = np.asarray(qs) > 0
        braw.search(qbits[:batch], k, ef_search=40)  # warm this (k, ef)
        # jit variant — the rerank path above compiled k·rerank_factor
        t0 = time.time()
        got = [braw.search(qbits[s: s + batch], k, ef_search=40)[1]
               for s in range(0, nq, batch)]
        dt_raw = time.time() - t0
        bit_lane = {
            "n": bn, "build_s": round(bq_build, 1),
            "bq_rerank": {"recall_at_10_vs_float_gt": round(hits / (nq * k), 4),
                          "qps": round(nq / dt, 1), "ef": 40,
                          "rerank_factor": 4},
            "hamming_raw_qps": round(nq / dt_raw, 1),
        }
        # Jaccard opclass (bit_jaccard_ops): its own graph over the same
        # sign bits, recall vs exact Jaccard ground truth
        braw._nbr_vals = None
        _, jgt = FlatIndex(bq.shadow, Metric.JACCARD).search(qbits, k)
        jidx = HNSWIndex(bq.shadow, Metric.JACCARD, m=m, ef_construction=64,
                         wave_size=1024, dedup=False, beam_expand=expand)
        jidx.beam_expand = qexpand
        jidx.search(qbits[:batch], k, ef_search=40)
        t0 = time.time()
        got = [jidx.search(qbits[s: s + batch], k, ef_search=40)[1]
               for s in range(0, nq, batch)]
        dt = time.time() - t0
        r = np.concatenate(got)[:nq]
        jh = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(r, jgt))
        bit_lane["jaccard"] = {"recall_at_10": round(jh / (nq * k), 4),
                               "qps": round(nq / dt, 1), "ef": 40}
        jidx._nbr_vals = None
        del jidx, btab, bq, braw

        # sign-informative BQ sub-lane (VERDICT r3 #4/#5): the clustered
        # surrogate above puts ~n/1024 rows behind each sign pattern, so
        # BQ-vs-float-GT recall is pool-bounded by construction.  This
        # workload keeps ~25 rows per cluster (between k and
        # rerank_factor·k): the exact-Hamming-top-40 + re-rank oracle is
        # 0.9995 on it, so the pipeline itself must deliver ≥0.9 here.
        sg_n = min(int(os.environ.get("BENCH_BQ_SIGNFUL_N", 200_000)), n)
        sdim_bq, sncl = 512, max(sg_n // 25, 64)
        rng_bq = np.random.default_rng(9)
        s_centers = rng_bq.normal(size=(sncl, sdim_bq)).astype(np.float32) * 1.5
        sdb = np.empty((sg_n, sdim_bq), np.float32)
        for s in range(0, sg_n, 100_000):
            e = min(s + 100_000, sg_n)
            sdb[s:e] = (s_centers[rng_bq.integers(0, sncl, e - s)]
                        + rng_bq.normal(size=(e - s, sdim_bq)).astype(np.float32))
        sqs = (s_centers[rng_bq.integers(0, sncl, nq)]
               + rng_bq.normal(size=(nq, sdim_bq)).astype(np.float32))
        stab_bq = DenseTable(sdim_bq, capacity=sg_n)
        stab_bq.insert(sdb)
        _, sg_gt = FlatIndex(stab_bq, Metric.L2, tile=16384).search(sqs, k)
        sg_gt = np.asarray(sg_gt)
        t0 = time.time()
        sbq = BinaryQuantizedIndex(stab_bq, Metric.L2, m=m,
                                   ef_construction=64, rerank_factor=4,
                                   wave_size=1024, beam_expand=expand)
        sg_build = time.time() - t0
        sbq.index.beam_expand = qexpand
        sbq.search(sqs[:batch], k, ef_search=100)
        t0 = time.time()
        got = [sbq.search(sqs[s: s + batch], k, ef_search=100)[1]
               for s in range(0, nq, batch)]
        dt = time.time() - t0
        r = np.concatenate(got)[:nq]
        sh = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(r, sg_gt))
        bit_lane["bq_signful"] = {
            "n": sg_n, "dim": sdim_bq, "clusters": sncl,
            "build_s": round(sg_build, 1), "ef": 100, "rerank_factor": 4,
            "recall_at_10_vs_float_gt": round(sh / (nq * k), 4),
            "qps": round(nq / dt, 1)}
        sbq.index._nbr_vals = None
        del sbq, stab_bq, sdb
        log(f"bench: bit {bit_lane}")
      except Exception as e:
        log(f"bench: bit lane failed: {e!r}")
        bit_lane = {**(bit_lane or {}),
                    "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="sparse", bit_bq=bit_lane)

    # sparsevec HNSW lane — the sparsevec_ip_ops opclass
    # (README.md:433-447); random sparse rows over a large logical dim,
    # IP ordering.  Default-on: the densified pairwise select made the
    # sparse build driver-budget-friendly (waves of 256+ instead of 16).
    sparse_lane = None
    if (os.environ.get("BENCH_SPARSE", "1") == "1"
            and not (sparse_lane := lane_budget("sparse", 1200))):
      try:
        from pgvector_tpu.store.table import SparseTable
        from pgvector_tpu.types.sparsevec import SparseVec

        idx._nbr_vals = None
        sn = int(os.environ.get("BENCH_SPARSE_N", 100_000))
        sdim, snnz = 4096, 32
        rng = np.random.default_rng(11)
        # distinct sorted indices per row (argpartition of a random key
        # row samples nnz of dim without replacement; the old clip-based
        # nudge could produce duplicate indices at the top of the range,
        # which is invalid sparsevec input)
        s_idx = np.empty((sn + nq, snnz), np.int32)
        chunk = 50_000
        for s in range(0, sn + nq, chunk):
            e = min(s + chunk, sn + nq)
            keys = rng.random((e - s, sdim))
            s_idx[s:e] = np.sort(
                np.argpartition(keys, snnz, axis=1)[:, :snnz], axis=1)
        s_val = rng.normal(size=(sn + nq, snnz)).astype(np.float32)
        s_val[s_val == 0] = 1.0
        stab = SparseTable(sdim, nnz_cap=snnz, capacity=sn)
        stab.insert([SparseVec(sdim, s_idx[i], s_val[i], _checked=True)
                     for i in range(sn)])
        sq = [SparseVec(sdim, s_idx[sn + i], s_val[sn + i], _checked=True)
              for i in range(nq)]
        t0 = time.time()
        _, sgt = FlatIndex(stab, Metric.IP).search(sq, k)
        sgt_s = time.time() - t0
        log(f"bench: sparse gt {sgt_s:.1f}s")
        # bound pairwise transients at 512 MB: the axon remote worker has
        # hard-crashed (wedging the client forever) on larger sparse
        # merge-join/densify temps — round-3 session-6 mitigation, and the
        # r4 default-2GB run wedged 47 min into this lane
        from pgvector_tpu import config as _cfg

        with _cfg.local(**{"hnsw.sparse_pair_bytes": 512 << 20}):
            t0 = time.time()
            sidx = HNSWIndex(stab, Metric.IP, m=m, ef_construction=64,
                             wave_size=1024, dedup=False, beam_expand=expand)
            s_build = time.time() - t0
        log(f"bench: sparse build {s_build:.1f}s")
        sidx.beam_expand = qexpand
        sparse_lane = {"n": sn, "dim": sdim, "nnz": snnz,
                       "build_s": round(s_build, 1),
                       "gt_s": round(sgt_s, 1), "sweep": []}
        for ef in (40, 100):
            sidx.search(sq[:batch], k, ef_search=ef)
            t0 = time.time()
            got = [sidx.search(sq[s: s + batch], k, ef_search=ef)[1]
                   for s in range(0, nq, batch)]
            dt = time.time() - t0
            r = np.concatenate(got)[:nq]
            sh = sum(len(set(map(int, a)) & set(map(int, e)))
                     for a, e in zip(r, sgt))
            sparse_lane["sweep"].append(
                {"ef": ef, "recall_at_10": round(sh / (nq * k), 4),
                 "qps": round(nq / dt, 1)})
        log(f"bench: sparse {sparse_lane}")
      except Exception as e:
        log(f"bench: sparse lane failed: {e!r}")
        sparse_lane = {**(sparse_lane or {}),
                       "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="metric_lanes", sparse=sparse_lane)

    # IP / cosine opclass sweeps (BENCH_METRICS, default both) — each
    # builds its own graph + ground truth at a time-budgeted slice
    # (BENCH_METRICS_N; the 1M versions are in measured_lanes)
    metric_lanes = None
    mlist = [x for x in os.environ.get("BENCH_METRICS", "ip,cosine").split(",") if x]
    if mlist and not (metric_lanes := lane_budget("metrics", 900)):
      try:
        mn = min(int(os.environ.get("BENCH_METRICS_N", 250_000)), n)
        mtab = DenseTable(db.shape[1], capacity=mn)
        mtab.insert(db[:mn])
        metric_lanes = {"n": mn}
        for mname in mlist:
            met = {"ip": Metric.IP, "cosine": Metric.COSINE}[mname]
            fl = FlatIndex(mtab, met)
            t0 = time.time()
            _, mgt = fl.search(qs, k)
            mgt_s = time.time() - t0
            t0 = time.time()
            midx = HNSWIndex(mtab, met, m=m, ef_construction=64,
                             wave_size=1024, dedup=False,
                             beam_expand=expand)
            mbuild = time.time() - t0
            midx.beam_expand = qexpand
            lane = {"build_s": round(mbuild, 1), "gt_s": round(mgt_s, 1),
                    "sweep": []}
            for ef in (40, 100):
                midx.search(qs[:batch], k, ef_search=ef)
                t0 = time.time()
                got = [midx.search(qs[s: s + batch], k, ef_search=ef)[1]
                       for s in range(0, nq, batch)]
                dt = time.time() - t0
                r = np.concatenate(got)[:nq]
                hits = sum(len(set(map(int, a)) & set(map(int, e)))
                           for a, e in zip(r, mgt))
                lane["sweep"].append(
                    {"ef": ef, "recall_at_10": round(hits / (nq * k), 4),
                     "qps": round(nq / dt, 1)})
            metric_lanes[mname] = lane
            midx._nbr_vals = None
            del midx
            log(f"bench: {mname} {lane}")
      except Exception as e:
        log(f"bench: metrics lane failed: {e!r}")
        metric_lanes = {**(metric_lanes or {}),
                        "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="latency", metric_lanes=metric_lanes)

    # serving-latency table (VERDICT r3 #4): p50/p99 per batch size on the
    # headline index at the headline ef; expand=40 is the latency-tuned
    # beam (wider beam → fewer sequential layer-0 hops; at tiny batches a
    # hop costs nearly the same regardless of width)
    latency = None
    if (os.environ.get("BENCH_LATENCY", "1") == "1"
            and not (latency := lane_budget("latency", 600))):
      try:
        latency = []
        reps = int(os.environ.get("BENCH_LATENCY_REPS", 30))
        for lexpand in (qexpand, 40):
            idx.beam_expand = lexpand
            for lbatch in (1, 16, 256):
                idx.search(qs[:lbatch], k, ef_search=head["ef"])  # compile
                lats = []
                for rep in range(reps):
                    s0 = (rep * lbatch) % (nq - lbatch + 1)
                    t0 = time.time()
                    idx.search(qs[s0: s0 + lbatch], k, ef_search=head["ef"])
                    lats.append((time.time() - t0) * 1e3)
                lats.sort()
                latency.append({
                    "expand": lexpand, "batch": lbatch,
                    "p50_ms": round(lats[len(lats) // 2], 2),
                    "p99_ms": round(lats[min(len(lats) - 1,
                                             int(len(lats) * 0.99))], 2),
                    "hops": int(idx._last_scan_steps)})
                log(f"bench: latency {latency[-1]}")
        idx.beam_expand = qexpand
      except Exception as e:
        log(f"bench: latency lane failed: {e!r}")
        latency = {"rows": latency or [],
                   "error": f"{type(e).__name__}: {e}"[:300]}
    _PARTIAL.update(stage="assemble", latency=latency)

    _deadman_t.cancel()
    out = {
        "metric": "hnsw_qps_at_recall095_sift1m_surrogate",
        "value": head["qps"],
        "unit": "qps",
        "vs_baseline": round(head["qps"] / PG_BASELINE_QPS, 3),
        "recall_at_10": head["recall_at_10"],
        "ef_search": head["ef"],
        "mfu_vs_bf16_peak": head["mfu_vs_bf16_peak"],
        "build_s": round(build_s, 1),
        "build_steady_s": round(build_steady_s, 1),
        "build_phases_steady": build_phases,
        "build_search_frac": round(search_frac, 3),
        "build_parallel_frac": round(par_frac, 3),
        "build_proj_8chip_s": build_proj_8chip_s,
        "exact_gt_s": round(gt_s, 1),
        "exact_gt_steady_s": round(gt_steady_s, 1),
        "exact_path": flat.last_path,
        "n": n,
        "beam_expand": expand,
        "query_beam_expand": qexpand,
        "query_batch": batch,
        "dist": dist,
        "sweep": results,
        "ivf": ivf,
        "gist_halfvec": gist,
        "bit_bq": bit_lane,
        "sparse": sparse_lane,
        "metric_lanes": metric_lanes,
        "latency": latency,
        "backend": jax.default_backend(),
    }
    out["wall_s"] = round(time.time() - t_run0, 1)
    # the lanes above run at time-budgeted sizes; the full-scale (1M/10M)
    # versions were measured on the real chip by the experiments/ scripts —
    # surface the latest summary (provenance-labeled) alongside
    _attach_measured(out)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — the driver captures ONE
        # stdout JSON line; even a crash must emit the partial results
        _emit_partial(f"{type(e).__name__}: {e}"[:400])
        sys.exit(2)
