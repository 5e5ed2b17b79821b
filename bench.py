#!/usr/bin/env python
"""Headline benchmark — SIFT-1M-shaped ANN workload on one TPU chip.

North-star metric (BASELINE.md): SIFT-1M recall@10 vs QPS for an HNSW
ef_search sweep, plus build wall-clock.  SIFT itself can't be fetched
(zero-egress image), so the workload is a deterministic SIFT-shaped
surrogate: N × 128-d vectors drawn from a clustered mixture with
overlapping clusters (SIFT's local structure at comparable difficulty —
the recall sweep must move off 1.0 to be meaningful), 1,000 held-out
queries, exact top-10 ground truth computed on device.

Prints exactly ONE JSON line, HARD-CAPPED at 1,500 bytes:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   compact recall sweep + one-number lane summaries + a pointer to
   experiments/results/bench_full_latest.json with the full detail}

The cap exists because the driver keeps only a ~2k-char TAIL of stdout
and parses the JSON it finds there: rounds 3 and 4 both emitted a valid
line that was 10-20 KB long, so its head fell outside the window and
the driver recorded parsed=null (BENCH_r03/BENCH_r04).

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


def _here():
    return os.path.dirname(os.path.abspath(__file__))


def _attach_measured(out):
    """Point at the latest full-scale experiment summary (provenance-
    labeled) so time-budgeted runs still reference the on-chip 1M/10M
    lane numbers from experiments/.  A POINTER, not the payload: r3/r4
    embedded the multi-KB summary in the stdout line, which is exactly
    what made the line unparseable to the driver's tail window."""
    for summ in ("summary_r05.json", "summary_r04.json", "summary_r03.json"):
        rel = os.path.join("experiments", "results", summ)
        if os.path.exists(os.path.join(_here(), rel)):
            out["measured_lanes_file"] = rel
            break


def _write_detail(out):
    """Write the full result dict to a committed-location detail file and
    return its repo-relative path (None if the write fails)."""
    rel = os.path.join("experiments", "results", "bench_full_latest.json")
    try:
        p = os.path.join(_here(), rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(out, f, indent=1)
        return rel
    except Exception:
        return None


def _sweep_triples(sweep):
    """[[ef, recall@10, qps], ...] — the compact sweep form."""
    out = []
    for r in sweep or []:
        if isinstance(r, dict) and "ef" in r:
            out.append([r.get("ef"), r.get("recall_at_10"), r.get("qps")])
    return out[:6]


def _best_point(lane):
    """Highest-recall [ef, recall, qps] of a lane's sweep (one number per
    lane keeps the driver line under its byte cap)."""
    if not isinstance(lane, dict):
        return None
    sw = [r for r in (lane.get("sweep") or [])
          if isinstance(r, dict) and r.get("recall_at_10") is not None]
    if not sw:
        return {"error": lane["error"][:80]} if lane.get("error") else None
    b = max(sw, key=lambda r: r["recall_at_10"])
    return [b.get("ef"), b.get("recall_at_10"), b.get("qps")]


def _compact_line(out):
    """Build the ≤1,500-byte driver line from a full result dict."""
    line = {}
    for k in ("metric", "value", "unit", "vs_baseline", "recall_at_10",
              "ef_search", "hbm_gbps", "n", "build_s", "build_cached",
              "build_steady_s", "build_proj_8chip_s", "exact_gt_steady_s",
              "backend", "wall_s", "stage", "error"):
        if out.get(k) is not None:
            line[k] = out[k]
    detail = _write_detail(out)
    if detail:
        line["detail_file"] = detail
    if out.get("measured_lanes_file"):
        line["measured_lanes_file"] = out["measured_lanes_file"]
    line["sweep"] = _sweep_triples(out.get("sweep"))
    if out.get("q99"):  # best qps point at recall ≥ 0.99 (BASELINE target)
        line["q99"] = out["q99"]
    ivf = out.get("ivf")
    if isinstance(ivf, dict) and ivf.get("qps") is not None:
        line["ivf"] = [ivf.get("lists"), ivf.get("recall_at_10"),
                       ivf.get("qps"), ivf.get("build_s")]
    for key, src in (("gist", "gist_halfvec"), ("sparse", "sparse")):
        bp = _best_point(out.get(src))
        if bp is not None:
            line[key] = bp
    bit = out.get("bit_bq")
    if isinstance(bit, dict) and (bit.get("bq_rerank") or bit.get("error")):
        bq, jac = bit.get("bq_rerank") or {}, bit.get("jaccard") or {}
        sg = bit.get("bq_signful") or {}
        line["bit"] = ([bq.get("recall_at_10_vs_float_gt"), bq.get("qps"),
                        jac.get("recall_at_10"), jac.get("qps"),
                        sg.get("recall_at_10_vs_float_gt")]
                       if bq else {"error": bit["error"][:80]})
    ml = out.get("metric_lanes")
    if isinstance(ml, dict):
        for mname in ("ip", "cosine"):
            bp = _best_point(ml.get(mname))
            if bp is not None:
                line[mname] = bp
    lat = out.get("latency")
    if isinstance(lat, list) and lat:
        b1 = [r for r in lat if r.get("batch") == 1]
        if b1:
            b1 = min(b1, key=lambda r: r["p50_ms"])
            line["lat_b1_ms"] = [b1["p50_ms"], b1["p99_ms"]]
    # enforce the byte cap: drop optional context keys, least-vital first
    drop = ["measured_lanes_file", "lat_b1_ms", "cosine", "ip", "bit",
            "gist", "sparse", "ivf", "q99", "sweep", "stage",
            "exact_gt_steady_s", "build_steady_s", "detail_file"]
    s = json.dumps(line, separators=(",", ":"))
    while len(s.encode()) > 1500 and drop:
        line.pop(drop.pop(0), None)
        s = json.dumps(line, separators=(",", ":"))
    if len(s.encode()) > 1500 and "error" in line:  # last resort
        line["error"] = line["error"][:200]
        s = json.dumps(line, separators=(",", ":"))
    return s


def _emit_partial(reason):
    _PARTIAL.setdefault("error", reason)
    _attach_measured(_PARTIAL)
    print(_compact_line(_PARTIAL), flush=True)

#: assumed pgvector single-core QPS at recall@10 ≈ 0.95 on SIFT-1M — see
#: module docstring for provenance; the reference publishes no numbers.
PG_BASELINE_QPS = 1000.0
#: v5e HBM bandwidth per chip (public spec: 819 GB/s).  The HNSW scan is
#: gather-bound, not FLOP-bound, so the honest roofline is achieved HBM
#: bytes/s (neighbor-slab gathers per hop), not MXU utilization — the MFU
#: this used to report (~3e-05) said nothing (VERDICT r4 weak #7).
V5E_HBM_BPS = 819e9


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
            # point at the last committed on-hardware numbers so a dead
            # tunnel doesn't erase the measured state
            _attach_measured(out)
            print(_compact_line(out))
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
    ef_sweep = [int(x) for x in os.environ.get("BENCH_EF", "24,40,64,80,100").split(",")]
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
    # Default budget 2400 s: round 4's 7200 s default outran the driver's
    # wall cap (BENCH_r04 rc=124 — SIGTERM'd mid-campaign); round 3's run
    # completed, so the survivable wall is somewhere above its ~1,500 s.
    # The graph cache below makes a warm full-matrix run fit comfortably.
    t_run0 = time.time()
    budget_s = int(os.environ.get("BENCH_BUDGET_S", 2700))
    _PARTIAL.clear()
    _PARTIAL.update({
        "metric": "hnsw_qps_at_recall095_sift1m_surrogate",
        "value": 0, "unit": "qps", "vs_baseline": 0,
        "stage": "data", "n": n, "backend": jax.default_backend(),
    })

    import threading

    def _deadman():
        _emit_partial(
            f"dead-man timer: no completion after {budget_s + 600}s — a "
            "device op or remote compile hung at stage "
            f"'{_PARTIAL.get('stage')}'; emitting partial results")
        os._exit(3)

    _deadman_t = threading.Timer(budget_s + 600, _deadman)
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
    # Graph cache: the same deterministic workload builds the same graph,
    # so a prior run's checkpoint (this session's campaign, or an earlier
    # driver run) stands in for the 700 s 1M rebuild — the reference's
    # "the index IS the checkpoint" stance (SURVEY §5).  The measured cold
    # build_s rides along from the cache sidecar; BENCH_REBUILD=1 forces a
    # fresh build.
    from pgvector_tpu.io import checkpoint as ckpt

    cache_dir = os.path.join(
        _here(), ".bench_cache",
        f"hnsw_n{n}_{dist}_m{m}_efc64_exp{expand}_w1024")
    side = os.path.join(cache_dir, "bench_meta.json")
    idx = None
    build_cached = False
    build_s = None
    if (os.environ.get("BENCH_REBUILD", "0") != "1"
            and os.path.exists(side)):
        try:
            with open(side) as f:
                meta = json.load(f)
            t0 = time.time()
            idx = ckpt.load_hnsw(table, cache_dir)
            load_s = time.time() - t0
            build_s = meta["build_s"]
            build_cached = True
            log(f"bench: hnsw graph loaded from cache in {load_s:.1f}s "
                f"(original build {build_s:.1f}s)")
        except Exception as e:
            log(f"bench: graph cache load failed ({e!r}) — rebuilding")
            idx = None
    if idx is None:
        t0 = time.time()
        idx = HNSWIndex(table, Metric.L2, m=m, ef_construction=64,
                        wave_size=1024, dedup=False, beam_expand=expand,
                        capacity=cap)
        build_s = time.time() - t0
        log(f"bench: hnsw build {build_s:.1f}s total (cold, incl. compiles)")
        try:
            ckpt.save_hnsw(idx, cache_dir)
            with open(side, "w") as f:
                json.dump({"build_s": round(build_s, 1), "n": n}, f)
        except Exception as e:
            log(f"bench: graph cache save failed ({e!r})")
    _PARTIAL.update(stage="steady_build", build_s=round(build_s, 1),
                    build_cached=build_cached)
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

    steady = None
    if build_cached:
        try:
            with open(side) as f:
                steady = json.load(f).get("steady") or None
        except Exception:
            steady = None
    if steady is None:
        steady_n = min(int(os.environ.get("BENCH_STEADY_N", 204_800)), n)
        s_table = DenseTable(db.shape[1])
        s_table.insert(db[:steady_n])
        _timers.reset()
        _timers.enabled = True
        os.environ["PGVECTOR_TPU_PHASE_SYNC"] = "1"
        t0 = time.time()
        HNSWIndex(s_table, Metric.L2, m=m, ef_construction=64,
                  wave_size=1024, dedup=False, beam_expand=expand,
                  capacity=cap)
        steady_build_s = time.time() - t0
        _timers.enabled = False
        os.environ.pop("PGVECTOR_TPU_PHASE_SYNC", None)
        rep = _timers.report()
        steady = {
            "steady_n": steady_n,
            "steady_build_s": round(steady_build_s, 2),
            "search_s": round(
                rep.get("hnsw.wave.search", {}).get("total_s", 0.0), 2),
            "connect_s": round(
                rep.get("hnsw.wave.connect", {}).get("total_s", 0.0), 2),
            "phases": {k: round(v["total_s"], 1) for k, v in rep.items()
                       if k.startswith("hnsw.")},
        }
        try:  # persist alongside the graph so cached runs skip this too
            with open(side) as f:
                meta = json.load(f)
            meta["steady"] = steady
            with open(side, "w") as f:
                json.dump(meta, f)
        except Exception:
            pass
    steady_rate = steady["steady_n"] / max(steady["steady_build_s"], 1e-9)
    build_steady_s = n / steady_rate
    search_s, connect_s = steady["search_s"], steady["connect_s"]
    build_phases = steady["phases"]
    search_frac = min(search_s / max(steady["steady_build_s"], 1e-9), 1.0)
    par_frac = min((search_s + connect_s)
                   / max(steady["steady_build_s"], 1e-9), 1.0)
    # 8-chip projection as a RANGE (VERDICT r4 weak #6): the optimistic
    # bound assumes zero collective overhead; the conservative bound
    # applies the collective fraction measured on the virtual mesh by
    # experiments/lane_mesh_overhead.py (committed JSON), which times the
    # sharded build phases with and without their all_gathers.
    proj_opt = build_steady_s * (1.0 - par_frac + par_frac / 8.0)
    coll_frac = 0.0
    try:
        with open(os.path.join(_here(), "experiments", "results",
                               "mesh_overhead.json")) as f:
            coll_frac = float(json.load(f)["collective_frac"])
    except Exception:
        pass
    proj_cons = build_steady_s * (
        1.0 - par_frac + par_frac / (8.0 * max(1.0 - coll_frac, 0.1)))
    build_proj_8chip_s = [round(proj_opt, 1), round(proj_cons, 1)]
    log(f"bench: steady {steady_rate:.0f} rows/s → {build_steady_s:.1f}s at n; "
        f"phases {build_phases} (device-parallel {par_frac:.0%}) → "
        f"8-chip projection {build_proj_8chip_s}s")

    # bytes one layer-0 hop moves per query: the packed scan gathers
    # ``expand`` contiguous neighbor slabs of (2m, D') each; add the exact
    # f32 re-rank gather amortized over hops.  This is the numerator of the
    # achieved-HBM-bandwidth roofline (V5E_HBM_BPS is the denominator) —
    # the honest "is the scan actually fast" metric for a gather-bound
    # workload across dims/dtypes.
    import jax.numpy as jnp_

    pdt, sk = idx._packed_plan()
    d_eff = sk if sk else db.shape[1]
    elem_bytes = jnp_.dtype(pdt).itemsize if pdt else 4
    hop_bytes_per_q = qexpand * 2 * m * d_eff * elem_bytes

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
            q_bytes = 0
            for s in range(0, nq, batch):
                bs = min(batch, nq - s)
                _, r = idx.search(qs[s: s + bs], k, ef_search=ef)
                steps = int(idx._last_scan_steps)
                hops += steps
                q_bytes += steps * bs * hop_bytes_per_q
                got.append(r)
            dt = min(dt, time.time() - t0)
        r = np.concatenate(got)[:nq]
        hits = sum(
            len(set(map(int, a)) & set(map(int, e))) for a, e in zip(r, gt)
        )
        recall = hits / (nq * k)
        gbps = q_bytes / max(dt, 1e-9) / 1e9
        results.append({"ef": ef, "recall_at_10": round(recall, 4),
                        "qps": round(nq / dt, 1),
                        "hbm_gbps": round(gbps, 1),
                        "hbm_frac": round(gbps * 1e9 / V5E_HBM_BPS, 3),
                        "layer0_hops": hops})

    # headline: best QPS at recall ≥ 0.95 (else the highest-recall point);
    # q99 = best QPS at recall ≥ 0.99, the reference's own quality bar
    # (test/t/012:94) and the level BASELINE.md's ≥10× target is judged at
    ok = [r for r in results if r["recall_at_10"] >= 0.95]
    head = max(ok, key=lambda r: r["qps"]) if ok else max(
        results, key=lambda r: r["recall_at_10"])
    ok99 = [r for r in results if r["recall_at_10"] >= 0.99]
    q99 = max(ok99, key=lambda r: r["qps"]) if ok99 else None
    _PARTIAL.update(
        stage="ivf", value=head["qps"],
        vs_baseline=round(head["qps"] / PG_BASELINE_QPS, 3),
        recall_at_10=head["recall_at_10"], ef_search=head["ef"],
        hbm_gbps=head["hbm_gbps"],
        q99=[q99["ef"], q99["recall_at_10"], q99["qps"]] if q99 else None,
        sweep=results, build_steady_s=round(build_steady_s, 1),
        build_proj_8chip_s=build_proj_8chip_s)

    # Optional lanes from here on: each is wall-budget-gated and crash-
    # isolated (try at one extra half-step keeps lane bodies diff-clean) —
    # a lane-specific OOM or worker fault records an error in that lane's
    # field instead of erasing every lane after it.
    # serving-latency table (VERDICT r3 #4): p50/p99 per batch size on the
    # headline index at the headline ef; expand=40 is the latency-tuned
    # beam (wider beam → fewer sequential layer-0 hops; at tiny batches a
    # hop costs nearly the same regardless of width).  Runs FIRST among the
    # optional lanes, straight off the headline sweep: the packed scan
    # cache is already materialized there, so this lane allocates nothing —
    # running it after IVF instead re-materialized the ~8 GB cache while
    # the IVF posting slabs were still alive and OOM'd the 16 GB chip
    # (observed in the round-5 rehearsal run).
    latency = None
    if (os.environ.get("BENCH_LATENCY", "1") == "1"
            and not (latency := lane_budget("latency", 260))):
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
    _PARTIAL.update(stage="ivf", latency=latency)

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
        # free the posting slabs before the big-table lanes below
        del ividx
      except Exception as e:
        log(f"bench: ivf lane failed: {e!r}")
        ivf = {**(ivf or {}), "error": f"{type(e).__name__}: {e}"[:300]}
        ividx = None
    _PARTIAL.update(stage="gist", ivf=ivf)

    # GIST-1M-shaped halfvec lane (960-d, bf16 storage) — BASELINE.md's
    # "halfvec fp16 HNSW on GIST-1M with bf16 kernels" target, default-on
    # at a time-budgeted n (BENCH_GIST_N; the full-1M numbers live in
    # experiments/lane_gist1m.py → measured_lanes)
    gist = None
    if (os.environ.get("BENCH_GIST", "1") == "1"
            and not (gist := lane_budget("gist", 520))):
     # one retry: the rehearsal run lost this lane to a transient tunnel
     # fault ("remote_compile: HTTP 500: tpu_compile_helper exit 1") that a
     # fresh attempt would have cleared
     for _gist_attempt in (1, 2):
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
        break
      except Exception as e:
        log(f"bench: gist lane failed (attempt {_gist_attempt}): {e!r}")
        gist = {**{k_: v_ for k_, v_ in (gist or {}).items()
                   if k_ != "error"},
                "error": f"{type(e).__name__}: {e}"[:300]}
        # drop the lane's device arrays (a failed compile can leave an
        # ~8 GB packed cache referenced from this frame, OOMing later lanes)
        gidx = gtab = gdb = ggt = None
        if lane_budget("gist-retry", 520):
            break
    _PARTIAL.update(stage="bit", gist_halfvec=gist)

    # bit/Hamming + binary-quantization re-rank lane — BASELINE.md's
    # "bit/binary-quantized Hamming + re-rank pipeline" (README.md:589-609),
    # default-on at a time-budgeted slice of the main table (BENCH_BIT_N).
    bit_lane = None
    if (os.environ.get("BENCH_BIT", "1") == "1"
            and not (bit_lane := lane_budget("bit", 720))):
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
            and not (sparse_lane := lane_budget("sparse", 700))):
      try:
        from pgvector_tpu.store.table import SparseTable
        from pgvector_tpu.types.sparsevec import SparseVec

        idx._nbr_vals = None
        # 16k default, not 100k: the 512 MB sparse pairwise bound clamps
        # 4096-d builds to 64-row waves (cap = bound // (C·dim·8)), and
        # the ~1.6 s fixed per-wave cost then bounds build throughput at
        # ~40 rows/s — 16k ≈ 7 min, 100k ≈ 42 min (measured round-5; the
        # old estimate never survived contact because every prior run
        # budget-skipped or wedged before measuring the build)
        sn = int(os.environ.get("BENCH_SPARSE_N", 16_384))
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
        sidx = stab = None
    _PARTIAL.update(stage="metric_lanes", sparse=sparse_lane)

    # IP / cosine opclass sweeps (BENCH_METRICS, default both) — each
    # builds its own graph + ground truth at a time-budgeted slice
    # (BENCH_METRICS_N; the 1M versions are in measured_lanes)
    metric_lanes = None
    mlist = [x for x in os.environ.get("BENCH_METRICS", "ip,cosine").split(",") if x]
    if mlist and not (metric_lanes := lane_budget("metrics", 420)):
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


    _deadman_t.cancel()
    out = {
        "metric": "hnsw_qps_at_recall095_sift1m_surrogate",
        "value": head["qps"],
        "unit": "qps",
        "vs_baseline": round(head["qps"] / PG_BASELINE_QPS, 3),
        "recall_at_10": head["recall_at_10"],
        "ef_search": head["ef"],
        "hbm_gbps": head["hbm_gbps"],
        "q99": [q99["ef"], q99["recall_at_10"], q99["qps"]] if q99 else None,
        "build_s": round(build_s, 1),
        "build_cached": build_cached,
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
    # point at the latest summary (provenance-labeled) alongside
    _attach_measured(out)
    print(_compact_line(out))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — the driver captures ONE
        # stdout JSON line; even a crash must emit the partial results
        _emit_partial(f"{type(e).__name__}: {e}"[:400])
        sys.exit(2)
