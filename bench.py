#!/usr/bin/env python
"""Headline benchmark: classical Ising spin-flip attempts/sec on one chip.

Workload: 256x256 periodic square lattice, ferromagnetic J=-1 (energy
convention of the reference, ``src/classical/graph.rs:430-447``), batched
checkerboard Metropolis sweeps fused under one jit. This is BASELINE.md's
north-star metric: >= 1e10 spin-flip attempts/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "attempts/sec", "vs_baseline": N/1e10}

Extra diagnostics (SSE sweep throughput, device info) go to stderr.

Usage:
  python bench.py            # full benchmark (TPU or CPU)
  python bench.py --smoke    # tiny shapes, seconds on CPU
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _wait_for_tpu(max_wait_s: float) -> bool:
    """Block until the axon TPU tunnel answers a tiny op, up to
    ``max_wait_s`` seconds. The tunnel drops intermittently (CLAUDE.md); if
    the driver lands in such a window, failing fast would lose the round's
    benchmark record entirely. Probing in a subprocess keeps a failed
    backend init from poisoning this process's JAX state. Returns whether
    the probe ever passed — on False the caller MUST force the CPU backend:
    with the tunnel down, axon backend init blocks indefinitely (measured
    in-session: even ``jax.devices()`` hangs for minutes)."""
    probe = (
        "import jax; assert jax.devices()[0].platform == 'tpu'; "
        "import jax.numpy as jnp; "
        "assert float(jnp.sum(jnp.arange(8.0))) == 28.0"
    )
    # Candidate environments, tried in order each cycle. The image has
    # flip-flopped across rounds on whether PYTHONPATH helps or breaks the
    # axon plugin: through round 3 ANY PYTHONPATH broke plugin discovery,
    # but the round-4 image *requires* PYTHONPATH=/root/.axon_site (the
    # plugin lives there; stripping it made every probe fail and cost
    # rounds 2-3 their TPU records). Probe both and adopt whichever works.
    envs = [dict(os.environ)]
    if "PYTHONPATH" in os.environ:
        envs.append({k: v for k, v in os.environ.items() if k != "PYTHONPATH"})
    deadline = time.monotonic() + max_wait_s
    while True:
        ok = False
        for env in envs:
            try:
                ok = (
                    subprocess.run(
                        [sys.executable, "-c", probe],
                        timeout=120,
                        env=env,
                        cwd="/root/repo",
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL,
                    ).returncode
                    == 0
                )
            except subprocess.TimeoutExpired:
                ok = False
            if ok:
                # Make this process's backend init match the winning probe.
                if "PYTHONPATH" in os.environ and "PYTHONPATH" not in env:
                    del os.environ["PYTHONPATH"]
                break
        if ok:
            return True
        if time.monotonic() >= deadline:
            print("bench: TPU probe never passed; forcing CPU", file=sys.stderr)
            return False
        print("bench: waiting for TPU tunnel...", file=sys.stderr)
        time.sleep(30)


# Total wall-clock budget for everything that gates the JSON record. Round 2
# lost its record to rc=124: a 3600 s tunnel wait exceeded the driver's
# capture window (VERDICT.md Weak #1), which is strictly worse than round 1's
# labeled CPU fallback. The budget is sized so that
#   wait (<=600) + classical headline (~3 min) + bounded ess32 (<=900)
# always fits comfortably inside the window round 1 demonstrably had.
_T_START = time.monotonic()
_BUDGET_S = float(os.environ.get("ISING_BENCH_BUDGET", "1500"))


def _remaining_budget() -> float:
    return _BUDGET_S - (time.monotonic() - _T_START)


_TPU_OK = _wait_for_tpu(float(os.environ.get("ISING_BENCH_WAIT", "600")))

import jax  # noqa: E402

# Persistent compilation cache (works on the round-4 image; broken before —
# see CLAUDE.md). Pre-warmed in-session with this exact invocation so the
# driver's end-of-round run compiles nothing: the 32^2 R=512 SSE program
# takes ~15 min of server-side compiles cold, which busted the round-3
# ess32 budget. ISING_NO_CACHE=1 opts out.
if os.environ.get("ISING_NO_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ising")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if not _TPU_OK:
    # Backend init over a dead tunnel hangs forever; a CPU record marked
    # *_cpu_fallback beats no record.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from isingmontecarlo_tpu.classical import metropolis as _metro  # noqa: E402

BASELINE_FLIPS_PER_SEC = 1.0e10


@functools.partial(jax.jit, static_argnames=("nsweeps",))
def _cb_run(spins, key, beta, j, h, nsweeps: int):
    """nsweeps fused checkerboard sweeps; returns final spins + a reduction
    that forces materialization."""

    def body(carry, _):
        spins, key = carry
        key, sub = jax.random.split(key)
        spins = _metro.checkerboard_sweep(spins, sub, beta, j, h)
        return (spins, key), None

    (spins, _), _ = jax.lax.scan(body, (spins, key), None, length=nsweeps)
    return spins, jnp.sum(spins)


def bench_classical(L: int, replicas: int, nsweeps: int, reps: int) -> dict:
    """Marginal throughput: time runs of ``nsweeps`` and ``5*nsweeps`` and
    divide the extra sweeps by the extra time. This removes the constant
    host<->device dispatch latency (tens of ms over the axon tunnel), which
    would otherwise dominate and misstate the on-chip rate; a device-to-host
    scalar read (``float(s)``) forces real completion of each run.

    On TPU with 128-aligned lattices the Pallas multi-sweep kernel is used
    (spins stay in VMEM across all sweeps); otherwise the XLA path."""
    key = jax.random.key(0)
    key, k0 = jax.random.split(key)
    spins = jax.random.bernoulli(k0, 0.5, (replicas, L, L))
    beta = jnp.float32(0.4)
    j = jnp.float32(-1.0)
    h = jnp.float32(0.0)

    use_pallas = jax.devices()[0].platform == "tpu" and L % 128 == 0
    if use_pallas:
        from isingmontecarlo_tpu.ops import checkerboard_multi_sweep

        def run(sp, sd, n):
            out = checkerboard_multi_sweep(sp, sd, beta, j, h, n)
            return out, jnp.sum(out)

    else:

        def run(sp, sd, n):
            return _cb_run(sp, jax.random.key(sd), beta, j, h, n)

    n_small, n_big = nsweeps, 5 * nsweeps

    def timed(n: int) -> float:
        nonlocal spins
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            spins, s = run(spins, jnp.int32(r * 7919 + n), n)
            float(s)  # forces completion through the tunnel
            best = min(best, time.perf_counter() - t0)
        return best

    # Warmup / compile both run lengths.
    for n in (n_small, n_big):
        spins, s = run(spins, jnp.int32(0), n)
        float(s)

    t_small = timed(n_small)
    t_big = timed(n_big)
    dt = max(t_big - t_small, 1e-9)
    attempts = replicas * L * L * (n_big - n_small)
    return {
        "attempts_per_sec": attempts / dt,
        "seconds_small": t_small,
        "seconds_big": t_big,
        "sweeps_per_sec": replicas * (n_big - n_small) / dt,
        "path": "pallas" if use_pallas else "xla",
    }


def bench_sse(
    L: int, replicas: int, nsweeps: int, reps: int, cluster_every: int = 1
) -> dict:
    """Secondary: SSE TFIM sweeps/sec and energy-ESS/sec on the reference's
    LxL benchmark lattice. ESS uses the integrated autocorrelation time of
    the per-sweep energy estimator (op count), summed over independent
    replicas — the same methodology as the single-core denominator
    (scripts/ref_cpu_bench.sh). ``cluster_every=k`` thins the cluster update
    to every k-th timestep (the measured throughput/autocorrelation optimum
    at 32^2 is k~6 at R=512; see scripts/ess32.py sweeps, MEASUREMENTS_r2.md).

    Synchronization: ``jax.block_until_ready`` does NOT synchronize over the
    TPU tunnel in this image (see CLAUDE.md) — every timed round ends with a
    device-to-host readback instead."""
    from isingmontecarlo_tpu import lattice
    from isingmontecarlo_tpu.analysis import effective_sample_size
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

    edges = lattice.bench_two_d_periodic(L)
    # Warm-start cutoff hint just under the known steady state (16^2 R=256:
    # 1808; 32^2: ~6976): growth then converges in ~2 dispatches instead of
    # ~9, and every skipped dispatch is a skipped multi-minute single-core
    # XLA compile of a throwaway shape (see scripts/ess32.py).
    hint = {16: 1700, 32: 6500}.get(L)
    g = QmcIsingGraph(
        edges, transverse=1.0, replicas=replicas, seed=7, cutoff=hint
    )
    beta = jnp.float32(1.0)
    # Grow the cutoff to steady state (short chunks until stable), then
    # equilibrate.
    stable = 0
    for _ in range(40):
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
        float(jnp.sum(ns))
        before = g.cutoff
        g._maybe_grow()
        stable = stable + 1 if g.cutoff == before else 0
        if stable >= 2:
            break
    kw = dict(cluster_caps=g._cluster_caps, cluster_every=cluster_every)
    for _ in range(2):
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, nsweeps, **kw)
        float(jnp.sum(ns))
        g._maybe_grow()
    best = float("inf")
    ns_all = []
    for _ in range(reps):
        t0 = time.perf_counter()
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, nsweeps, **kw)
        float(jnp.sum(ns))
        best = min(best, time.perf_counter() - t0)
        ns_all.append(np.asarray(ns))
    series = np.concatenate(ns_all, axis=0)  # [reps*nsweeps, R]
    ess = effective_sample_size(series)
    return {
        "sse_replica_sweeps_per_sec": replicas * nsweeps / best,
        "sse_energy_ess_per_sec": ess / (best * len(ns_all)),
        "cutoff": g.cutoff,
    }


def bench_suite(json_path: str | None = None) -> None:
    """Reference-workload table mirroring ``benches/end_to_end.rs``:
    per-replica-timestep cost for the crate's benchmark configs (the
    reference reports ns/iter for one sequential timestep; here the cost is
    amortized over the replica batch). Printed to stderr; optionally also
    appended as JSON lines to ``json_path`` for machine comparison across
    rounds."""
    from isingmontecarlo_tpu import lattice
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

    rows = []

    # Warm-start cutoff hints per row (slightly UNDER measured steady-state
    # cutoffs from MEASUREMENTS_r2/r3): growth then converges in ~2
    # dispatches; every skipped growth dispatch is a skipped multi-minute
    # single-core XLA compile of a throwaway shape. Rows without a hint
    # (the small/fast ones) cold-grow as before.
    # Measured: two_d_16 R=256 -> 1808; two_d_32 -> ~6900-6976; rvb_04 ->
    # 1408 (n~821), rvb_06 -> 2656 (n~1672) => n ~ (4.3-4.6) N beta, cutoff
    # ~ 1.6 n. Hints sit at ~70-90% of the estimate: undershoot only costs
    # one extra growth dispatch, overshoot would inflate M permanently.
    hints = {
        "two_d_16": 1700,
        "two_d_heatbath_16": 1700,
        "two_d_rvb_16": 14000,
        # 32^2 rows seeded AT the measured steady state (ess32 pin
        # discovery, MEASUREMENTS_r5.md) so growth reshapes — each a
        # multi-minute remote compile — are skipped entirely.
        "two_d_32": 6944,
        "two_d_heatbath_32": 6944,
        # beta-scaled from measured rvb_04/06 equilibria (n/site/beta ~4.4,
        # cutoff ~1.5n): cold growth from a bare start costs 6-9 reshapes
        # x multi-minute remote compiles per row.
        "two_d_rvb_cold_4": 11000,
        "two_d_rvb_cold_5": 17500,
        "two_d_rvb_cold_6": 24000,
        "two_d_rvb_32": 68000,
        "two_d_rvb_cold_7": 33000,
        "two_d_rvb_cold_8": 43000,
    }

    def retry(fn, *a, tries=4, **k):
        # Big-program compile responses through the remote-compile tunnel
        # get cut mid-stream; the terminal caches the finished compile, so
        # an immediate retry usually lands it (MEASUREMENTS_r5.md).
        for attempt in range(tries):
            try:
                return fn(*a, **k)
            except jax.errors.JaxRuntimeError:
                if attempt == tries - 1:
                    raise
                # Escalating backoff: after a tunnel WORKER crash (vs a cut
                # compile response) the worker needs minutes to restart —
                # 15 s retries all land on the still-down worker and the
                # row is lost (two_d_rvb_32, MEASUREMENTS_r5.md).
                wait = (15, 120, 300)[min(attempt, 2)]
                print(f"  (dispatch failed; retry {attempt + 1} in {wait}s)",
                      file=sys.stderr)
                time.sleep(wait)

    def measure(name, edges, beta, replicas, heatbath=False, rvb=0, warm=8):
        g = QmcIsingGraph(
            edges, transverse=1.0, replicas=replicas, seed=1234,
            cutoff=hints.get(name.split()[0]),
        )
        if heatbath:
            g.set_enable_heatbath(True)
        if rvb:
            g.set_run_rvb(True, updates_per_timestep=rvb)
        kw = dict(
            hb=g._hb_tables if heatbath else None,
            heatbath=heatbath,
            **g._rvb_args(),
        )
        b = jnp.float32(beta)
        # Growth phase first: short chunks until the cutoff stops moving
        # (from a cold start the cutoff grows ~1.5x per dispatch, so a fixed
        # number of fused calls under-equilibrates deep strings, e.g. the
        # beta=100 rvb_cold rows), then the fused warm rounds.
        stable = 0
        # RVB rows grow n slowly (acceptance-limited), so two quiet rounds
        # can be a false plateau — require a longer stable streak there
        # (round-5 suite measured rvb_04 at n~716 vs the true ~821 with the
        # short streak).
        need = 6 if rvb else 2
        for _ in range(60 if rvb else 40):
            g.sse, ns, _, _ = retry(multi_sweep, g.sse, b, g.model, 2, **kw)
            jax.block_until_ready(ns)
            before = g.cutoff
            g._maybe_grow()
            stable = stable + 1 if g.cutoff == before else 0
            if stable >= need:
                break
        for _ in range(2):
            g.sse, ns, _, _ = retry(multi_sweep, g.sse, b, g.model, warm, **kw)
            jax.block_until_ready(ns)
            g._maybe_grow()
        # Re-snapshot per-sweep args after warmup: _maybe_grow has now set
        # the RVB active-slot compaction cutoff (and final cluster caps), so
        # the timed region runs what timesteps_measure would actually run
        # (compact-capped cluster labels included; _rvb_args carries the
        # refreshed cluster_caps).
        kw = dict(
            hb=g._hb_tables if heatbath else None,
            heatbath=heatbath,
            **g._rvb_args(),
        )

        def timed(n):
            t0 = time.perf_counter()
            _, ns, _, _ = retry(multi_sweep, g.sse, b, g.model, n, **kw)
            float(jnp.sum(ns))
            return time.perf_counter() - t0

        timed(2)
        timed(8)
        t1 = min(timed(2) for _ in range(2))
        t2 = min(timed(8) for _ in range(2))
        per = (t2 - t1) / 6 / replicas
        print(
            f"  {name:<28} {per*1e9:12.0f} ns/replica-timestep "
            f"(R={replicas}, cutoff={g.cutoff}, n~{float(jnp.mean(ns[-1])):.0f})",
            file=sys.stderr,
        )
        row = {
            "workload": name.split()[0],
            "ns_per_replica_timestep": per * 1e9,
            "replicas": replicas,
            "cutoff": g.cutoff,
            "mean_n": float(jnp.mean(ns[-1])),
        }
        rows.append(row)
        # Append per row, not at the end: the deepest rows can crash the
        # tunnel worker or outlive a wrapper timeout, and a partial JSONL
        # beats losing the whole table (round-3 suite never completed).
        if json_path:
            with open(json_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    skip = set(
        s for s in os.environ.get("ISING_SUITE_SKIP", "").split(",") if s
    )
    done = set()
    if json_path and os.environ.get("ISING_SUITE_RESUME") == "1":
        # Resume: skip rows already recorded in the JSONL (a wedged remote
        # compile can eat a row's budget silently — see MEASUREMENTS_r5.md;
        # the restart then re-runs only what is missing).
        try:
            with open(json_path) as f:
                done = {json.loads(ln)["workload"] for ln in f if ln.strip()}
        except OSError:
            pass

    def safe(name, *a, **kw):
        if name.split()[0] in skip or name.split()[0] in done:
            print(f"  {name:<28} skipped", file=sys.stderr)
            return
        try:
            measure(name, *a, **kw)
        except Exception as e:
            print(f"  {name:<28} failed: {e}", file=sys.stderr)

    R = 256
    print("reference benchmark workloads (benches/end_to_end.rs):", file=sys.stderr)
    # The reference's RNG-ablation rows (one_d with StdRng / ChaCha,
    # benches/end_to_end.rs:62-94) are intentionally absent: this build has
    # exactly one counter-based RNG (threefry via jax.random), so the
    # ablation has no analog; the one_d row below is the SmallRng workload.
    print(
        "  (rng-ablation rows one_d_{std,chacha}_rng: n/a — single threefry "
        "RNG by design)",
        file=sys.stderr,
    )
    safe("one_d (L=16)", lattice.chain(16), 1.0, R)
    for L in (4, 8, 16):
        safe(f"two_d_{L:02d}", lattice.bench_two_d_periodic(L), 1.0, R)
    safe("one_d_heatbath", lattice.chain(16), 1.0, R, heatbath=True)
    for L in (4, 8, 16):
        safe(
            f"two_d_heatbath_{L:02d}", lattice.bench_two_d_periodic(L), 1.0, R,
            heatbath=True,
        )
    for L in (4, 6, 8, 16):
        n = L * L
        safe(
            f"two_d_rvb_{L:02d} (beta=10)", lattice.bench_two_d_periodic(L),
            10.0, 64 if L < 16 else 16, rvb=(n + 1) // 2, warm=4,
        )
    # Cold RVB (beta=100, benches/end_to_end.rs:336-429): deep op strings,
    # more warm rounds to grow the cutoff to steady state. Replica counts
    # shrink with depth: remote compiles of [cutoff, R] RVB programs wedge
    # past roughly [17k, 64] elements (MEASUREMENTS_r5.md; [17k, 16] and
    # [11k, 64] both compile) — the metric is per-replica, so smaller R
    # trades only batch amortization, not validity.
    for L, R_cold in ((4, 64), (5, 16), (6, 16)):
        n = L * L
        safe(
            f"two_d_rvb_cold_{L} (beta=100)", lattice.bench_two_d_periodic(L),
            100.0, R_cold, rvb=(n + 1) // 2, warm=10,
        )
    # Last: these program sizes intermittently crash the tunnel's TPU worker
    # (see CLAUDE.md); running them last keeps the rest of the table intact.
    safe("two_d_32", lattice.bench_two_d_periodic(32), 1.0, 64)
    safe(
        "two_d_heatbath_32", lattice.bench_two_d_periodic(32), 1.0, 64,
        heatbath=True,
    )
    # The deepest RVB rows (very last — the candidate-restricted fused pass
    # bounds the edge axis at MAX_POPS*degree, but M is still tens of
    # thousands of slots and the tunnel worker may crash; each row is
    # independently `safe`).
    for L, R_rvb, warm in ((7, 8, 10), (8, 8, 10)):
        n = L * L
        safe(
            f"two_d_rvb_cold_{L} (beta=100)", lattice.bench_two_d_periodic(L),
            100.0, R_rvb, rvb=(n + 1) // 2, warm=warm,
        )
    # R=2 crashed the tunnel's TPU worker twice ("kernel fault") — the only
    # suite row ever run at a degenerate 2-lane replica count; R=4 keeps
    # [cutoff, R] at ~272k elements, under the cold_8 shape that compiles.
    safe(
        "two_d_rvb_32 (beta=10)", lattice.bench_two_d_periodic(32),
        10.0, 4, rvb=(32 * 32 + 1) // 2, warm=2,
    )


BASELINE_ESS32_PER_SEC = 500.0  # single-core denominator, BASELINE.md


def _ess32_record(timeout_s: float) -> dict | None:
    """North-star #2 (SSE 32^2 energy-ESS/sec) measured in a subprocess.

    The tunnel's TPU worker intermittently crashes on large SSE programs
    (CLAUDE.md); a crash inside this process would lose the classical
    headline too, so the measurement is isolated. Config (R, nsweeps,
    cluster_every) defaults to the measured throughput/autocorrelation
    optimum and can be overridden with ISING_BENCH_ESS_CFG="R,NS,K[,L]"
    (the optional L shrinks the lattice for CPU smoke drives)."""
    # Default config: the measured k-ladder optimum at the largest replica
    # count whose 32^2 program COMPILES on this image (R=512/256 programs
    # wedge the remote compile helper 30+ min — see MEASUREMENTS_r5.md; the
    # R=64/128 programs compile in ~4-8 min and are pinned + pre-warmed, so
    # the driver's run dispatches a cached program).
    # NS=72 x reps=4 = 288 samples/replica >= 50*tau at the honest
    # long-series tau ~5.1-5.3 (short series truncate the autocorrelation
    # tail and overstate ESS — MEASUREMENTS_r5.md), and the longer fused
    # scan amortizes the ~40-60 ms/dispatch tunnel overhead (+12%
    # throughput over NS=24).
    cfg = [int(x) for x in os.environ.get(
        "ISING_BENCH_ESS_CFG", "128,72,8"
    ).split(",")]
    R, ns, k = cfg[:3]
    L = cfg[3] if len(cfg) > 3 else 32
    # Inherit this process's env verbatim: _wait_for_tpu already mutated
    # os.environ to whatever variant the probe proved works (the round-4
    # image REQUIRES PYTHONPATH=/root/.axon_site for the axon plugin;
    # earlier images required it absent).
    env = dict(os.environ)

    def attempt(k_eff: int, chunk: int, budget: float) -> dict | None:
        if budget < 60:
            return None
        env_a = dict(env)
        if chunk:
            # Legacy cached-program fallback: cap-less growth-program
            # chunking (ISING_ESS_NOPIN disables the pinned path so the
            # dispatched shapes are exactly the cap-less ones).
            env_a["ISING_ESS_CHUNK"] = str(chunk)
            env_a["ISING_ESS_NOPIN"] = "1"
        else:
            # Pinned primary: scripts/ess32.py dispatches ONE program shape
            # (steady-state cutoff + cluster caps from its _PINS table),
            # pre-warmed in-session into the persistent cache. Make sure no
            # inherited env silently switches the mode (ADVICE r4).
            env_a.pop("ISING_ESS_CHUNK", None)
            env_a.pop("ISING_ESS_NOPIN", None)
        try:
            out = subprocess.run(
                [sys.executable, "scripts/ess32.py", str(L), str(R),
                 str(ns), str(k_eff), "4"],
                timeout=budget,
                env=env_a,
                cwd="/root/repo",
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print("bench: ess32 subprocess timed out", file=sys.stderr)
            return None
        print(out.stdout, file=sys.stderr)
        if out.returncode != 0:
            print(f"bench: ess32 failed rc={out.returncode}", file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            return None
        for line in out.stdout.splitlines():
            if "ESS/s=" in line:
                ess = float(line.split("ESS/s=")[1].split()[0])
                return {
                    "sse32_ess_per_sec": ess,
                    "sse32_vs_single_core": ess / BASELINE_ESS32_PER_SEC,
                    "sse32_cfg": {
                        "replicas": R, "nsweeps": ns,
                        "cluster_every": 1 if chunk else k_eff,
                        "chunked": bool(chunk),
                    },
                }
        return None

    t0 = time.monotonic()
    # Reserve ~5 min of the budget for the cached-program fallback: a wedged
    # compile eats whatever it is given, and the fallback needs real time.
    # The pinned primary gets the lion's share — on a fresh VM (cold cache)
    # its ONE program costs ~5-6 min of remote compile incl. retries
    # (MEASUREMENTS_r5.md), and it is the attempt that actually lands.
    rec = attempt(k, 0, max(timeout_s - 300, 240))
    if rec is None:
        # The remote compile helper wedges on NEW 32^2-sized program shapes
        # (MEASUREMENTS_r4.md); the chunked fallback reuses the already-
        # cached cap-less growth program — zero new compiles, ~15%
        # pessimistic, but it lands a real driver-visible ESS number.
        left = timeout_s - (time.monotonic() - t0)
        print("bench: retrying ess32 with cached-program chunking",
              file=sys.stderr)
        rec = attempt(1, 2, min(left, 900))
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes for CI")
    ap.add_argument("--no-sse", action="store_true", help="skip SSE diagnostic")
    ap.add_argument(
        "--suite", action="store_true",
        help="also run the reference benchmark workload table (stderr)",
    )
    ap.add_argument(
        "--suite-json", default=None,
        help="append suite rows as JSON lines to this path",
    )
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    # Headline first: the TPU worker behind the tunnel occasionally crashes
    # on the larger SSE diagnostic programs; the JSON record must already be
    # out by then.
    if args.smoke:
        c = bench_classical(L=64, replicas=8, nsweeps=20, reps=2)
    else:
        c = bench_classical(L=256, replicas=64, nsweeps=100, reps=3)
    print(f"classical: {c}", file=sys.stderr)
    value = c["attempts_per_sec"]
    metric = (
        "classical_256sq_spinflip_attempts_per_sec"
        if not args.smoke
        else "classical_smoke_spinflip_attempts_per_sec"
    )
    if dev.platform != "tpu":
        # The tunnel never came up; record honestly that this is not a
        # chip measurement (the waiter above already gave it ISING_BENCH_WAIT
        # seconds).
        metric += f"_{dev.platform}_fallback"
    record = {
        "metric": metric,
        "value": value,
        "unit": "attempts/sec",
        "vs_baseline": value / BASELINE_FLIPS_PER_SEC,
    }
    # Flush a headline-only record IMMEDIATELY: even if everything after this
    # point hangs or is killed by the driver's capture timeout, the round has
    # a parsed record (round 2 had none — VERDICT.md Weak #1).
    print(json.dumps(record))
    sys.stdout.flush()
    # North star #2 rides the same record (extra keys on one JSON line): the
    # 32^2 SSE ESS/sec vs the 500 ESS/s single-core denominator. Measured in
    # a subprocess (tunnel-worker crashes on big SSE programs must not kill
    # this process) and bounded by the remaining wall-clock budget; if it
    # lands, the ENRICHED record is printed as the final JSON line
    # (duplicate-tolerant: both lines are valid records, the later one is a
    # superset of the earlier).
    if dev.platform == "tpu" and not args.smoke and not args.no_sse:
        ess_budget = min(1200.0, _remaining_budget() - 60.0)
        if ess_budget > 180.0:
            ess = _ess32_record(timeout_s=ess_budget)
            if ess:
                record.update(ess)
                print(json.dumps(record))
                sys.stdout.flush()
        else:
            print("bench: skipping ess32 (budget exhausted)", file=sys.stderr)

    if not args.no_sse and (_remaining_budget() > 180.0 or args.smoke):
        try:
            if args.smoke:
                s = bench_sse(L=4, replicas=32, nsweeps=8, reps=2)
            else:
                s = bench_sse(L=16, replicas=256, nsweeps=16, reps=2)
            print(f"sse: {s}", file=sys.stderr)
        except Exception as e:  # diagnostics must not kill the record
            print(f"sse diagnostic failed: {e}", file=sys.stderr)
        # (The 32^2 ESS north star is measured by _ess32_record before the
        # JSON line above; no duplicate run here.)

    if args.suite or args.suite_json:
        bench_suite(args.suite_json)


if __name__ == "__main__":
    main()
    # Hard-exit: the axon plugin's interpreter-exit teardown can hang for
    # minutes when a TPU subprocess was killed mid-operation (observed
    # 2026-08-21: main() returned, process stuck in a thread join). All
    # output is flushed above; never let cleanup eat the driver's capture
    # window.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
