#!/usr/bin/env python
"""North-star measurement: energy-ESS/sec on the 32^2 SSE TFIM benchmark
lattice at several replica counts, reported against the measured single-core
denominator (BASELINE.md: ~500 ESS/s -> 100x target = 50k ESS/s).

Methodology matches bench.py's bench_sse: grow the cutoff to steady state,
equilibrate, time fused multi_sweep rounds with a device readback, and
compute ESS from the per-sweep op-count series (integrated autocorrelation
time, summed over independent replicas).

Usage: python scripts/ess32.py [L] [R,R,...] [nsweeps] [cluster_every] [reps]

``reps`` timed rounds of ``nsweeps`` each feed one concatenated series per
replica; aim reps*nsweeps >= 50*tau (tau ~ 2-2.5 at 32^2) so the k-ladder
optimum is not a statistical artifact (round-2 verdict Weak #7).
"""
import os
import sys
import time

import jax

# Persistent compile cache (round-4 image; see bench.py / CLAUDE.md): the
# cold 32^2 R=512 program costs ~15 min of tunnel-side compiles.
if os.environ.get("ISING_NO_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ising")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if os.environ.get("ISING_FORCE_CPU") == "1":
    # For CPU smoke drives (bench.py's _ess32_record test path): the
    # JAX_PLATFORMS env var is ignored in this image (CLAUDE.md), so force
    # the backend programmatically before any use.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.analysis import effective_sample_size
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

DENOM_ESS_PER_SEC = 500.0  # scripts/ref_cpu_bench.sh, BASELINE.md

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R_LIST = (
    tuple(int(r) for r in sys.argv[2].split(","))
    if len(sys.argv) > 2
    else (64, 128, 256, 512)
)
NS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CK = int(sys.argv[4]) if len(sys.argv) > 4 else 1
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 3
# Warm-start cutoff hint: seed the op-string capacity just UNDER the known
# steady-state cutoff so growth converges in ~2 dispatches instead of ~9.
# Each growth dispatch is a fresh XLA compile of a throwaway shape, and the
# round-4 image compiles these 12-25 MB programs on this VM's single core
# (2-8 min each) — the cold growth phase alone busted the round-3 bench
# budget. Physics is unaffected: a larger initial capacity is just identity
# padding, and the timed region runs at the same equilibrated steady state.
_HINTS = {32: 6500, 16: 1700}
HINT = (
    int(sys.argv[6]) if len(sys.argv) > 6
    else int(os.environ.get("ISING_ESS_CUTOFF_HINT", _HINTS.get(L, 0)))
)

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
beta = jnp.float32(1.0)

for R in R_LIST:
    g = QmcIsingGraph(
        edges, transverse=1.0, replicas=R, seed=7, cutoff=HINT or None
    )
    stable = 0
    for _ in range(40):
        g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
        float(jnp.sum(ns))
        before = g.cutoff
        g._maybe_grow()
        stable = stable + 1 if g.cutoff == before else 0
        if stable >= 2:
            break
    # ISING_ESS_CHUNK=c: run the timed region as NS/c host-chunked
    # dispatches of the SAME cap-less c-sweep program the growth phase runs
    # — zero new XLA programs. Escape hatch for the round-4 remote compile
    # helper, which wedges for 30+ min on new 32^2 R=512 program shapes
    # (MEASUREMENTS_r4.md): the chunked rate pays ~28-60 ms tunnel latency
    # per dispatch (honest but ~10-20% pessimistic vs the fused program)
    # and forces cluster_every=1 (the cached program's composition).
    CHUNK = int(os.environ.get("ISING_ESS_CHUNK", "0"))

    def timed_rep(sse):
        if not CHUNK:
            return multi_sweep(
                sse, beta, g.model, NS,
                cluster_caps=g._cluster_caps, cluster_every=CK,
            )
        parts = []
        for _ in range(NS // CHUNK):
            sse, ns_c, _, _ = multi_sweep(sse, beta, g.model, CHUNK)
            parts.append(ns_c)
        return sse, jnp.concatenate(parts, axis=0), None, None

    if CHUNK:
        assert NS % CHUNK == 0, "NS must be a multiple of ISING_ESS_CHUNK"
        print(
            f"(chunked timing: {NS//CHUNK} x {CHUNK}-sweep cached dispatches,"
            f" cluster_every=1)", file=sys.stderr,
        )
    for _ in range(2):
        g.sse, ns, _, _ = timed_rep(g.sse)
        float(jnp.sum(ns))
        g._maybe_grow()
    best = float("inf")
    ns_all = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        g.sse, ns, _, _ = timed_rep(g.sse)
        float(jnp.sum(ns))
        best = min(best, time.perf_counter() - t0)
        ns_all.append(np.asarray(ns))
    series = np.concatenate(ns_all, axis=0)
    ess = effective_sample_size(series)
    ess_rate = ess / (best * len(ns_all))
    print(
        f"R={R:<5} k={1 if CHUNK else CK} cutoff={g.cutoff:<6}"
        f" {R * NS / best:10,.0f} replica-sweeps/s"
        f"  tau={series.size / ess:5.2f}  ESS/s={ess_rate:9.1f}"
        f"  vs_single_core={ess_rate / DENOM_ESS_PER_SEC:7.2f}x"
    )
