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

PINNED MODE (the round-5 fix for the rounds-2/3/4 timeouts): on this image
every XLA compile of a 32^2-sized program costs minutes on a single core,
and the classic flow compiles MANY shapes — each growth step reshapes the
op string, and the capped/thinned timed program differs from the growth
program. With the steady-state (cutoff, label_cap, edge_cap) pinned AT or
just above their converged values, the whole row (warmup, equilibration,
timing) dispatches EXACTLY ONE program shape, which an in-session pre-warm
run plants in the persistent compile cache; the driver's end-of-round run
then compiles nothing. Pins come from ``_PINS`` (measured steady states),
``ISING_ESS_PIN="cutoff,lc,ec"``, or are disabled with ``ISING_ESS_NOPIN=1``
(legacy growth mode, which also PRINTS the measured pin for this table).
Physics is unaffected by overshooting the pin: extra capacity is identity
padding and larger label caps only pad the label graph.
"""
import os
import sys
import time

import jax

# Persistent compile cache (round-4 image; see bench.py / CLAUDE.md): the
# cold 32^2 R=512 program costs ~15 min of tunnel-side compiles. NOT on the
# CPU path: cached XLA:CPU AOT code carries machine features this migrating
# VM may lack (SIGILL risk; CLAUDE.md).
if (
    os.environ.get("ISING_NO_CACHE") != "1"
    and os.environ.get("ISING_FORCE_CPU") != "1"
):
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
# Warm-start cutoff hint for the LEGACY growth path: seed capacity just
# UNDER steady state so growth converges in ~2 dispatches instead of ~9.
_HINTS = {32: 6500, 16: 1700}
HINT = (
    int(sys.argv[6]) if len(sys.argv) > 6
    else int(os.environ.get("ISING_ESS_CUTOFF_HINT", _HINTS.get(L, 0)))
)

# Measured steady-state pins (cutoff, label_cap, edge_cap) per (L, R) on
# the reference bench lattice at beta=1, persisted by legacy growth runs to
# .ess32_pins.json (committed, so the driver's end-of-round run reads the
# same pins this session pre-warmed). Cutoffs sit a touch ABOVE the
# converged value: overshoot costs a few % of M, undershoot costs two
# multi-minute recompiles mid-measurement.
import json

_PIN_FILE = os.environ.get(
    "ISING_ESS_PIN_FILE", "/root/repo/.ess32_pins.json"
)


def _load_pins() -> dict:
    try:
        with open(_PIN_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_pin(R, cutoff, lc, ec):
    pins = _load_pins()
    key = f"{L},{R}"
    old = pins.get(key)
    new = [cutoff, lc, ec]
    # Merge upward: a later run observing deeper strings must raise the pin
    # (never silently shrink a pin another session's cache was warmed at).
    if old:
        new = [max(a, b) for a, b in zip(old, new)]
    if new != old:
        pins[key] = new
        with open(_PIN_FILE, "w") as f:
            json.dump(pins, f, indent=1, sort_keys=True)
        print(f"(pin saved: {key} -> {new})", file=sys.stderr)


def _get_pin(R):
    if os.environ.get("ISING_ESS_NOPIN") == "1":
        return None
    env = os.environ.get("ISING_ESS_PIN")
    if env:
        c, lc, ec = (int(x) for x in env.split(","))
        return c, lc, ec
    pin = _load_pins().get(f"{L},{R}")
    return tuple(pin) if pin else None


print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
beta = jnp.float32(1.0)


def retry_dispatch(fn, *args, tries: int = 4, **kw):
    """Retry a jitted dispatch through the flaky remote-compile tunnel.

    Measured on this image (2026-08-21, MEASUREMENTS_r5.md): compiles POST
    to the terminal over the relay, and responses for big programs get cut
    mid-stream (``remote_compile: read body: response body closed``) when
    the compile outlives some proxy timeout — but the TERMINAL keeps a
    staged compile cache, so an immediate retry of the same program usually
    returns the finished executable in seconds-to-minutes. Retrying turns
    a hard failure into a short wait."""
    for attempt in range(tries):
        try:
            return fn(*args, **kw)
        except jax.errors.JaxRuntimeError as e:
            if attempt == tries - 1:
                raise
            print(
                f"(dispatch failed [{type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}]; retry "
                f"{attempt + 1}/{tries - 1} in 15 s)", file=sys.stderr,
            )
            time.sleep(15)

for R in R_LIST:
    pin = _get_pin(R)
    # ISING_ESS_CHUNK=c: dispatch the timed region as NS/c host-chunked
    # c-sweep programs. Pinned mode keeps the caps+thinning in the chunked
    # program (one shape total, incl. warmup). Legacy mode reuses the
    # cap-less growth program (zero new compiles, forces cluster_every=1).
    CHUNK = int(os.environ.get("ISING_ESS_CHUNK", "0"))
    if pin is not None:
        cut_pin, lc_pin, ec_pin = pin
        g = QmcIsingGraph(
            edges, transverse=1.0, replicas=R, seed=7, cutoff=cut_pin
        )
        g._cluster_caps = (lc_pin, ec_pin)
        chunk = CHUNK or NS
        assert NS % chunk == 0 and chunk % CK == 0, (
            "need NS % chunk == 0 and chunk % cluster_every == 0"
        )
        print(
            f"(pinned: cutoff={cut_pin} caps=({lc_pin},{ec_pin}) "
            f"k={CK} chunk={chunk} -> one program shape)", file=sys.stderr,
        )
        # TRACED thinning schedule: the same compiled program serves every
        # k (multi_sweep cluster_flags) — each k is just a different bool
        # input to the one cached program.
        flags = jnp.arange(chunk, dtype=jnp.int32) % CK == CK - 1

        caps_pin = (lc_pin, ec_pin)

        def timed_rep(sse):
            parts = []
            for _ in range(NS // chunk):
                sse, ns_c, _, _ = retry_dispatch(
                    multi_sweep, sse, beta, g.model, chunk,
                    cluster_caps=caps_pin, cluster_flags=flags,
                )
                parts.append(ns_c)
            ns = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            return sse, ns, None, None

        k_report = CK
    else:
        g = QmcIsingGraph(
            edges, transverse=1.0, replicas=R, seed=7, cutoff=HINT or None
        )
        stable = 0
        for _ in range(40):
            g.sse, ns, _, _ = retry_dispatch(
                multi_sweep, g.sse, beta, g.model, 2
            )
            float(jnp.sum(ns))
            before = g.cutoff
            g._maybe_grow()
            stable = stable + 1 if g.cutoff == before else 0
            if stable >= 2:
                break

        def timed_rep(sse):
            if not CHUNK:
                return retry_dispatch(
                    multi_sweep, sse, beta, g.model, NS,
                    cluster_caps=g._cluster_caps, cluster_every=CK,
                )
            parts = []
            for _ in range(NS // CHUNK):
                sse, ns_c, _, _ = retry_dispatch(
                    multi_sweep, sse, beta, g.model, CHUNK
                )
                parts.append(ns_c)
            return sse, jnp.concatenate(parts, axis=0), None, None

        if CHUNK:
            assert NS % CHUNK == 0, "NS must be a multiple of ISING_ESS_CHUNK"
            print(
                f"(chunked timing: {NS//CHUNK} x {CHUNK}-sweep cached "
                f"dispatches, cluster_every=1)", file=sys.stderr,
            )
        k_report = 1 if CHUNK else CK

    # Equilibration (rounds of the SAME program as the timed region in
    # pinned mode; pinned starts COLD at full capacity — no growth loop ran
    # — so it takes extra rounds, each only ~1 s once compiled). Pin sanity:
    # growth past the pin would reshape the program mid-measurement — warn
    # loudly, it means the persisted pin is stale.
    for _ in range(4 if pin is not None else 2):
        g.sse, ns, _, _ = timed_rep(g.sse)
        float(jnp.sum(ns))
        before = g.cutoff
        before_caps = g._cluster_caps
        g._maybe_grow()
        if g.cutoff != before:
            print(
                f"WARNING: cutoff grew {before} -> {g.cutoff} "
                f"{'PAST THE PIN — re-run pin discovery' if pin else '(growth)'}",
                file=sys.stderr,
            )
        if pin is not None and g._cluster_caps != before_caps:
            # The in-jit `fits` cond would SKIP the cluster stage for lanes
            # that outgrow the pinned caps — a silent physics distortion, so
            # shout and invalidate the stale pin.
            print(
                f"WARNING: cluster caps want {g._cluster_caps} past pinned "
                f"{before_caps} — re-run pin discovery", file=sys.stderr,
            )
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
    n_max = int(series.max())
    caps = g._cluster_caps or (0, 0)
    sugg_cut = max(((n_max + n_max // 2 + 15) // 16) * 16 + 64, g.cutoff)
    print(
        f"(steady state: cutoff={g.cutoff} caps=({caps[0]},{caps[1]}) "
        f"n_max={n_max} -> pin ({sugg_cut},{caps[0]},{caps[1]}))",
        file=sys.stderr,
    )
    if pin is None and caps != (0, 0):
        _save_pin(R, sugg_cut, caps[0], caps[1])
    print(
        f"R={R:<5} k={k_report} cutoff={g.cutoff:<6}"
        f" {R * NS / best:10,.0f} replica-sweeps/s"
        f"  tau={series.size / ess:5.2f}  ESS/s={ess_rate:9.1f}"
        f"  vs_single_core={ess_rate / DENOM_ESS_PER_SEC:7.2f}x"
    )
    sys.stdout.flush()
