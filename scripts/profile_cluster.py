#!/usr/bin/env python
"""Fine-grained cluster-path breakdown on the 32^2 BENCH lattice at
production caps — the data for deciding the sort-kernel work: how much of
the sweep is XLA lax.sort at the exact shapes, vs gathers, scans and
einsums. Marginal methodology per CLAUDE.md. Usage:
python scripts/profile_cluster.py [L] [R]
"""
import os
import sys
import time

import jax

if os.environ.get("ISING_FORCE_CPU") == "1":
    # CPU smoke drives: JAX_PLATFORMS is ignored in this image (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep, sweep

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 256

print(f"device: {jax.devices()[0]}", file=sys.stderr)
edges = lattice.bench_two_d_periodic(L)
# Steady-state pin (scripts/ess32.py discovery runs persist it): construct
# at the converged cutoff/caps so this profile compiles only the already-
# cached growth program plus its component probes (each cold growth shape
# costs minutes on this image's single core).
import json

try:
    with open("/root/repo/.ess32_pins.json") as _f:
        _pin = json.load(_f).get(f"{L},{R}")
except (OSError, ValueError):
    _pin = None
g = QmcIsingGraph(
    edges, transverse=1.0, replicas=R, seed=7,
    cutoff=_pin[0] if _pin else None,
)
if _pin:
    g._cluster_caps = (_pin[1], _pin[2])
beta = jnp.float32(1.0)
stable = 0
for i in range(60 if _pin else 40):
    g.sse, ns, _, _ = multi_sweep(g.sse, beta, g.model, 2)
    float(jnp.sum(ns))
    before = g.cutoff
    g._maybe_grow()
    if _pin:
        # Pinned: no growth expected; loop on for equilibration only.
        continue
    stable = stable + 1 if g.cutoff == before else 0
    if stable >= 2:
        break
if _pin:
    g._cluster_caps = tuple(_pin[1:])  # keep the pinned (cached) cap shape
print(f"cutoff={g.cutoff} caps={g._cluster_caps}", file=sys.stderr)

sse, model = g.sse, g.model
ops0, state0 = sse.ops, sse.state
lc, ec = g._cluster_caps
M = ops0.bond.shape[0]
K = ops0.max_legs
KM = K * M


def marginal(name, body, n1=2, n2=6):
    def mk(n):
        @jax.jit
        def run(r):
            def step(c, i):
                return body(c, i + r).astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return out
        return lambda r: run(jnp.int32(r * 131))

    f1, f2 = mk(n1), mk(n2)
    float(f1(0)), float(f2(0))
    float(f1(1)), float(f2(1))

    def best(f):
        b = 1e9
        for r in range(2, 6):
            t0 = time.perf_counter()
            float(f(r))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(f2) - best(f1)) / (n2 - n1)
    print(f"{name:<40} {per*1e3:9.3f} ms", flush=True)
    return per


# --- bare XLA sorts at the exact shapes -------------------------------------
def sort_row(rows, n_payload, tag):
    key0 = jax.random.randint(jax.random.key(0), (rows, R), 0, 1 << 24)

    def body2(c, i):
        k = key0 ^ i
        ops = (k,) + tuple(k + j for j in range(n_payload))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return c + jnp.float32(jnp.sum(out[0][0]))

    marginal(f"lax.sort [{rows},{R}] +{n_payload}pay ({tag})", body2)


sort_row(KM, 2, "leg/back sort shape")
sort_row(lc + ec, 1, "fixpoint scatter-min shape")
sort_row(lc + ec, 0, "same, key-only")

# --- segment_graph internals -------------------------------------------------
marginal("segment_graph", lambda c, i: c + jnp.sum(
    _cluster.segment_graph(ops0._replace(bond=ops0.bond + (i >> 30)), model).u
))


def _sg_legsort(c, i):
    ops = ops0._replace(bond=ops0.bond + (i >> 30))
    valid_op = ops.bond >= 0
    b = jnp.maximum(ops.bond, 0)
    bv = model.bond_vars[b]
    vars_kmr = jnp.where(valid_op[None], jnp.moveaxis(bv, -1, 0), -1)
    leg_var = vars_kmr.reshape(KM, R)
    p_of_f = jnp.arange(KM, dtype=jnp.int32) % M
    key = jnp.where(leg_var >= 0, leg_var * M + p_of_f[:, None],
                    jnp.int32(2**30))
    iota_f = jnp.broadcast_to(jnp.arange(KM, dtype=jnp.int32)[:, None],
                              (KM, R))
    is_edge = model.is_constant[b] & valid_op
    edge_leg = jnp.broadcast_to(is_edge[None], (K, M, R)).reshape(KM, R)
    skey, order, edge_s = jax.lax.sort(
        (key, iota_f, edge_leg.astype(jnp.int32)), dimension=0, num_keys=1
    )
    return c + jnp.sum(skey) + jnp.sum(order) + jnp.sum(edge_s)


marginal("  leg sort alone", _sg_legsort)

# --- capped fixpoint + pieces ------------------------------------------------
sg = _cluster.segment_graph(ops0, model)
dump = sg.S - 1
is_edge = sg.u != dump
_, us, vs = jax.lax.sort(
    ((~is_edge).astype(jnp.int32), sg.u, sg.v), dimension=0, num_keys=1
)
CE = ec
uc = jnp.minimum(us[:CE], lc - 1)
vc = jnp.minimum(vs[:CE], lc - 1)

marginal("capped hook fixpoint", lambda c, i: c + jnp.sum(
    _cluster._hook_compress_labels(uc ^ (i >> 30), vc, lc)
))

P0 = jnp.tile(jnp.arange(lc, dtype=jnp.int32)[:, None], (1, R))
marginal("  one scatter_min_rows", lambda c, i: c + jnp.sum(
    _cluster._scatter_min_rows(P0, jnp.maximum(uc ^ (i >> 30), 0), vc)
))
marginal("  one take kernel gather [CE]", lambda c, i: c + jnp.sum(
    _cluster._take0_fast(P0, jnp.maximum(uc ^ (i >> 30), 0))
))

# --- root-stats variants at production shapes ---------------------------------
logr0 = jax.random.normal(jax.random.key(1), (M, R)) * 0.1
froz0 = jax.random.bernoulli(jax.random.key(2), 0.05, (M, R))
idx0 = jax.random.randint(jax.random.key(3), (M, R), 0, lc)
rows_m = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (M, R))


def _rs(fn):
    return lambda c, i: c + jnp.sum(
        fn(logr0, froz0, jnp.minimum(idx0 ^ (i >> 30), lc - 1), lc)[0]
    )


marginal("root-stats mm (einsum)", _rs(_cluster._mm_root_stats))
marginal(
    "root-stats scatter",
    _rs(
        lambda lg, fz, ix, SL: (
            jnp.zeros((SL, R), jnp.float32).at[ix, rows_m].add(lg),
            jnp.zeros((SL, R), bool).at[ix, rows_m].max(fz),
        )
    ),
)

# --- decisions + flips (cluster_update minus labels) -------------------------
marginal("cluster_update total", lambda c, i: c + jnp.sum(
    _cluster.cluster_update(
        ops0._replace(bond=ops0.bond + (i >> 30)), state0,
        jax.random.key(i), model, label_cap=lc, edge_cap=ec,
    )[1]
))

# The sweep bodies must depend on ``i`` through the OPS (bond + (i >> 30)),
# not just the RNG key: with constant ops XLA hoists the ops-derived work
# (weight tables, segment build) out of the scan and the row undercounts —
# the round-5 R=64 profile's 1.05/1.12 ms "sweeps" were this artifact.
marginal("diag-only sweep", lambda c, i: c + jnp.sum(sweep(
    sse._replace(
        ops=ops0._replace(bond=ops0.bond + (i >> 30)),
        key=jax.random.key(i),
    ), beta, model,
    cluster_caps=(lc, ec), do_cluster=False,
)[0].ops.bond))

marginal("full sweep", lambda c, i: c + jnp.sum(sweep(
    sse._replace(
        ops=ops0._replace(bond=ops0.bond + (i >> 30)),
        key=jax.random.key(i),
    ), beta, model, cluster_caps=(lc, ec),
)[0].ops.bond))
print(f"done cutoff={g.cutoff} caps={g._cluster_caps}")
