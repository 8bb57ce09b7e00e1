#!/usr/bin/env python
"""Time the RVB workloads (two_d_rvb_{04,06}, beta=10), A/B-ing the
active-slot compaction path (rvb.rvb_sweep compact_cutoff) against the
full-[M] path. Marginal methodology per CLAUDE.md (two run lengths,
difference quotient, device readbacks).

Usage: python scripts/time_rvb.py [R] [sizes...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
sizes = [int(a) for a in sys.argv[2:]] or [4, 6]

for L in sizes:
    n = L * L
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=R, seed=1234)
    g.set_run_rvb(True, updates_per_timestep=(n + 1) // 2)
    b = jnp.float32(10.0)
    stable = 0
    # Warm up on the FULL path so both variants start from one state.
    kw_full = dict(**g._rvb_args())
    kw_full["rvb_compact"] = None
    for _ in range(60):
        g.sse, ns, _, _ = multi_sweep(g.sse, b, g.model, 2, **kw_full)
        float(jnp.sum(ns))
        before = g.cutoff
        g._maybe_grow()
        stable = stable + 1 if g.cutoff == before else 0
        if stable >= 3:
            break
    kw_full = dict(**g._rvb_args())
    kw_full["rvb_compact"] = None
    kw_compact = dict(**g._rvb_args())
    if kw_compact["rvb_compact"] is None:
        print(f"two_d_rvb_{L:02d}: auto compaction disabled "
              f"(cutoff={g.cutoff}); forcing 0.75*M")
        kw_compact["rvb_compact"] = 16 * ((3 * g.cutoff // 4) // 16)

    def timed(nn, kw):
        t0 = time.perf_counter()
        _, ns, _, _ = multi_sweep(g.sse, b, g.model, nn, **kw)
        float(jnp.sum(ns))
        return time.perf_counter() - t0

    out = {}
    for name, kw in (("full", kw_full), ("compact", kw_compact)):
        timed(2, kw)
        timed(8, kw)
        t1 = min(timed(2, kw) for _ in range(2))
        t2 = min(timed(8, kw) for _ in range(2))
        out[name] = (t2 - t1) / 6
    print(
        f"two_d_rvb_{L:02d}: full {out['full']*1e3:8.1f} ms/timestep | "
        f"compact({kw_compact['rvb_compact']}) {out['compact']*1e3:8.1f} "
        f"ms/timestep (R={R}, cutoff={g.cutoff})"
    )
