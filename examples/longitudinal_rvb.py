"""BASELINE config 4: 2D TFIM with longitudinal field, RVB updates enabled,
verify-oracle checked (the longitudinal + rvb crash tests as a demo).

Run: python examples/longitudinal_rvb.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from isingmontecarlo_tpu import QmcIsingGraph, lattice

L = 4
edges = lattice.square(L, L, j=1.0)
g = QmcIsingGraph(
    edges, transverse=1.0, longitudinal=0.3, replicas=32, seed=11
)
g.set_run_rvb(True, updates_per_timestep=8)

for step in range(20):
    g.timestep(beta=1.0)
    assert g.verify(), f"worldline integrity broken at step {step}"

energy = g.timesteps(50, beta=1.0)
print("⟨E⟩:", float(np.mean(np.asarray(energy))))
print("RVB success rate:", round(g.rvb_success_rate(), 3))
print("verify:", g.verify())
