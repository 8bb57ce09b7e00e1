"""24x24 periodic TFIM soak — mirror of ``examples/crash_check.rs``.

Run: python examples/crash_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from isingmontecarlo_tpu import QmcIsingGraph, lattice

side_len = 24
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
edges = lattice.square(side_len, side_len, j=1.0)

g = QmcIsingGraph(
    edges, transverse=1.0, cutoff=side_len * side_len, replicas=8, seed=0
)
states, energy = g.timesteps_sample(steps, beta=1.0)
print("sampled states:", states.shape)
print("⟨E⟩ ensemble:", float(np.mean(np.asarray(energy))))
print("verify:", g.verify())
