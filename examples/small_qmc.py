"""4-spin ring TFIM quickstart — mirror of ``examples/small_qmc.rs``.

Run: python examples/small_qmc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from isingmontecarlo_tpu import QmcIsingGraph

edges = [((0, 1), -1.0), ((1, 2), 1.0), ((2, 3), 1.0), ((3, 0), 1.0)]
transverse = 1.0

g = QmcIsingGraph.new_with_rng(
    edges, transverse, 0.0, cutoff=3, replicas=64, seed=0
)
energy = g.timesteps(1000, beta=1.0)
print("⟨E⟩ per replica (first 8):", np.asarray(energy)[:8])
print("⟨E⟩ ensemble:", float(np.mean(np.asarray(energy))))
print("verify:", g.verify())
