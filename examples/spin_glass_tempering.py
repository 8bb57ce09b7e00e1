"""BASELINE config 5: 2D +-J spin glass, 64 replicas, parallel tempering
with device-side replica exchange; shards over every available device.

Run: python examples/spin_glass_tempering.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

import jax
from jax.sharding import Mesh

from isingmontecarlo_tpu import TemperingContainer, lattice

L = 8
rng = np.random.RandomState(0)
# +-J disorder realization.
edges = [((a, b), float(rng.choice([-1.0, 1.0]))) for (a, b), _ in lattice.square(L, L)]

betas = np.geomspace(0.2, 3.0, 16)
tc = TemperingContainer(
    edges, transverse=1.0, betas=betas, replicas_per_beta=4, seed=7
)  # 64 replicas

devs = np.array(jax.devices())
if devs.size > 1:
    tc.shard_over(Mesh(devs, axis_names=("replicas",)))
    print(f"sharded over {devs.size} devices")

tc.timesteps(50)  # equilibrate
states, bet = tc.timesteps_sample(100, swap_freq=2, sampling_freq=10)
print("samples:", states.shape, "swaps:", tc.total_swaps)
ordered, b_sorted = tc.states_by_temperature()
m = np.abs(2.0 * ordered.astype(np.float64) - 1.0).mean(axis=1)
print("verify:", tc.verify())
print("beta ladder:", np.round(b_sorted[:8], 2), "...")
