"""BASELINE config 3: 1D TFIM chain L=64 via SSE, with exact cross-check.

SSE (diagonal + cluster updates, the reference TFIM default,
``qmc_ising.rs:644-795``) on the L=64 periodic transverse-field Ising chain.
The chain maps to free fermions under Jordan-Wigner, so the finite-
temperature energy has a closed form — the QMC estimate is checked against
it: E/L = -(1/L) sum_k eps_k/2 * tanh(beta*eps_k/2), with
eps_k = 2*sqrt(J^2 + G^2 - 2*J*G*cos k) over antiperiodic momenta
(the even-parity sector; corrections are exponentially small at L=64).
Also measures <M^2> from sampled states.

Run: python examples/tfim_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu import QmcIsingGraph, lattice

L, R = 64, 256
beta, gamma = 2.0, 1.0  # critical coupling ratio G/|J| = 1

ks = (2 * np.arange(L) + 1) * np.pi / L  # antiperiodic momenta
eps = 2.0 * np.sqrt(1.0 + gamma**2 - 2.0 * gamma * np.cos(ks))
exact = float(-(eps / 2.0 * np.tanh(beta * eps / 2.0)).sum() / L)

edges = lattice.chain(L, j=-1.0, periodic=True)
g = QmcIsingGraph(edges, transverse=gamma, replicas=R, seed=0)
g.timesteps(100, beta, chunk=25)  # warmup + cutoff growth
states, energy = g.timesteps_sample(400, beta, sampling_freq=4, chunk=50)

e_site = float(jnp.mean(energy)) / L
s = 2.0 * states.astype(np.float64) - 1.0
msq = float((s.sum(axis=-1) ** 2).mean()) / L**2

print(f"L={L} beta={beta} Gamma={gamma}")
print(f"QMC    E/site = {e_site:+.4f}")
print(f"exact  E/site = {exact:+.4f}  (Jordan-Wigner free fermions)")
print(f"<M^2>/L^2     = {msq:.4f}")
print("verify:", g.verify())
assert abs(e_site - exact) < 0.02, (e_site, exact)
