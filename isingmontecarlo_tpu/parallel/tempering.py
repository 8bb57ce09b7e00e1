"""Parallel tempering — reference ``src/sse/parallel_tempering/``.

The reference holds ``Vec<(QmcGraph, beta)>`` replicas and swaps *pointers*
between neighbors with acceptance ``(beta_a/beta_b)^(n_b - n_a) * W_rel``
(``tempering_container.rs:274-302``), alternating even/odd neighbor pairs,
optionally running replicas on rayon threads (``:315-478``).

TPU-native redesign (SURVEY.md sections 2 and 5): replicas are a batch axis
``R`` carrying a per-replica inverse temperature ``beta[R]`` (the SSE updates
already accept vector beta). A replica exchange swaps the *beta labels*
between the two chains instead of moving op-string payloads — states live in
identical fixed shapes, so exchanging labels is exactly equivalent and costs
O(R) instead of O(R*M). Neighbor pairs are adjacent ranks in beta-sorted
order. The replica axis shards over a `jax.sharding.Mesh`; the only
cross-device traffic is the tiny ``beta``/``n`` vectors.

When all replicas share one Hamiltonian, ``W_rel = 1`` and the swap test
needs only the op counts (``tempering_traits.rs:117-155`` fast path; the
Hamiltonian-ratio term for heterogeneous-J ensembles is a later-round item).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep


@functools.partial(jax.jit, static_argnames=("parity",))
def tempering_step(
    n: jax.Array,  # i32[R] op counts
    betas: jax.Array,  # f32[R]
    key: jax.Array,
    parity: int,  # 0: pairs (0,1),(2,3)...; 1: pairs (1,2),(3,4)...
) -> tuple[jax.Array, jax.Array]:
    """One neighbor-swap sweep. Returns ``(new_betas, n_swaps)``.

    Acceptance ``p = (beta_a/beta_b)^(n_b - n_a)`` for the beta-adjacent pair
    (a = lower beta), mirroring ``swap_on_chunks``
    (``tempering_container.rs:274-302``) with equal Hamiltonians.
    """
    R = betas.shape[0]
    order = jnp.argsort(betas)  # ascending beta, rank -> replica
    b_sorted = betas[order]
    n_sorted = n[order].astype(jnp.float32)

    rank = jnp.arange(R, dtype=jnp.int32)
    is_start = ((rank - parity) % 2 == 0) & (rank >= parity) & (rank + 1 < R)

    b_next = jnp.roll(b_sorted, -1)
    n_next = jnp.roll(n_sorted, -1)
    # log p_swap at pair-start ranks: (n_b - n_a) (log beta_a - log beta_b)
    logp = (n_next - n_sorted) * (
        jnp.log(jnp.maximum(b_sorted, 1e-30)) - jnp.log(jnp.maximum(b_next, 1e-30))
    )
    u = jax.random.uniform(key, (R,))
    accept_start = is_start & (jnp.log(jnp.maximum(u, 1e-30)) < logp)
    accept_from_prev = jnp.roll(accept_start, 1) & (rank > 0)

    partner_rank = jnp.where(
        accept_start, rank + 1, jnp.where(accept_from_prev, rank - 1, rank)
    )
    new_b_sorted = b_sorted[partner_rank]
    new_betas = jnp.zeros_like(betas).at[order].set(new_b_sorted)
    return new_betas, jnp.sum(accept_start.astype(jnp.int32))


class TemperingContainer:
    """Batched parallel tempering over a :class:`QmcIsingGraph` ensemble.

    Mirrors ``TemperingContainer`` / ``ParallelQmcTimeSteps``
    (``tempering_container.rs:53-238, 315-478``): all replicas advance
    together (that is the batched execution model — the rayon-thread variant
    *is* the batch axis here), neighbor swaps alternate parity, and sampled
    states can be grouped by temperature.
    """

    def __init__(
        self,
        edges,
        transverse: float,
        longitudinal: float = 0.0,
        *,
        betas: Sequence[float],
        replicas_per_beta: int = 1,
        seed: int = 0,
    ):
        betas = np.asarray(betas, dtype=np.float32)
        R = len(betas) * replicas_per_beta
        self.graph = QmcIsingGraph(
            edges, transverse, longitudinal, replicas=R, seed=seed
        )
        self.betas = jnp.asarray(np.repeat(betas, replicas_per_beta))
        self._parity = 0
        self.total_swaps = 0
        self._key = jax.random.key(seed + 0x7E47)

    @property
    def replicas(self) -> int:
        return self.graph.replicas

    def _split(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- mirrors tempering_container.rs:77-81 ------------------------------
    def timesteps(self, t: int, chunk: int = 16) -> None:
        """Advance every replica ``t`` sweeps at its own temperature."""
        done = 0
        while done < t:
            todo = min(chunk, t - done)
            self.graph.sse, _, _, _ = multi_sweep(
                self.graph.sse,
                self.betas,
                self.graph.model,
                todo,
                hb=None,
                heatbath=False,
            )
            done += todo
            self.graph._maybe_grow()

    # -- mirrors tempering_container.rs:121-163 ----------------------------
    def tempering_step(self) -> int:
        """One alternating-parity neighbor-swap sweep; returns swap count."""
        n = _ops.op_count(self.graph.sse.ops)
        new_betas, swaps = tempering_step(
            n, self.betas, self._split(), self._parity
        )
        self.betas = new_betas
        self._parity = 1 - self._parity
        self.total_swaps += int(swaps)
        return int(swaps)

    # -- mirrors tempering_container.rs:166-208 / :411-451 -----------------
    def timesteps_sample(
        self,
        t: int,
        swap_freq: int = 1,
        sampling_freq: int | None = None,
    ):
        """Interleave sweeps, swaps, and state sampling.

        Returns ``(states bool[S, R, N], betas_at_sample f32[S, R])`` so
        samples can be grouped by temperature afterwards.
        """
        freq = sampling_freq or 1
        states, bet = [], []
        for step in range(t):
            self.timesteps(1, chunk=1)
            if (step + 1) % swap_freq == 0:
                self.tempering_step()
            if (step + 1) % freq == 0:
                states.append(np.asarray(self.graph.sse.state))
                bet.append(np.asarray(self.betas))
        S = len(states)
        return (
            np.stack(states) if S else np.zeros((0, self.replicas, self.graph.nvars), bool),
            np.stack(bet) if S else np.zeros((0, self.replicas), np.float32),
        )

    def states_by_temperature(self):
        """Current states ordered by ascending beta (temperature grouping)."""
        order = np.argsort(np.asarray(self.betas))
        return np.asarray(self.graph.sse.state)[order], np.asarray(self.betas)[order]

    def verify(self) -> bool:
        return self.graph.verify()
