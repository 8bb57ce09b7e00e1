"""Generic k-local interaction QMC — mirror of ``Qmc``
(``src/sse/qmc_runner.rs:26-440``), batched over replicas.

Interactions are arbitrary ``2^k x 2^k`` matrices (or ``2^k`` diagonals) over
``k`` variables, added via ``make_interaction[_and_offset]`` /
``make_diagonal_interaction[_and_offset]`` (``qmc_runner.rs:112-156``). The
timestep is: diagonal update -> optional directed-loop update -> cluster
update (when the model has cluster edges and keeps Ising symmetry) -> resample
free bits (``qmc_runner.rs:363-377``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu.sse import cluster as _cluster
from isingmontecarlo_tpu.sse import diagonal as _diag
from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse.ising import SseState, resample_free_spins
from isingmontecarlo_tpu.sse.model import BondModel, generic_model


@functools.partial(
    jax.jit,
    static_argnames=(
        "nsweeps", "do_loops", "do_cluster", "heatbath", "cluster_caps",
        "loop_cap",
    ),
)
def generic_multi_sweep(
    sse: SseState,
    beta: jax.Array,
    model: BondModel,
    nsweeps: int,
    do_loops: bool,
    do_cluster: bool,
    heatbath: bool = False,
    hb=None,
    cluster_caps: tuple[int, int] | None = None,
    loop_cap: int | None = None,
):
    """``nsweeps`` generic-engine timesteps (``qmc_runner.rs:363-377``:
    diagonal -> optional directed loop -> optional cluster -> free-bit
    resample) under one jit. Returns ``(sse, (op counts i32[T, R],
    loop-cap reverts i32[T, R]))``."""
    from isingmontecarlo_tpu.sse import loops as _loops

    def body(sse, _):
        key, k_d, k_l, k_c, k_f = jax.random.split(sse.key, 5)
        ops = _diag.diagonal_update(
            sse.ops, sse.state, beta, k_d, model, hb=hb, heatbath=heatbath
        )
        state = sse.state
        reverted = jnp.zeros((state.shape[0],), bool)
        if do_loops:
            ops, state, reverted = _loops.loop_update(
                ops, state, k_l, model, cap_hops=loop_cap, return_stats=True
            )
        has_op = None
        if do_cluster:
            if cluster_caps is not None:
                lc, ec = cluster_caps
            else:
                # Full-size single-pipeline labeling (no compact/full cond):
                # halves the compiled body — see ising.sweep's cap-less arm.
                lc = ops.bond.shape[0] + model.nvars + 1
                ec = None
            # One segment-graph build serves the cluster update and the
            # free-bit resample (see ising.sweep): cluster flips never move
            # ops, so the per-var occupation stays valid.
            sg = _cluster.segment_graph(ops, model)
            has_op = (sg.head_f < ops.max_legs * ops.bond.shape[0]).T
            ops, state = _cluster._cluster_update_impl(
                ops, state, k_c, model, 0.5, lc, ec, sg
            )
        new = SseState(ops=ops, state=state, key=key)
        new = resample_free_spins(new, k_f, model, has_op=has_op)
        return new, (_ops.op_count(new.ops), reverted.astype(jnp.int32))

    return jax.lax.scan(body, sse, None, length=nsweeps)


class Interaction:
    """A k-local interaction — mirror of the reference ``Interaction``
    (``qmc_runner.rs:561-699``). ``mat`` is the stored (post-offset) matrix:
    a ``2^k x 2^k`` array (row = outputs, col = inputs) or a length-``2^k``
    diagonal; bit order has the first variable most significant
    (``qmc_runner.rs:668-680``)."""

    def __init__(self, mat: np.ndarray, vars: Sequence[int]):
        self.mat = np.asarray(mat, dtype=np.float64)
        self.vars = list(vars)
        self.n = len(self.vars)
        self.diagonal = self.mat.ndim == 1
        diag = self.mat if self.diagonal else np.diagonal(self.mat)
        self.constant_along_diagonal = bool(
            np.all(np.abs(diag - diag.flat[0]) < 1e-12)
        )
        self._constant = (not self.diagonal) and bool(
            np.all(np.abs(self.mat - self.mat.flat[0]) < 1e-12)
        )

    def is_constant(self) -> bool:
        """All entries equal (``qmc_runner.rs:562-564``)."""
        return self._constant

    def is_constant_diag(self) -> bool:
        """``qmc_runner.rs:567-569``."""
        return self.constant_along_diagonal

    @staticmethod
    def _index(bits) -> int:
        acc = 0
        for b in bits:
            acc = (acc << 1) | int(bool(b))
        return acc

    def at(self, inputs, outputs) -> float:
        """Matrix element for the given leg substates
        (``qmc_runner.rs:573-612``)."""
        if len(inputs) != self.n or len(outputs) != self.n:
            raise ValueError(
                f"Interaction covers {self.n} vars, "
                f"given ({len(inputs)}/{len(outputs)})"
            )
        if self.diagonal:
            if self._index(inputs) != self._index(outputs):
                return 0.0
            return float(self.mat[self._index(inputs)])
        return float(self.mat[self._index(outputs), self._index(inputs)])

    def sym_under_ising(self) -> bool:
        """Symmetry under a global spin flip (``qmc_runner.rs:643-664``)."""
        return _sym_under_ising(self.mat, self.n)


def _sym_under_ising(mat: np.ndarray, k: int) -> bool:
    """Global-spin-flip symmetry of an interaction (``qmc_runner.rs:643-664``)."""
    mat = np.asarray(mat, dtype=np.float64)
    n = 1 << k
    if mat.ndim == 1:
        return all(abs(mat[i] - mat[(~i) & (n - 1)]) < 1e-12 for i in range(n))
    return all(
        abs(mat[o, i] - mat[(~o) & (n - 1), (~i) & (n - 1)]) < 1e-12
        for o in range(n)
        for i in range(n)
    )


class Qmc:
    """Batched generic-interaction SSE QMC."""

    def __init__(
        self,
        nvars: int,
        *,
        replicas: int = 1,
        seed: int = 0,
        do_loop_updates: bool = False,
        state: np.ndarray | None = None,
    ):
        self.nvars = nvars
        self.replicas = replicas
        self.do_loop_updates = do_loop_updates
        self._do_heatbath = False
        self._loop_cap: int | None = None
        self.total_loop_reverts = 0
        self.total_loop_updates = 0
        self._interactions: list[tuple[np.ndarray, list[int]]] = []
        self.offset = 0.0
        self.has_cluster_edges = False
        self.breaks_ising_symmetry = False
        self._growth_pending = True  # see QmcIsingGraph.timesteps_measure
        self._growth_stable = 0  # no-growth streak, persists across calls
        self._cluster_caps: tuple[int, int] | None = None
        self._model: BondModel | None = None
        self._hb: _diag.HeatBathTables | None = None
        key = jax.random.key(seed)
        key, k_state = jax.random.split(key)
        if state is None:
            spins = jax.random.bernoulli(k_state, 0.5, (replicas, nvars))
        else:
            spins = jnp.asarray(state, bool)
            if spins.ndim == 1:
                spins = jnp.broadcast_to(spins[None], (replicas, nvars))
        self._key = key
        self._spins = spins
        self._sse: SseState | None = None

    @classmethod
    def new_with_state(
        cls,
        nvars: int,
        state,
        *,
        replicas: int = 1,
        seed: int = 0,
        do_loop_updates: bool = False,
    ) -> "Qmc":
        """``qmc_runner.rs:54-62``."""
        return cls(
            nvars,
            replicas=replicas,
            seed=seed,
            do_loop_updates=do_loop_updates,
            state=state,
        )

    # -- interactions ------------------------------------------------------

    def _add(self, mat, vars, diagonal: bool, offset: bool):
        mat = np.asarray(mat, dtype=np.float64)
        vars = list(vars)
        k = len(vars)
        n = 1 << k
        if diagonal:
            mat = mat.reshape(-1)
            if mat.shape[0] != n:
                raise ValueError(f"diagonal interaction needs 2^{k} entries")
        else:
            mat = mat.reshape(n, n) if mat.size == n * n else mat
            if mat.shape != (n, n):
                raise ValueError(f"interaction needs 2^{k} x 2^{k} entries")
        if offset:
            # Subtract the min diagonal entry and track it: the reference's
            # `make_*_interaction_and_offset` does `self.offset -= shift`
            # (qmc_runner.rs:123-156, 440-559) and the energy estimator is
            # E = -<n>/beta + self.offset.
            diag = mat if diagonal else np.diagonal(mat).copy()
            shift = float(np.min(diag))
            if diagonal:
                mat = mat - shift
            else:
                mat = mat.copy()
                np.fill_diagonal(mat, np.diagonal(mat) - shift)
            self.offset -= shift
        if np.any(mat < 0):
            raise ValueError("interaction weights must be non-negative")
        if not _sym_under_ising(mat, k):
            self.breaks_ising_symmetry = True
        is_const = mat.ndim == 2 and np.all(np.abs(mat - mat.flat[0]) < 1e-12)
        if is_const and k == 1:
            self.has_cluster_edges = True
        self._interactions.append((mat, vars))
        self._model = None  # invalidate compiled tables

    def make_interaction(self, mat, vars) -> None:
        self._add(mat, vars, diagonal=False, offset=False)

    def make_interaction_and_offset(self, mat, vars) -> None:
        self._add(mat, vars, diagonal=False, offset=True)

    def make_diagonal_interaction(self, mat, vars) -> None:
        self._add(mat, vars, diagonal=True, offset=False)

    def make_diagonal_interaction_and_offset(self, mat, vars) -> None:
        self._add(mat, vars, diagonal=True, offset=True)

    # -- compiled model ----------------------------------------------------

    @property
    def model(self) -> BondModel:
        if self._model is None:
            if not self._interactions:
                raise ValueError("no interactions added")
            self._model = generic_model(
                self.nvars, self._interactions, offset=self.offset
            )
        return self._model

    def _ensure_sse(self) -> SseState:
        if self._sse is None:
            cutoff = max(self.nvars, 8)
            self._sse = SseState(
                ops=_ops.empty_opstring(cutoff, self.replicas, self.model.max_legs),
                state=self._spins,
                key=self._key,
            )
        return self._sse

    # -- toggles (qmc_runner.rs:258-270) -----------------------------------

    def set_do_heatbath(self, do: bool) -> None:
        self._do_heatbath = do
        if do and self._hb is None:
            self._hb = _diag.make_heatbath_tables(self.model)

    def set_do_loop_updates(self, do: bool) -> None:
        self.do_loop_updates = do

    def should_do_cluster_update(self) -> bool:
        """``qmc_runner.rs:223-239``: clusters need edges + Ising symmetry."""
        return self.has_cluster_edges and not self.breaks_ising_symmetry

    def should_do_heatbath(self) -> bool:
        """``qmc_runner.rs:263-265``."""
        return self._do_heatbath

    def should_do_loop_update(self) -> bool:
        """``qmc_runner.rs:273-275``."""
        return self.do_loop_updates

    # -- individual update moves (qmc_runner.rs:159-256) ---------------------

    def diagonal_update(self, beta: float) -> None:
        """One diagonal sweep only (``qmc_runner.rs:159-203``)."""
        sse = self._ensure_sse()
        key, k_d = jax.random.split(sse.key)
        ops = _diag.diagonal_update(
            sse.ops, sse.state, jnp.float32(beta), k_d, self.model,
            hb=self._hb if self._do_heatbath else None,
            heatbath=self._do_heatbath,
        )
        self._sse = sse._replace(ops=ops, key=key)
        self._maybe_grow()

    def loop_update(self) -> None:
        """One directed-loop update only (``qmc_runner.rs:205-220``)."""
        from isingmontecarlo_tpu.sse import loops as _loops

        sse = self._ensure_sse()
        key, k_l = jax.random.split(sse.key)
        ops, state, reverted = _loops.loop_update(
            sse.ops, sse.state, k_l, self.model, cap_hops=self._loop_cap,
            return_stats=True,
        )
        self.total_loop_reverts += int(jnp.sum(reverted.astype(jnp.int32)))
        self.total_loop_updates += self.replicas
        self._sse = sse._replace(ops=ops, state=state, key=key)

    def set_loop_cap(self, cap_hops: int | None) -> None:
        """Override the directed-loop walk cap (default ``4*K*M + 16``;
        see ``loops.loop_update`` — non-closing walks revert and count in
        :attr:`total_loop_reverts`)."""
        self._loop_cap = cap_hops

    def loop_revert_rate(self) -> float:
        """Fraction of directed-loop walks that hit the cap and reverted
        (instrumentation for the capped-walk deviation; the reference walks
        forever, ``directed_loop.rs:177-301``)."""
        return self.total_loop_reverts / max(self.total_loop_updates, 1)

    def cluster_update(self) -> None:
        """One cluster update only; raises on models without cluster edges
        or with broken Ising symmetry (``qmc_runner.rs:223-239`` returns
        ``Err`` there)."""
        if not self.should_do_cluster_update():
            raise ValueError(
                "cluster update needs cluster-edge interactions and "
                "Ising symmetry (qmc_runner.rs:223-239)"
            )
        sse = self._ensure_sse()
        key, k_c = jax.random.split(sse.key)
        lc, ec = self._cluster_caps or (None, None)
        ops, state = _cluster.cluster_update(
            sse.ops, sse.state, k_c, self.model, 0.5, lc, ec
        )
        self._sse = sse._replace(ops=ops, state=state, key=key)

    def flip_free_bits(self) -> None:
        """Resample spins with no ops on their worldline
        (``qmc_runner.rs:241-256``)."""
        sse = self._ensure_sse()
        key, k_f = jax.random.split(sse.key)
        self._sse = resample_free_spins(
            sse._replace(key=key), k_f, self.model
        )

    # -- stepping ----------------------------------------------------------

    def _multi_timestep(self, beta: float, nsweeps: int) -> jax.Array:
        """``nsweeps`` timesteps fused under one jit (the generic-engine
        analog of ``multi_sweep``); returns per-sweep op counts ``i32[T, R]``
        and leaves the new state in ``self._sse``."""
        sse = self._ensure_sse()
        self._sse, (ns, reverts) = generic_multi_sweep(
            sse,
            jnp.float32(beta),
            self.model,
            nsweeps,
            do_loops=self.do_loop_updates,
            do_cluster=self.should_do_cluster_update(),
            heatbath=self._do_heatbath,
            hb=self._hb if self._do_heatbath else None,
            cluster_caps=self._cluster_caps,
            loop_cap=self._loop_cap,
        )
        if self.do_loop_updates:
            self.total_loop_reverts += int(jnp.sum(reverts))
            self.total_loop_updates += self.replicas * nsweeps
        self._maybe_grow()
        return ns

    def timestep(self, beta: float) -> jax.Array:
        """One timestep (``qmc_runner.rs:363-377``)."""
        self._multi_timestep(beta, 1)
        return self._sse.state

    def _maybe_grow(self) -> None:
        sse = self._ensure_sse()
        n_max = int(jnp.max(_ops.op_count(sse.ops)))
        want = n_max + n_max // 2
        if want > sse.ops.cutoff:
            new_m = ((want + 15) // 16) * 16
            self._sse = sse._replace(ops=_ops.grow(sse.ops, new_m))
        if self.should_do_cluster_update():
            from isingmontecarlo_tpu.sse.ising import _cap_counts

            nc, nm = _cap_counts(self._sse.ops, self.model)
            N = self.nvars
            want_l = max(
                256, 16 * ((int((int(nc) + N + 2) * 1.3) + 15) // 16)
            )
            want_e = max(
                256, 16 * ((int((int(nm) + N + 2) * 1.3) + 15) // 16)
            )
            cur = self._cluster_caps or (0, 0)
            if want_l > cur[0] or want_e > cur[1]:
                self._cluster_caps = (
                    max(want_l, cur[0]), max(want_e, cur[1])
                )

    def timesteps(self, t: int, beta: float, chunk: int = 16) -> jax.Array:
        """Average energy per replica over ``t`` steps (``qmc_stepper.rs:17``),
        running ``chunk`` fused timesteps per dispatch.

        Starts in a per-step growth phase (the reference grows the cutoff
        after every timestep, ``qmc_ising.rs:786``) and switches to fused
        chunks once two consecutive steps stop growing — a cold cutoff left
        truncated for a whole chunk biases the energy estimator."""
        total_n = jnp.zeros((self.replicas,), jnp.float32)
        done = 0
        stable = 2 if not self._growth_pending else self._growth_stable
        while done < t:
            todo = 1 if stable < 2 else min(chunk, t - done)
            before = self._ensure_sse().ops.cutoff
            ns = self._multi_timestep(beta, todo)
            stable = 0 if self._ensure_sse().ops.cutoff != before else stable + 1
            total_n = total_n + jnp.sum(ns.astype(jnp.float32), axis=0)
            done += todo
        self._growth_stable = stable
        self._growth_pending = stable < 2
        avg_n = total_n / t
        return -(avg_n / beta) + self.model.offset

    def timesteps_sample(self, t: int, beta: float, sampling_freq: int | None = None):
        freq = sampling_freq or 1
        samples = []
        acc, energy = self.timesteps_measure(
            t, beta, samples,
            lambda acc, s: (acc.append(np.asarray(s)), acc)[1],
            sampling_freq,
        )
        states = (
            np.stack(acc) if acc else np.zeros((0, self.replicas, self.nvars), bool)
        )
        return states, energy

    def timesteps_measure(
        self,
        t: int,
        beta: float,
        init_acc,
        state_fold,
        sampling_freq: int | None = None,
    ):
        """Fold over sampled states (``qmc_stepper.rs:133-162`` for the
        generic engine): measure every ``sampling_freq``-th step, accumulate
        the op count for the energy estimator; returns ``(acc, f32[R])``."""
        freq = sampling_freq or 1
        acc = init_acc
        total_n = jnp.zeros((self.replicas,), jnp.float32)
        measured = 0
        for i in range(t):
            self.timestep(beta)
            if (i + 1) % freq == 0:
                acc = state_fold(acc, self._sse.state)
                total_n = total_n + _ops.op_count(self._sse.ops)
                measured += 1
        avg_n = total_n / max(measured, 1)
        return acc, -(avg_n / beta) + self.model.offset

    def timesteps_sample_iter(
        self, t: int, beta: float, sampling_freq, iter_fn
    ) -> jax.Array:
        """``qmc_stepper.rs:43-73`` for the generic engine."""
        _, energy = self.timesteps_measure(
            t, beta, None, lambda acc, s: (iter_fn(s), acc)[1], sampling_freq
        )
        return energy

    def timesteps_sample_iter_zip(
        self, t: int, beta: float, sampling_freq, zip_with, iter_fn
    ) -> jax.Array:
        """Zip samples with an iterable (``qmc_stepper.rs:97-130``, a blanket
        impl over every stepper in the reference): ``iter_fn(next(zip_with),
        state)`` per sample, stopping the fold when the iterable runs out."""
        it = iter(zip_with)

        def fold(acc, s):
            try:
                z = next(it)
            except StopIteration:
                return acc
            iter_fn(z, s)
            return acc

        _, energy = self.timesteps_measure(t, beta, None, fold, sampling_freq)
        return energy

    def imaginary_time_fold(self, fold_fn, init):
        """Streaming fold over all ``M`` propagated imaginary-time states
        (``qmc_stepper.rs:165-167``) without materializing ``bool[M, R, N]``;
        ``fold_fn(acc, state_at_p)`` must be jax-traceable."""
        sse = self._ensure_sse()
        return _ops.itime_fold(sse.ops, sse.state, self.model, fold_fn, init)

    # -- manager/state swap (SwapManagers for Qmc, qmc_runner.rs:319-341) ---

    def can_swap_managers(self, other: "Qmc") -> bool:
        return (
            self.nvars == other.nvars
            and self.replicas == other.replicas
            and self.model.nbonds == other.model.nbonds
        )

    def swap_manager_and_state(self, other: "Qmc") -> None:
        assert self.can_swap_managers(other)
        self._sse, other._sse = other._ensure_sse(), self._ensure_sse()

    def increase_cutoff_to(self, cutoff: int) -> None:
        """Grow the op-string capacity (``qmc_runner.rs:306-312``)."""
        sse = self._ensure_sse()
        self._sse = sse._replace(ops=_ops.grow(sse.ops, cutoff))

    # -- autocorrelations (qmc_runner.rs:736-751) ----------------------------

    def calculate_bond_autocorrelation(
        self, t: int, beta: float, sampling_freq: int | None = None
    ) -> np.ndarray:
        """Autocorrelation of the diagonal matrix-element value of every
        non-constant diagonal-capable interaction, evaluated on sampled
        states (``QmcBondAutoCorrelations`` for ``Qmc``,
        ``qmc_runner.rs:736-751``)."""
        from isingmontecarlo_tpu.analysis import autocorr as _ac

        states, _ = self.timesteps_sample(t, beta, sampling_freq)
        states = jnp.asarray(states)  # bool[T, R, N]
        m = self.model
        keep = ~np.asarray(m.is_constant)
        b_ids = np.nonzero(keep)[0]
        vars_b = jnp.asarray(np.asarray(m.bond_vars)[b_ids])  # [B, K]
        K = vars_b.shape[1]
        bits = []
        for l in range(K):
            idx = jnp.where(vars_b[:, l] >= 0, vars_b[:, l], 0)
            bit = jnp.where(
                vars_b[None, None, :, l] >= 0, states[..., idx], False
            )
            bits.append(bit.astype(jnp.int32) << l)
        si = sum(bits)  # i32[T, R, B]
        vals = m.diag_w[jnp.asarray(b_ids)[None, None, :], si]
        return np.asarray(_ac.fft_autocorrelation(vals))

    # -- accessors ---------------------------------------------------------

    def get_n(self) -> jax.Array:
        return _ops.op_count(self._ensure_sse().ops)

    def get_bonds(self) -> list:
        """The added interactions as :class:`Interaction` objects
        (``qmc_runner.rs:108-110``)."""
        return [Interaction(m, v) for m, v in self._interactions]

    def get_manager_ref(self) -> _ops.OpString:
        """The op-string container — the reference's op manager
        (``qmc_runner.rs:294-296``). Immutable pytree; mutate by assigning
        a rebuilt one through the internal state."""
        return self._ensure_sse().ops

    def get_offset(self) -> float:
        """Accumulated diagonal offset (``qmc_runner.rs:289-291``)."""
        return self.offset

    def get_cutoff(self) -> int:
        """``qmc_runner.rs:299-301``."""
        return self._ensure_sse().ops.cutoff

    def set_cutoff(self, cutoff: int) -> None:
        """Grow the op-string capacity (``qmc_runner.rs:304-308``; shrinking
        is a no-op since slots above the old cutoff are identities)."""
        sse = self._ensure_sse()
        self._sse = sse._replace(ops=_ops.grow(sse.ops, cutoff))

    def clone_state(self) -> np.ndarray:
        """Copy of the p=0 state (``qmc_runner.rs:344-346``)."""
        return np.asarray(self._ensure_sse().state).copy()

    def into_vec(self) -> np.ndarray:
        """Consume into the state array (``qmc_runner.rs:284-286``)."""
        return self.clone_state()

    def state_ref(self) -> jax.Array:
        return self._ensure_sse().state

    # -- checkpointing (the reference serde derive, qmc_runner.rs:25) -------

    def save(self, path: str, *, strip_rng: bool = False) -> None:
        from isingmontecarlo_tpu import checkpoint as _ckpt

        _ckpt.save_qmc(path, self, strip_rng=strip_rng)

    @classmethod
    def load(cls, path: str, *, seed: int | None = None) -> "Qmc":
        from isingmontecarlo_tpu import checkpoint as _ckpt

        return _ckpt.load_qmc(path, seed=seed)

    def get_bond_count(self, bond: int) -> jax.Array:
        return _ops.bond_counts(self._ensure_sse().ops, self.model.nbonds)[:, bond]

    def verify(self) -> bool:
        sse = self._ensure_sse()
        return bool(jnp.all(_ops.verify(sse.ops, sse.state, self.model)))
