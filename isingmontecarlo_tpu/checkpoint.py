"""Checkpoint / resume — the reference's ``serialize`` cargo feature.

The reference derives serde over the whole simulation state: op string, p=0
state, cutoff, counters, and (where supported) the RNG, with RNG-less snapshot
types ``SerializeQmcGraph`` (``src/sse/qmc_ising.rs:1000-1159``) and
``SerializeTemperingContainer`` (``tempering_container.rs:670-793``) that
re-seed on load.

Here the whole simulation state is already a pytree (``SseState`` = op-string
tensors + spins + threefry key), so checkpointing is a flat ``.npz`` of the
leaves plus the model-rebuilding metadata (edge list, fields). Typed PRNG key
arrays are stored as raw key data (``jax.random.key_data``) and re-wrapped on
load; pass ``strip_rng=True`` to drop the key like the reference's RNG-less
snapshots and supply a fresh ``seed`` at load time.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _is_key(x: Any) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def save_pytree(path: str, tree: Any, **metadata: Any) -> None:
    """Save any pytree of arrays as ``.npz`` (leaves keyed ``leaf{i}``).

    PRNG key leaves are stored as their raw key data with a ``key{i}`` name
    so :func:`load_pytree` can re-wrap them. ``metadata`` entries are stored
    under ``meta_{name}``.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    payload: dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            payload[f"key{i}"] = np.asarray(jax.random.key_data(leaf))
        else:
            payload[f"leaf{i}"] = np.asarray(leaf)
    for name, value in metadata.items():
        payload[f"meta_{name}"] = np.asarray(value)
    np.savez(path, **payload)


def load_pytree(path: str, like: Any) -> tuple[Any, dict[str, np.ndarray]]:
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure (its leaf values are ignored).
    Returns ``(tree, metadata)``.
    """
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(like)
    leaves = []
    for i in range(treedef.num_leaves):
        if f"key{i}" in data:
            leaves.append(jax.random.wrap_key_data(jnp.asarray(data[f"key{i}"])))
        else:
            leaves.append(jnp.asarray(data[f"leaf{i}"]))
    meta = {
        k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
    }
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


# ---------------------------------------------------------------------------
# Model-level checkpoints (mirrors SerializeQmcGraph, qmc_ising.rs:1000-1159).
# ---------------------------------------------------------------------------


def save_qmc_ising(path: str, graph, *, strip_rng: bool = False) -> None:
    """Checkpoint a :class:`~isingmontecarlo_tpu.sse.ising.QmcIsingGraph`,
    including the Hamiltonian description so ``load_qmc_ising`` rebuilds the
    model without user input."""
    sse = graph.sse
    if strip_rng:
        sse = sse._replace(key=jax.random.key(0))
    edges_v = np.asarray([[a, b] for (a, b), _ in graph.edges], np.int64)
    edges_j = np.asarray([j for _, j in graph.edges], np.float64)
    save_pytree(
        path,
        sse,
        edges_v=edges_v,
        edges_j=edges_j,
        transverse=graph.transverse,
        longitudinal=graph.longitudinal,
        replicas=graph.replicas,
        strip_rng=strip_rng,
    )


def load_qmc_ising(path: str, *, seed: int | None = None):
    """Restore a ``QmcIsingGraph`` from :func:`save_qmc_ising` output.

    ``seed`` re-seeds the RNG (required if saved with ``strip_rng=True``,
    mirroring the reference's rng-supplying deserializers,
    ``qmc_ising.rs:1050-1087``)."""
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, SseState
    from isingmontecarlo_tpu.sse.opstring import OpString

    like = SseState(
        ops=OpString(bond=0, inputs=0, outputs=0), state=0, key=jax.random.key(0)
    )
    sse, meta = load_pytree(path, like)
    edges = [
        ((int(a), int(b)), float(j))
        for (a, b), j in zip(meta["edges_v"], meta["edges_j"])
    ]
    graph = QmcIsingGraph(
        edges,
        float(meta["transverse"]),
        float(meta["longitudinal"]),
        cutoff=int(sse.ops.bond.shape[0]),
        replicas=int(meta["replicas"]),
        seed=seed or 0,
    )
    if bool(meta["strip_rng"]) or seed is not None:
        sse = sse._replace(key=jax.random.key(seed or 0))
    graph.sse = sse
    return graph


def save_qmc(path: str, qmc, *, strip_rng: bool = False) -> None:
    """Checkpoint a generic :class:`~isingmontecarlo_tpu.sse.runner.Qmc`
    (the reference's ``Qmc`` derives serde too, ``qmc_runner.rs:25``).

    The stored matrices are the post-offset ones, so the accumulated offset
    is saved verbatim and never re-derived on load."""
    sse = qmc._ensure_sse()
    if strip_rng:
        sse = sse._replace(key=jax.random.key(0))
    mats = [np.asarray(m, np.float64) for m, _ in qmc._interactions]
    vars_ = [v for _, v in qmc._interactions]
    save_pytree(
        path,
        sse,
        nvars=qmc.nvars,
        replicas=qmc.replicas,
        offset=qmc.offset,
        do_loop_updates=qmc.do_loop_updates,
        do_heatbath=qmc._do_heatbath,
        int_diag=np.asarray([m.ndim == 1 for m in mats], bool),
        int_mat_sizes=np.asarray([m.size for m in mats], np.int64),
        int_mats=(
            np.concatenate([m.reshape(-1) for m in mats])
            if mats else np.zeros((0,), np.float64)
        ),
        int_var_counts=np.asarray([len(v) for v in vars_], np.int64),
        int_vars=(
            np.concatenate([np.asarray(v, np.int64) for v in vars_])
            if vars_ else np.zeros((0,), np.int64)
        ),
        strip_rng=strip_rng,
    )


def load_qmc(path: str, *, seed: int | None = None):
    """Restore a generic ``Qmc`` from :func:`save_qmc` output."""
    from isingmontecarlo_tpu.sse.ising import SseState
    from isingmontecarlo_tpu.sse.opstring import OpString
    from isingmontecarlo_tpu.sse.runner import Qmc

    like = SseState(
        ops=OpString(bond=0, inputs=0, outputs=0), state=0, key=jax.random.key(0)
    )
    sse, meta = load_pytree(path, like)
    q = Qmc(
        int(meta["nvars"]),
        replicas=int(meta["replicas"]),
        seed=seed or 0,
        do_loop_updates=bool(meta["do_loop_updates"]),
    )
    mats_flat = meta["int_mats"]
    vars_flat = meta["int_vars"]
    mo = vo = 0
    for diag, msize, vcount in zip(
        meta["int_diag"], meta["int_mat_sizes"], meta["int_var_counts"]
    ):
        mat = mats_flat[mo : mo + int(msize)]
        vars_ = [int(v) for v in vars_flat[vo : vo + int(vcount)]]
        mo += int(msize)
        vo += int(vcount)
        if bool(diag):
            q.make_diagonal_interaction(mat, vars_)
        else:
            n = 1 << len(vars_)
            q.make_interaction(mat.reshape(n, n), vars_)
    q.offset = float(meta["offset"])
    q._model = None  # offset participates in the compiled tables
    if bool(meta["do_heatbath"]):
        q.set_do_heatbath(True)
    if bool(meta["strip_rng"]) or seed is not None:
        sse = sse._replace(key=jax.random.key(seed or 0))
    q._sse = sse
    return q


def save_tempering(path: str, container, *, strip_rng: bool = False) -> None:
    """Checkpoint a ``TemperingContainer`` (state + per-replica betas +
    swap bookkeeping), mirroring ``SerializeTemperingContainer``."""
    sse = container.graph.sse
    if strip_rng:
        sse = sse._replace(key=jax.random.key(0))
    edges_v = np.asarray([[a, b] for (a, b), _ in container.graph.edges], np.int64)
    edges_j = np.asarray([j for _, j in container.graph.edges], np.float64)
    save_pytree(
        path,
        (sse, container.betas),
        edges_v=edges_v,
        edges_j=edges_j,
        transverse=container.graph.transverse,
        longitudinal=container.graph.longitudinal,
        replicas=container.graph.replicas,
        parity=container._parity,
        total_swaps=container.total_swaps,
        scales=np.asarray(container.scales, np.float32),
        # Signed ladders: per-replica sign-pattern labels (substate-XOR
        # masks); empty array = unsigned, keeps the format self-describing.
        xors=(
            np.asarray(container.xors, np.int32)
            if container.xors is not None
            else np.zeros((0, 0), np.int32)
        ),
        strip_rng=strip_rng,
    )


def load_tempering(path: str, *, seed: int | None = None):
    from isingmontecarlo_tpu.parallel.tempering import TemperingContainer
    from isingmontecarlo_tpu.sse.ising import SseState
    from isingmontecarlo_tpu.sse.opstring import OpString

    like = (
        SseState(
            ops=OpString(bond=0, inputs=0, outputs=0), state=0, key=jax.random.key(0)
        ),
        0,
    )
    (sse, betas), meta = load_pytree(path, like)
    edges = [
        ((int(a), int(b)), float(j))
        for (a, b), j in zip(meta["edges_v"], meta["edges_j"])
    ]
    container = TemperingContainer(
        edges,
        float(meta["transverse"]),
        float(meta["longitudinal"]),
        betas=np.asarray(betas),
        seed=seed or 0,
    )
    if bool(meta["strip_rng"]) or seed is not None:
        sse = sse._replace(key=jax.random.key(seed or 0))
    container.graph.sse = sse
    container.betas = betas
    container._parity = int(meta["parity"])
    container.total_swaps = int(meta["total_swaps"])
    if "scales" in meta:  # per-bond Hamiltonian multipliers (hetero ladders)
        sc = np.asarray(meta["scales"], np.float32)
        container.scales = jnp.asarray(sc)
        container.hetero = bool(np.max(np.abs(sc - 1.0)) > 1e-12)
    if "xors" in meta:  # signed-ladder sign-pattern labels
        xr = np.asarray(meta["xors"], np.int32)
        container.xors = jnp.asarray(xr) if xr.size else None
    return container
