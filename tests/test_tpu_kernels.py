"""TPU-only kernel tests (skipped on the CPU CI mesh; run on real hardware
with ``python -m pytest tests/test_tpu_kernels.py --no-header -q`` after
clearing the CPU forcing in conftest via JAX_REAL_TPU=1)."""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need real TPU hardware",
)


class TestCheckerboardKernel:
    def test_statistics_match_xla_path(self):
        import jax.numpy as jnp

        from isingmontecarlo_tpu.classical.metropolis import (
            checkerboard_sweep,
            lattice_energy,
        )
        from isingmontecarlo_tpu.ops import checkerboard_multi_sweep

        L, R = 128, 16
        key = jax.random.key(0)
        spins = jax.random.bernoulli(key, 0.5, (R, L, L))
        beta, j, h = 0.35, -1.0, 0.0
        sp = checkerboard_multi_sweep(spins, jnp.int32(7), beta, j, h, 80)
        e_pallas = float(jnp.mean(lattice_energy(sp, j, h))) / (L * L)
        sx = spins
        for _ in range(80):
            key, sub = jax.random.split(key)
            sx = checkerboard_sweep(
                sx, sub, jnp.float32(beta), jnp.float32(j), jnp.float32(h)
            )
        e_xla = float(jnp.mean(lattice_energy(sx, j, h))) / (L * L)
        assert abs(e_pallas - e_xla) < 0.05, (e_pallas, e_xla)

    def test_lattice_ising_wrapper(self):
        from isingmontecarlo_tpu.classical import LatticeIsing

        m = LatticeIsing(128, j=-1.0, replicas=8, seed=1)
        e0 = float(np.mean(np.asarray(m.get_energy())))
        m.run_sweeps(100, beta=0.6)
        e1 = float(np.mean(np.asarray(m.get_energy())))
        assert e1 < e0, "ferromagnet should lower energy at low T"
        assert abs(float(np.mean(np.asarray(m.get_magnetization())))) <= 128 * 128


class TestMxuTableGather:
    def test_table_f32_bit_exact(self):
        """The byte-plane one-hot MXU table lookup must be bit-identical to
        the plain gather for arbitrary f32 values (incl. negatives and wide
        exponents)."""
        import jax.numpy as jnp

        from isingmontecarlo_tpu.sse import rvb as _rvb

        key = jax.random.key(0)
        T = 768
        table = jax.random.normal(key, (T,), jnp.float32) * jnp.exp(
            jax.random.normal(jax.random.key(1), (T,)) * 5
        )
        idx = jax.random.randint(jax.random.key(2), (32, 513), 0, T, jnp.int32)
        a = jax.jit(_rvb._table_f32)(table, idx)
        b = jax.jit(lambda t, i: t[i])(table, idx)
        assert np.array_equal(np.asarray(a), np.asarray(b))
