"""The single-core C++ reference-equivalent benchmark
(``native/ref_single_core.cpp``) stays a valid physics oracle: it must build,
pass its own worldline ``verify()`` at every step, and reproduce the JAX
engine's energy on the identical lattice within statistical tolerance.

This guards the ESS/sec denominator measurement (BASELINE.md): if the C++
drifts from the reference semantics, the 100x north-star comparison is
meaningless.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "isingmontecarlo_tpu", "native",
                   "ref_single_core.cpp")
BIN = os.path.join(HERE, "..", "isingmontecarlo_tpu", "native",
                   "_ref_single_core")


@pytest.fixture(scope="module")
def binary():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in this environment")
    if not os.path.exists(BIN) or os.path.getmtime(BIN) < os.path.getmtime(SRC):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", SRC, "-o", BIN],
            check=True, capture_output=True, timeout=300,
        )
    return BIN


def run(binary, *args):
    out = subprocess.run(
        [binary, *map(str, args)], check=True, capture_output=True,
        text=True, timeout=600,
    )
    return out.stdout


def test_verify_soak_and_energy(binary):
    out = run(binary, 4, 1.0, 500, 6000, 7, "--check")
    line = [l for l in out.splitlines() if l.startswith("summary")][0]
    assert "verify=1" in line
    e = float(line.split("energy_per_site=")[1].split()[0])

    # JAX engine on the identical lattice (same coupling pattern).
    from isingmontecarlo_tpu import lattice
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

    g = QmcIsingGraph(
        lattice.bench_two_d_periodic(4), transverse=1.0, replicas=64, seed=3
    )
    g.timesteps(150, 1.0)
    es = [np.asarray(g.timesteps(1, 1.0)) for _ in range(100)]
    e_jax = float(np.mean(es)) / 16.0
    assert e == pytest.approx(e_jax, abs=0.04), (e, e_jax)


def test_beta_scaling_sanity(binary):
    # Higher beta -> lower energy (toward the ground state).
    out1 = run(binary, 4, 0.5, 300, 1500, 11)
    out2 = run(binary, 4, 4.0, 500, 1500, 11)
    e = lambda o: float(
        [l for l in o.splitlines() if l.startswith("summary")][0]
        .split("energy_per_site=")[1].split()[0]
    )
    assert e(out2) < e(out1)
