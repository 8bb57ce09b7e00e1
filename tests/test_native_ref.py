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


def test_random_graph_differential(binary, tmp_path):
    """Differential test on a random weighted graph: the C++ single-chain
    engine and the batched JAX engine must agree on the energy within
    statistical tolerance (catches coupling-sign or weight-table bias in
    either implementation)."""
    rng = np.random.default_rng(17)
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    idx = rng.choice(len(pairs), size=12, replace=False)
    edges = [
        ((int(pairs[i][0]), int(pairs[i][1])),
         float(np.round(rng.uniform(-1.5, 1.5), 3)))
        for i in idx
    ]
    nvars = 1 + max(max(a, b) for (a, b), _ in edges)
    path = tmp_path / "edges.txt"
    with open(path, "w") as f:
        f.write(f"{nvars} {len(edges)}\n")
        for (a, b), j in edges:
            f.write(f"{a} {b} {j}\n")

    out = run(binary, 8, 1.0, 500, 8000, 3, "--check", "--edges", str(path))
    line = [l for l in out.splitlines() if l.startswith("summary")][0]
    assert "verify=1" in line
    e_cpp = float(line.split("energy_per_site=")[1].split()[0])

    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

    g = QmcIsingGraph(edges, transverse=1.0, replicas=64, seed=5)
    g.timesteps(150, 1.0)
    es = [np.asarray(g.timesteps(1, 1.0)) for _ in range(120)]
    e_jax = float(np.mean(es)) / nvars
    assert e_cpp == pytest.approx(e_jax, abs=0.05), (e_cpp, e_jax)
