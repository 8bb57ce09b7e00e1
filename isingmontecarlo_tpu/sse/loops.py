"""Directed-loop (off-diagonal) updates — reference
``src/sse/qmc_traits/directed_loop.rs``.

Placeholder: batched-walker implementation lands next milestone.
"""

from __future__ import annotations

import jax

from isingmontecarlo_tpu.sse.model import BondModel
from isingmontecarlo_tpu.sse.opstring import OpString


def loop_update(
    ops: OpString, state: jax.Array, key: jax.Array, model: BondModel
):
    raise NotImplementedError("directed-loop update: in progress")
