"""Device-mesh construction.

The reference has no distributed support at all (SURVEY §2: no
torch.distributed/NCCL/MPI anywhere); this module is green-field TPU design:
a 2-axis ``jax.sharding.Mesh`` — ``dp`` for independent serving streams,
``tp`` for tensor-parallel sharding of the LM — laid out so ``tp`` rides the
fastest ICI dimension.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def make_mesh(
    tp: int = 1, dp: int | None = None, devices: list | None = None
) -> Mesh:
    """Build a (dp, tp) mesh over ``devices`` (default: all local devices).

    ``tp`` is the minor (fastest-varying) axis so tensor-parallel collectives
    stay between ICI neighbors.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"dp*tp={dp * tp} exceeds {n} devices")
    if dp * tp < n:
        # legitimate (e.g. reserving a chip for a disaggregated vocoder) but
        # never silent: idle chips halve throughput with no other signal
        logger.warning(
            "mesh (dp=%d, tp=%d) covers %d of %d devices; %d left idle",
            dp, tp, dp * tp, n, n - dp * tp,
        )
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(tp=1, dp=1)
