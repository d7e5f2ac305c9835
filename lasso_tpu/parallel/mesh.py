"""Device mesh construction for multi-chip Lasso proving.

The reference is single-host rayon (reference: Cargo.toml:62-69); here the
scaling axis is a 1-D `jax.sharding.Mesh` over all chips.  The hypercube
(s / lookup) axis is the shard axis everywhere:

  * sumcheck round evaluations: shard-local lazy column sums, psum of the
    16-limb partials over ICI, one Montgomery collapse on every device
  * MSM: points sharded, per-shard Pippenger, log(D) tree-combine of the
    shard partials
  * grand products: shard-local product subtrees, cross-device top tree

Cyclic (strided) sharding of the hypercube keeps every sumcheck bind local:
global index k = hi * D + d lives on device d, and binding the top variable
pairs k with k + n/2, which is congruent mod D -- no communication until the
final log(D) variables, which are a tiny replicated epilogue.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "s"


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    """1-D mesh over the first n devices.

    platform="cpu" selects the virtual CPU device pool (for sharding tests /
    dry runs on a single-chip host); None uses the default backend (TPU).
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices and platform is None:
            # single-chip host: fall back to the virtual CPU pool
            try:
                devices = jax.devices("cpu")
            except Exception:
                pass
        if len(devices) < n_devices:
            # never truncate silently: cyclic layouts prepared for n_devices
            # would be wrong on a smaller mesh
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices exist")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_leading(mesh: Mesh):
    """Sharding that splits the leading axis across the mesh."""
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
