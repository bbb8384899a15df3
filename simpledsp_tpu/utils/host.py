"""Host-transfer helpers.

Some TPU runtimes (notably the experimental 'axon' tunnel in this
environment) cannot DMA complex arrays device->host even though complex
compute works on device.  ``to_numpy`` is the safe universal fetch: complex
arrays are split into (real, imag) float planes ON DEVICE, transferred as
floats, and recombined on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_numpy"]


def _fetch(x) -> np.ndarray:
    if jnp.iscomplexobj(x):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    return np.asarray(x)


def to_numpy(tree):
    """Fetch an array or pytree of arrays to host numpy, routing complex
    arrays through per-plane float transfers (axon-tunnel safe)."""
    return jax.tree_util.tree_map(_fetch, tree)
