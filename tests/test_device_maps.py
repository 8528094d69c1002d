"""Device kernel-map builder vs the host builder."""

import numpy as np
import jax.numpy as jnp

from gmf_tpu.sparse.device_maps import device_kernel_map
from gmf_tpu.sparse.kernel_map import build_kernel_map, hypercube_offsets


def _compare(rng, dim, extent, n):
    coords = np.unique(rng.randint(0, extent, (n, dim)).astype(np.int32),
                       axis=0)
    offs = hypercube_offsets(3, dim)
    host, _ = build_kernel_map(coords, coords, offs)
    N = len(coords)
    for method in ("hash", "sort"):
        dev = np.asarray(device_kernel_map(
            jnp.asarray(coords), jnp.asarray(coords), jnp.asarray(offs),
            jnp.ones((N,), jnp.float32), jnp.ones((N,), jnp.float32),
            sentinel=N, method=method))
        np.testing.assert_array_equal(dev, host, err_msg=method)


def test_matches_host_3d(rng):
    _compare(rng, 3, 8, 120)


def test_matches_host_6d(rng):
    _compare(rng, 6, 4, 80)


def test_padded_rows(rng):
    coords = np.unique(rng.randint(0, 6, (60, 3)).astype(np.int32), axis=0)
    n = len(coords)
    cap = n + 10
    padded = np.zeros((cap, 3), np.int32)
    padded[:n] = coords
    padded[n:] = 0  # junk that must never match
    mask = np.zeros((cap,), np.float32)
    mask[:n] = 1.0
    offs = hypercube_offsets(3, 3)
    host, _ = build_kernel_map(coords, coords, offs)
    dev = np.asarray(device_kernel_map(
        jnp.asarray(padded), jnp.asarray(padded), jnp.asarray(offs),
        jnp.asarray(mask), jnp.asarray(mask), sentinel=cap))
    # valid columns must agree (sentinel differs: cap vs n)
    host_adj = np.where(host == n, cap, host)
    np.testing.assert_array_equal(dev[:, :n], host_adj)
    # padded output columns are all sentinel
    assert np.all(dev[:, n:] == cap)
