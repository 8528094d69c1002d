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
        for compact in (False, True):
            dev = np.asarray(device_kernel_map(
                jnp.asarray(coords), jnp.asarray(coords), jnp.asarray(offs),
                jnp.ones((N,), jnp.float32), jnp.ones((N,), jnp.float32),
                sentinel=N, method=method, compact=compact))
            np.testing.assert_array_equal(
                dev, host, err_msg=f"{method} compact={compact}")


def test_matches_host_3d(rng):
    _compare(rng, 3, 8, 120)


def test_matches_host_6d(rng):
    _compare(rng, 6, 4, 80)


class TestSplitProbe:
    """Separable SRC/TGT probe == full 6-D probe == host builder."""

    def _compare_split(self, coords, out_coords, chains, stride=1):
        offs6 = hypercube_offsets(3, 6, stride)
        offs3 = hypercube_offsets(3, 3, stride)
        host, _ = build_kernel_map(coords, out_coords, offs6)
        N, M = len(coords), len(out_coords)
        from gmf_tpu.sparse.device_maps import device_kernel_map_split

        for compact in (False, True):
            dev = np.asarray(device_kernel_map_split(
                jnp.asarray(coords), jnp.asarray(out_coords),
                jnp.asarray(offs3), jnp.asarray(offs3),
                jnp.ones((N,), jnp.float32), jnp.ones((M,), jnp.float32),
                sentinel=N, chains=chains, compact=compact))
            np.testing.assert_array_equal(
                dev, host, err_msg=f"compact={compact}")

    def test_unique_src_level0(self, rng):
        # level-0 correspondence coords: src part unique by construction
        src = np.unique(rng.randint(0, 6, (90, 3)).astype(np.int32), axis=0)
        tgt = rng.randint(0, 6, (len(src), 3)).astype(np.int32)
        coords = np.concatenate([src, tgt], axis=1)
        self._compare_split(coords, coords, chains=1)

    def test_duplicate_src_chains(self, rng):
        # coarse-level-like coords: several 6-D voxels share a src part
        src = rng.randint(0, 3, (120, 3)).astype(np.int32)
        tgt = rng.randint(0, 8, (120, 3)).astype(np.int32)
        coords = np.unique(np.concatenate([src, tgt], axis=1), axis=0)
        mult = np.unique(coords[:, :3], axis=0, return_counts=True)[1].max()
        chains = -(-int(mult) // 3)
        assert chains >= 2, "fixture must actually exercise duplicates"
        self._compare_split(coords, coords, chains=chains)

    def test_overflow_falls_back_exact(self, rng):
        # chains too small for the multiplicity -> in-graph sorted fallback
        src = np.zeros((40, 3), np.int32)  # ALL rows share one src part
        tgt = np.unique(rng.randint(0, 12, (40, 3)).astype(np.int32), axis=0)
        coords = np.concatenate([src[: len(tgt)], tgt], axis=1)
        self._compare_split(coords, coords, chains=1)

    def test_high_chains(self, rng):
        # coarse-level multiplicity >3: chains in (4..8] must still be
        # exact (the chains cap was raised so these levels stay on the
        # split path instead of the 27x-more-queries full probe)
        src = rng.randint(0, 2, (160, 3)).astype(np.int32)
        tgt = rng.randint(0, 12, (160, 3)).astype(np.int32)
        coords = np.unique(np.concatenate([src, tgt], axis=1), axis=0)
        mult = np.unique(coords[:, :3], axis=0, return_counts=True)[1].max()
        chains = -(-int(mult) // 3)
        assert chains >= 4, f"fixture multiplicity too low ({mult})"
        self._compare_split(coords, coords, chains=chains)

    def test_compact_unfittable_falls_back_exact(self, rng):
        # compact=True with coordinates whose packed keys exceed int32:
        # the in-graph key_fits check must route to the exact sorted path
        from gmf_tpu.sparse.device_maps import device_kernel_map_split

        src = np.unique(rng.randint(0, 2000, (60, 3)).astype(np.int32),
                        axis=0)  # 2000^3 ~ 8e9 >> 2^31: does not fit
        tgt = rng.randint(0, 6, (len(src), 3)).astype(np.int32)
        coords = np.concatenate([src, tgt], axis=1)
        offs6 = hypercube_offsets(3, 6, 1)
        offs3 = hypercube_offsets(3, 3, 1)
        host, _ = build_kernel_map(coords, coords, offs6)
        N = len(coords)
        dev = np.asarray(device_kernel_map_split(
            jnp.asarray(coords), jnp.asarray(coords),
            jnp.asarray(offs3), jnp.asarray(offs3),
            jnp.ones((N,), jnp.float32), jnp.ones((N,), jnp.float32),
            sentinel=N, chains=1, compact=True))
        np.testing.assert_array_equal(dev, host)

    def test_rectangular_down_map(self, rng):
        src = np.unique(rng.randint(0, 8, (100, 3)).astype(np.int32), axis=0)
        tgt = rng.randint(0, 8, (len(src), 3)).astype(np.int32)
        coords = np.concatenate([src, tgt], axis=1)
        from gmf_tpu.sparse.kernel_map import downsample_coords

        coarse = downsample_coords(coords, 2, 1)
        offs6 = hypercube_offsets(3, 6, 1)
        offs3 = hypercube_offsets(3, 3, 1)
        host, _ = build_kernel_map(coords, coarse, offs6)
        from gmf_tpu.sparse.device_maps import device_kernel_map_split

        mult = np.unique(coords[:, :3], axis=0, return_counts=True)[1].max()
        dev = np.asarray(device_kernel_map_split(
            jnp.asarray(coords), jnp.asarray(coarse),
            jnp.asarray(offs3), jnp.asarray(offs3),
            jnp.ones((len(coords),), jnp.float32),
            jnp.ones((len(coarse),), jnp.float32),
            sentinel=len(coords), chains=-(-int(mult) // 3)))
        np.testing.assert_array_equal(dev, host)


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
