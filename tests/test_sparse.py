"""Sparse engine tests: kernel maps and conv vs dense NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.sparse import (
    sparse_quantize, hypercube_offsets, hypercross_offsets,
    build_kernel_map, downsample_coords, build_pyramid,
    sparse_conv,
)
from gmf_tpu.sparse.conv import append_sentinel
from gmf_tpu.sparse.resunet import (
    SparseResUNet2, FCGFNet, GMFInlierNet, pyramid_to_arrays,
)


class TestVoxelize:
    def test_quantize_dedups(self, rng):
        pts = np.array([[0.01, 0.02, 0.03], [0.04, 0.01, 0.02],  # same voxel
                        [0.12, 0.0, 0.0]], np.float32)
        coords, idx = sparse_quantize(pts, voxel_size=0.05)
        assert coords.shape == (2, 3)
        assert set(map(tuple, coords)) == {(0, 0, 0), (2, 0, 0)}

    def test_packed_key_path_matches_void_unique(self, rng):
        """The fast int64-packed row-unique must be bit-identical to
        np.unique(axis=0) — order, first-occurrence indices, inverse —
        including negatives, duplicates, 6-D rows, and the huge-extent
        fallback."""
        for trial in range(12):
            d = int(rng.choice([3, 6]))
            n = int(rng.randint(0, 3000))
            x = (rng.randn(n, d) * rng.choice([5, 500])).astype(np.float64)
            g = np.floor(x / 0.05).astype(np.int32)
            ref = np.unique(g, axis=0, return_index=True,
                            return_inverse=True)
            got = sparse_quantize(x, 0.05, return_index=True,
                                  return_inverse=True)
            assert np.array_equal(got[0], ref[0].astype(np.int32))
            assert np.array_equal(got[1], ref[1])
            assert np.array_equal(got[2], ref[2])
        # extents overflowing 63 bits take the exact void fallback
        x = np.array([[0, 0, 0], [2 ** 30, 2 ** 30, 2 ** 30],
                      [-2 ** 30, 5, -2 ** 30], [0, 0, 0]], np.float64)
        ref = np.unique(np.floor(x).astype(np.int32), axis=0,
                        return_index=True, return_inverse=True)
        got = sparse_quantize(x, 1.0, return_index=True,
                              return_inverse=True)
        assert np.array_equal(got[0], ref[0].astype(np.int32))
        assert np.array_equal(got[1], ref[1])
        assert np.array_equal(got[2], ref[2])


class TestOffsets:
    def test_hypercube_counts(self):
        assert hypercube_offsets(3, 3).shape == (27, 3)
        assert hypercube_offsets(3, 6).shape == (729, 6)
        assert hypercube_offsets(5, 2).shape == (25, 2)
        # center offset is at index K//2 for odd kernels
        offs = hypercube_offsets(3, 3)
        np.testing.assert_array_equal(offs[27 // 2], [0, 0, 0])

    def test_hypercross_counts(self):
        assert hypercross_offsets(3, 3).shape == (7, 3)
        assert hypercross_offsets(3, 6).shape == (13, 6)


def dense_sparse_conv_oracle(coords, feats, offsets, W):
    """Naive O(N^2 K) oracle: out[j] = sum_k W_k^T x[i: c_i = c_j + o_k]."""
    N = len(coords)
    out = np.zeros((N, W.shape[2]))
    lut = {tuple(c): i for i, c in enumerate(coords)}
    for j in range(N):
        for k, o in enumerate(offsets):
            key = tuple(coords[j] + o)
            if key in lut:
                out[j] += feats[lut[key]] @ W[k]
    return out


class TestKernelMapAndConv:
    def test_conv_matches_oracle_3d(self, rng):
        N, Cin, Cout = 60, 8, 16
        coords = np.unique(rng.randint(0, 6, (N, 3)).astype(np.int32), axis=0)
        n = len(coords)
        feats = rng.randn(n, Cin).astype(np.float32)
        offs = hypercube_offsets(3, 3)
        W = rng.randn(27, Cin, Cout).astype(np.float32) * 0.1
        nbr, kept = build_kernel_map(coords, coords, offs)
        assert nbr.shape == (27, n)
        got = np.asarray(sparse_conv(
            append_sentinel(jnp.asarray(feats)), jnp.asarray(W),
            jnp.asarray(nbr), chunk=9))
        expect = dense_sparse_conv_oracle(coords, feats, offs, W)
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_conv_matches_oracle_6d_pruned(self, rng):
        N, Cin, Cout = 40, 4, 8
        coords = np.unique(rng.randint(0, 4, (N, 6)).astype(np.int32), axis=0)
        n = len(coords)
        feats = rng.randn(n, Cin).astype(np.float32)
        offs = hypercube_offsets(3, 6)
        W = rng.randn(729, Cin, Cout).astype(np.float32) * 0.1
        nbr, kept = build_kernel_map(coords, coords, offs, prune_empty=True)
        assert nbr.shape[0] < 729  # pruning removed empty offsets
        got = np.asarray(sparse_conv(
            append_sentinel(jnp.asarray(feats)),
            jnp.asarray(W)[jnp.asarray(kept)],
            jnp.asarray(nbr), chunk=32))
        expect = dense_sparse_conv_oracle(coords, feats, offs, W)
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_downsample_and_strided_map(self, rng):
        coords = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2], [5, 5, 5]],
                          np.int32)
        down = downsample_coords(coords, 2)
        assert set(map(tuple, down)) == {(0, 0, 0), (2, 2, 2), (4, 4, 4)}
        # stride-2 map: coarse (0,0,0) must see fine (0,0,0) and (1,1,1)
        offs = hypercube_offsets(3, 3, stride_units=1)
        nbr, _ = build_kernel_map(coords, down, offs)
        cols = nbr[:, 0]
        seen = set(cols[cols < len(coords)])
        assert 0 in seen and 1 in seen

    def test_out_of_range_no_alias(self):
        """Offset stepping outside the bounding box must MISS, not alias."""
        coords = np.array([[0, 0], [3, 3]], np.int32)  # 2-D for clarity
        offs = np.array([[-1, 0], [0, 0]], np.int32)
        nbr, _ = build_kernel_map(coords, coords, offs)
        # query (0,0)+(-1,0) = (-1,0): out of range -> sentinel (2)
        assert nbr[0, 0] == 2
        assert nbr[1, 0] == 0 and nbr[1, 1] == 1


class TestResUNet:
    def _random_cloud(self, rng, n=300, dim=3, extent=24):
        return np.unique(
            rng.randint(0, extent, (n, dim)).astype(np.int32), axis=0)

    def test_fcgf_forward_shapes(self, rng):
        coords = self._random_cloud(rng)
        pyr = build_pyramid(coords, num_levels=4, conv1_kernel_size=5,
                            granule=64)
        arrays = pyramid_to_arrays(pyr)
        cap0 = pyr.levels[0].cap
        feats = jnp.ones((cap0, 1))
        model = FCGFNet(conv1_kernel_size=5)
        variables = model.init(jax.random.PRNGKey(0), feats, arrays)
        out = model.apply(variables, feats, arrays)
        assert out.shape == (cap0, 32)
        n = pyr.levels[0].num_valid
        # normalized features on valid rows; zeros on padding
        norms = np.linalg.norm(np.asarray(out)[:n], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)

    def test_inlier_net_6d_with_fusion(self, rng):
        coords = self._random_cloud(rng, n=150, dim=6, extent=8)
        pyr = build_pyramid(coords, num_levels=4, conv1_kernel_size=3,
                            granule=64)
        arrays = pyramid_to_arrays(pyr)
        cap0 = pyr.levels[0].cap
        feats = jnp.ones((cap0, 1))
        p_img = jnp.asarray(rng.rand(1, 24, 32, 3), jnp.float32)
        model = SparseResUNet2(
            in_channels=1, out_channels=1, dim=6, conv1_kernel_size=3,
            with_gmf_fusion=True, image_dim=32,
            channels=(8, 16, 32, 64), tr_channels=(16, 16, 16, 32))
        variables = model.init(jax.random.PRNGKey(0), feats, arrays,
                               p_image=p_img, q_image=p_img)
        out = model.apply(variables, feats, arrays, p_image=p_img,
                          q_image=p_img)
        assert out.shape == (cap0, 1)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_padding_invariance(self, rng):
        """Bigger capacity buckets must not change valid-row outputs."""
        coords = self._random_cloud(rng, n=120, dim=3, extent=12)
        outs = []
        for granule in (64, 256):
            pyr = build_pyramid(coords, num_levels=4, granule=granule)
            arrays = pyramid_to_arrays(pyr)
            feats = jnp.ones((pyr.levels[0].cap, 1))
            model = FCGFNet(conv1_kernel_size=3)
            variables = model.init(jax.random.PRNGKey(7), feats, arrays)
            out = model.apply(variables, feats, arrays)
            outs.append(np.asarray(out)[: len(coords)])
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


class TestSimpleNet:
    def test_forward(self, rng):
        from gmf_tpu.sparse.simpleunet import SimpleSparseUNet

        coords = np.unique(rng.randint(0, 16, (150, 3)).astype(np.int32),
                           axis=0)
        pyr = build_pyramid(coords, 4, conv1_kernel_size=3, granule=64)
        arrays = pyramid_to_arrays(pyr)
        model = SimpleSparseUNet(in_channels=1, out_channels=8,
                                 channels=(4, 8, 16), tr_channels=(4, 8, 8),
                                 normalize_feature=True)
        feats = jnp.ones((pyr.levels[0].cap, 1))
        v = model.init(jax.random.PRNGKey(0), feats, arrays)
        out = model.apply(v, feats, arrays)
        n = pyr.levels[0].num_valid
        norms = np.linalg.norm(np.asarray(out)[:n], axis=-1)
        # a few ReLU-dead rows may stay zero under random init; the rest
        # must be unit-normalized (safe-eps normalization keeps zeros zero)
        live = norms > 1e-6
        assert live.mean() > 0.9
        np.testing.assert_allclose(norms[live], 1.0, atol=1e-3)


class TestPyramidNet:
    def test_forward_and_padding_invariance(self, rng):
        from gmf_tpu.sparse.pyramidnet import SparsePyramidNet

        coords = np.unique(rng.randint(0, 24, (250, 3)).astype(np.int32),
                           axis=0)
        outs = []
        for granule in (64, 256):
            pyr = build_pyramid(coords, 4, conv1_kernel_size=3,
                                granule=granule)
            arrays = pyramid_to_arrays(pyr)
            model = SparsePyramidNet(
                in_channels=1, out_channels=8, channels=(4, 8, 16, 16),
                tr_channels=(8, 16, 16, 16), depths=(1, 1, 1, 1),
                normalize_feature=True)
            feats = jnp.ones((pyr.levels[0].cap, 1))
            v = model.init(jax.random.PRNGKey(3), feats, arrays)
            out = model.apply(v, feats, arrays)
            n = pyr.levels[0].num_valid
            assert out.shape == (pyr.levels[0].cap, 8)
            norms = np.linalg.norm(np.asarray(out)[:n], axis=-1)
            live = norms > 1e-6
            assert live.mean() > 0.9
            np.testing.assert_allclose(norms[live], 1.0, atol=1e-3)
            np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)
            outs.append(np.asarray(out)[: len(coords)])
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)

    def test_inbn_noblock_variant(self, rng):
        from gmf_tpu.sparse.pyramidnet import SparsePyramidNet

        coords = np.unique(rng.randint(0, 16, (150, 3)).astype(np.int32),
                           axis=0)
        pyr = build_pyramid(coords, 3, conv1_kernel_size=3, granule=64)
        arrays = pyramid_to_arrays(pyr)
        model = SparsePyramidNet(
            in_channels=1, out_channels=4, channels=(4, 8, 8),
            tr_channels=(8, 8, 8), depths=(0, 0, 0), norm="inbn")
        feats = jnp.ones((pyr.levels[0].cap, 1))
        v = model.init(jax.random.PRNGKey(4), feats, arrays)
        out = np.asarray(model.apply(v, feats, arrays))
        assert np.all(np.isfinite(out))
        n = pyr.levels[0].num_valid
        assert np.abs(out[:n]).max() > 0
        np.testing.assert_allclose(out[n:], 0.0, atol=1e-6)

    def test_registry_builds_reference_presets(self, rng):
        from gmf_tpu.models.registry import load_model

        coords = np.unique(rng.randint(0, 32, (200, 3)).astype(np.int32),
                           axis=0)
        pyr = build_pyramid(coords, 4, conv1_kernel_size=3, granule=64)
        arrays = pyramid_to_arrays(pyr)
        model = load_model("PyramidNet")(in_channels=1, out_channels=32)
        feats = jnp.ones((pyr.levels[0].cap, 1))
        v = model.init(jax.random.PRNGKey(5), feats, arrays)
        out = model.apply(v, feats, arrays)
        assert out.shape == (pyr.levels[0].cap, 32)
        assert np.all(np.isfinite(np.asarray(out)))
        # deeper presets resolve too
        for name in ("PyramidNet6", "PyramidNet6NoBlock", "PyramidNet6INBN",
                     "PyramidNet8", "PyramidNet8INBN"):
            assert load_model(name) is not None


class TestTransforms:
    def test_sample_random_trans_centers(self, rng):
        from gmf_tpu.data.transforms import sample_random_trans

        pts = rng.rand(100, 3) * 5 + 3
        T = sample_random_trans(pts, rng)
        warped = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(warped.mean(0), 0.0, atol=1e-10)

    def test_jitter_and_compose(self, rng):
        from gmf_tpu.data.transforms import Compose, Jitter, InfSampler

        feats = np.zeros((50, 4))
        c = Compose([Jitter(sigma=0.01, rng=rng)])
        _, out = c(None, feats)
        assert out.std() > 0
        it = iter(InfSampler(5, seed=0))
        first10 = [next(it) for _ in range(10)]
        assert sorted(first10[:5]) == [0, 1, 2, 3, 4]
        assert sorted(first10[5:]) == [0, 1, 2, 3, 4]
