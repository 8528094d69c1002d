"""Compacted two-tier 6-D conv schedules vs the dense kernel-map conv.

The compact path (sparse/compact.py + sparse_conv_compact) must be an
exact re-ordering of the dense gather conv: same hits, same weights,
float32 accumulation in both — outputs agree to accumulation-order
tolerance through the full SparseResUNet2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmf_tpu.sparse.compact import (
    build_compact_schedule, build_compact_schedules, plan_tiles,
    schedule_row_stats, transpose_schedule)
from gmf_tpu.sparse.conv import sparse_conv, sparse_conv_compact
from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
from gmf_tpu.sparse.kernel_map import build_pyramid
from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays


def _random_map(rng, K, M, cap_in, density):
    """Dense [K, M] map with unique in-index per (offset, out) pair and
    wildly skewed per-offset occupancy (like real 6-D maps)."""
    nbr = np.full((K, M), cap_in, np.int32)
    for k in range(K):
        d = density * rng.rand() ** 3  # skew: most offsets near-empty
        hits = rng.rand(M) < d
        nbr[k, hits] = rng.choice(cap_in, size=hits.sum(), replace=False)
    return nbr


class TestScheduleExactness:
    @pytest.mark.parametrize("mode", ["flat", "rowwise"])
    def test_conv_matches_dense(self, rng, mode):
        K, M, cap_in, Cin, Cout = 27, 96, 80, 8, 16
        nbr = _random_map(rng, K, M, cap_in, density=0.5)
        counts = (nbr != cap_in).sum(axis=1)
        x = jnp.asarray(
            np.r_[rng.randn(cap_in, Cin), np.zeros((1, Cin))],
            jnp.float32)
        w = jnp.asarray(rng.randn(K, Cin, Cout), jnp.float32)

        ref = sparse_conv(x, w, jnp.asarray(nbr))
        sched = build_compact_schedule(
            jnp.asarray(nbr), counts, cap_in=cap_in, cap_out=M)
        got = sparse_conv_compact(x, w, sched, out_rows=M,
                                  scatter_mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_batched_schedules_match_single(self, rng):
        """build_compact_schedules (one fused dispatch for all maps)
        must produce bit-identical schedules to per-map
        build_compact_schedule calls, including transpose derivation."""
        jobs, singles = [], []
        for i, (K, M, cap_in, wt) in enumerate(
                [(27, 96, 80, False), (27, 64, 96, True), (9, 48, 48,
                                                           False)]):
            nbr = _random_map(rng, K, M, cap_in, density=0.4)
            counts = (nbr != cap_in).sum(axis=1)
            jobs.append((nbr, counts, cap_in, M, wt, 0.5))
            singles.append(build_compact_schedule(
                jnp.asarray(nbr), counts, cap_in=cap_in, cap_out=M,
                with_transpose=wt))
        batched = build_compact_schedules(jobs)

        def assert_sched_equal(a, b):
            assert (a["dense"] is None) == (b["dense"] is None)
            if a["dense"] is not None:
                for x, y in zip(a["dense"], b["dense"]):
                    np.testing.assert_array_equal(np.asarray(x),
                                                  np.asarray(y))
            assert len(a["groups"]) == len(b["groups"])
            for ga, gb in zip(a["groups"], b["groups"]):
                for x, y in zip(ga, gb):
                    np.testing.assert_array_equal(np.asarray(x),
                                                  np.asarray(y))

        for got, ref in zip(batched, singles):
            if isinstance(ref, tuple):
                assert isinstance(got, tuple)
                assert_sched_equal(got[0], ref[0])
                assert_sched_equal(got[1], ref[1])
            else:
                assert_sched_equal(got, ref)

    def test_dense_frac_invariance(self, rng):
        """The dense-tier threshold is a pure performance knob: any
        dense_frac must produce the same conv output (0.0 = every active
        offset dense, 9.9 = everything tiled)."""
        K, M, cap_in, Cin, Cout = 27, 96, 80, 8, 16
        nbr = _random_map(rng, K, M, cap_in, density=0.5)
        counts = (nbr != cap_in).sum(axis=1)
        x = jnp.asarray(
            np.r_[rng.randn(cap_in, Cin), np.zeros((1, Cin))],
            jnp.float32)
        w = jnp.asarray(rng.randn(K, Cin, Cout), jnp.float32)
        ref = sparse_conv(x, w, jnp.asarray(nbr))
        for frac in (0.0, 0.25, 0.5, 9.9):
            sched = build_compact_schedule(
                jnp.asarray(nbr), counts, cap_in=cap_in, cap_out=M,
                dense_frac=frac)
            got = sparse_conv_compact(x, w, sched, out_rows=M)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, err_msg=f"frac={frac}")

    def test_transpose_matches_dense_up(self, rng):
        """Up conv from the transposed schedule == dense conv on the
        inversion-scattered up map — for BOTH the fused
        with_transpose=True path (what build_pyramid_arrays_device uses)
        and the standalone transpose_schedule helper, which must stay
        bit-equivalent to it."""
        K, Mc, Mf = 27, 48, 120  # coarse out width, fine in width
        # forward (down) map: fine -> coarse, in indexes fine rows
        nbr = _random_map(rng, K, Mc, cap_in=Mf, density=0.6)
        counts = (nbr != Mf).sum(axis=1)
        down, up_fused = build_compact_schedule(
            jnp.asarray(nbr), counts, cap_in=Mf, cap_out=Mc,
            with_transpose=True)
        up = transpose_schedule(down, cap_in=Mc, cap_out=Mf)
        # the standalone helper and the fused inversion must agree
        for a, b in zip(jax.tree_util.tree_leaves(up),
                        jax.tree_util.tree_leaves(up_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # dense up map by host inversion: up[k, fine] = coarse
        up_dense = np.full((K, Mf), Mc, np.int32)
        for k in range(K):
            for c_out in range(Mc):
                f_in = nbr[k, c_out]
                if f_in != Mf:
                    up_dense[k, f_in] = c_out

        Cin, Cout = 6, 10
        x = jnp.asarray(np.r_[rng.randn(Mc, Cin), np.zeros((1, Cin))],
                        jnp.float32)
        w = jnp.asarray(rng.randn(K, Cin, Cout), jnp.float32)
        ref = sparse_conv(x, w, jnp.asarray(up_dense))
        got = sparse_conv_compact(x, w, up, out_rows=Mf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_plan_covers_all_hits(self, rng):
        counts = np.r_[rng.randint(0, 5, 20), [90, 70, 40], np.zeros(4)]
        rng.shuffle(counts)
        dense_ids, compact_ids, tiles_per = plan_tiles(
            counts.astype(np.int64), m=96, tile=32)
        assert np.all(2 * counts[dense_ids] >= 96)
        assert np.all(2 * counts[compact_ids] < 96)
        np.testing.assert_array_equal(
            tiles_per, -(-counts[compact_ids] // 32))
        covered = set(dense_ids.tolist()) | set(compact_ids.tolist())
        assert covered == set(np.nonzero(counts > 0)[0].tolist())


class TestCompactPyramid:
    def test_resunet_compact_vs_dense(self, rng):
        """Full 6-D inlier-net forward: compact pyramid == host pyramid."""
        coords = np.unique(
            rng.randint(0, 8, (400, 6)).astype(np.int32), axis=0)
        host = pyramid_to_arrays(build_pyramid(
            coords, 4, conv1_kernel_size=3, granule=64))
        cmp_arrays = build_pyramid_arrays_device(
            coords, 4, conv1_kernel_size=3, granule=64, compact_conv=True)
        assert any(k.endswith("_cmp_0") or k == "conv1_cmp"
                   for k in cmp_arrays)
        d, c = schedule_row_stats(cmp_arrays["self_cmp_0"])
        assert d + c > 0

        cap0 = host["mask_0"].shape[0]
        feats = jnp.asarray(rng.randn(cap0, 2), jnp.float32)
        feats = feats * host["mask_0"][:, None]
        model = SparseResUNet2(
            in_channels=2, out_channels=1, dim=6, conv1_kernel_size=3,
            channels=(8, 16, 32, 64), tr_channels=(16, 16, 16, 32))
        variables = model.init(jax.random.PRNGKey(0), feats, host)
        ref = model.apply(variables, feats, host)
        got = model.apply(variables, feats, cmp_arrays)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4)

    def test_grads_flow_through_compact(self, rng):
        """The DGR trainer differentiates through the inlier net — the
        compact scatter/gather path must be differentiable wrt params."""
        coords = np.unique(
            rng.randint(0, 6, (120, 6)).astype(np.int32), axis=0)
        arrays = build_pyramid_arrays_device(
            coords, 4, conv1_kernel_size=3, granule=32, compact_conv=True)
        cap0 = arrays["mask_0"].shape[0]
        feats = jnp.ones((cap0, 1), jnp.float32) * arrays["mask_0"][:, None]
        model = SparseResUNet2(
            in_channels=1, out_channels=1, dim=6, conv1_kernel_size=3,
            channels=(4, 8, 8, 8), tr_channels=(8, 8, 8, 8))
        variables = model.init(jax.random.PRNGKey(1), feats, arrays)

        def loss(params):
            out = model.apply({**variables, "params": params},
                              feats, arrays)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(np.any(np.asarray(l) != 0) for l in leaves)
