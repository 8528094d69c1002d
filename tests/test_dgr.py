"""DGR+GMF engine tests: 6D rotation param, SE(3) refinement, pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.models.dgr import (
    ortho6d_to_rotation, se3_refine, DGRConfig, DeepGlobalRegistration,
)
from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays
from gmf_tpu.sparse.kernel_map import build_pyramid


def rand_rot(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


class TestOrtho6D:
    def test_roundtrip(self, rng):
        R = rand_rot(rng)
        poses = np.concatenate([R[:, 0], R[:, 1]])[None].astype(np.float32)
        R2 = np.asarray(ortho6d_to_rotation(jnp.asarray(poses)))[0]
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_always_proper_rotation(self, rng):
        poses = jnp.asarray(rng.randn(16, 6), jnp.float32)
        R = np.asarray(ortho6d_to_rotation(poses))
        dets = np.linalg.det(R)
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


class TestSE3Refine:
    def test_refines_noisy_init(self, rng):
        N = 400
        src = rng.rand(N, 3).astype(np.float32) * 2
        R = rand_rot(rng)
        t = np.array([0.3, -0.1, 0.2], np.float32)
        tgt = src @ R.T + t + 0.002 * rng.randn(N, 3).astype(np.float32)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3], T_gt[:3, 3] = R, t
        # Perturbed init
        d = 0.1
        Rp = np.array([[np.cos(d), -np.sin(d), 0],
                       [np.sin(d), np.cos(d), 0], [0, 0, 1]], np.float32)
        T0 = T_gt.copy()
        T0[:3, :3] = Rp @ R
        T0[:3, 3] += 0.05
        w = np.ones(N, np.float32)
        T, loss, iters = se3_refine(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w),
            jnp.asarray(T0), max_iter=500)
        T = np.asarray(T)
        assert int(iters) > 0
        np.testing.assert_allclose(T[:3, :3], R, atol=5e-3)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-2)

    def test_ignores_zero_weight_outliers(self, rng):
        N = 300
        src = rng.rand(N, 3).astype(np.float32)
        R = rand_rot(rng)
        t = np.zeros(3, np.float32)
        tgt = src @ R.T
        tgt[:100] = rng.rand(100, 3)  # corrupt, but zero weight
        w = np.ones(N, np.float32)
        w[:100] = 0.0
        T0 = np.eye(4, dtype=np.float32)
        T, loss, _ = se3_refine(jnp.asarray(src), jnp.asarray(tgt),
                                jnp.asarray(w), jnp.asarray(T0),
                                max_iter=800)
        np.testing.assert_allclose(np.asarray(T)[:3, :3], R, atol=2e-2)


def tiny_engine(rng_key=0, feat_type="ones", **engine_kw):
    """DGR engine with tiny nets + tiny buckets for CPU tests."""
    from gmf_tpu.models.dgr import inlier_input_feature_dim

    fcgf_dim = 8
    in_ch = inlier_input_feature_dim(feat_type, fcgf_dim)
    fcgf = SparseResUNet2(in_channels=1, out_channels=fcgf_dim, dim=3,
                          conv1_kernel_size=3, normalize_feature=True,
                          channels=(4, 8, 16, 32), tr_channels=(8, 8, 8, 16))
    inlier = SparseResUNet2(in_channels=in_ch, out_channels=1, dim=6,
                            conv1_kernel_size=3, with_gmf_fusion=True,
                            image_dim=16, channels=(4, 8, 16, 32),
                            tr_channels=(8, 8, 8, 16))
    cfg = DGRConfig(voxel_size=0.1, voxel_cap_granule=256,
                    corr_cap_granule=256, safeguard_ransac_iters=1024,
                    image_hw=(16, 16), inlier_feature_type=feat_type)

    rng = np.random.RandomState(5)
    coords = np.unique(rng.randint(0, 10, (80, 3)).astype(np.int32), axis=0)
    pyr = build_pyramid(coords, 4, conv1_kernel_size=3, granule=256)
    arrays = pyramid_to_arrays(pyr)
    fv = fcgf.init(jax.random.PRNGKey(rng_key),
                   jnp.ones((pyr.levels[0].cap, 1)), arrays)

    coords6 = np.unique(rng.randint(0, 6, (60, 6)).astype(np.int32), axis=0)
    pyr6 = build_pyramid(coords6, 4, conv1_kernel_size=3, granule=256)
    arrays6 = pyramid_to_arrays(pyr6)
    img = jnp.zeros((1, 16, 16, 3))
    iv = inlier.init(jax.random.PRNGKey(rng_key + 1),
                     jnp.ones((pyr6.levels[0].cap, in_ch)), arrays6,
                     p_image=img, q_image=img)
    return DeepGlobalRegistration(fv, iv, cfg, fcgf_model=fcgf,
                                  inlier_model=inlier, fcgf_dim=fcgf_dim,
                                  **engine_kw)


class TestDGREngine:
    def test_register_end_to_end_mechanics(self, rng):
        engine = tiny_engine()
        xyz0 = rng.rand(300, 3).astype(np.float32)
        ang = 0.3
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        xyz1 = xyz0 @ R.T + np.array([0.2, 0.0, 0.1], np.float32)
        img = np.zeros((1, 16, 16, 3), np.float32)
        res = engine.register(xyz0, xyz1, img, img)
        assert res["trans"].shape == (4, 4)
        assert np.all(np.isfinite(res["trans"]))
        assert res["weights"].ndim == 1

    def test_frag_cache_bit_identical_and_hits(self, rng):
        """The per-fragment cache changes nothing but the work done:
        pairs over shared fragments produce bit-identical results, and
        repeated fragments hit the cache."""
        eng_plain = tiny_engine()
        eng_cache = tiny_engine(frag_cache_bytes=64 << 20)
        ang = 0.25
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        frags = {name: rng.rand(250, 3).astype(np.float32)
                 for name in "ABC"}
        frags["B"] = frags["A"] @ R.T + np.float32([0.2, 0.0, 0.1])
        img = np.zeros((1, 16, 16, 3), np.float32)
        pairs = [("A", "B"), ("A", "C"), ("B", "C")]
        for a, b in pairs:
            r0 = eng_plain.register(frags[a], frags[b], img, img)
            r1 = eng_cache.register(frags[a], frags[b], img, img,
                                    cache_key0=a, cache_key1=b)
            assert np.array_equal(r0["trans"], r1["trans"])
            assert np.array_equal(r0["weights"], r1["weights"])
            assert np.array_equal(r0["corres"][0], r1["corres"][0])
            assert np.array_equal(r0["corres"][1], r1["corres"][1])
        # (A,B) misses both; (A,C) hits A; (B,C) hits B and C
        assert eng_cache.frag_cache_hits == 3
        # budget eviction: a tiny budget keeps the cache bounded
        eng_small = tiny_engine(frag_cache_bytes=1)
        for a, b in pairs:
            eng_small.register(frags[a], frags[b], img, img,
                               cache_key0=a, cache_key1=b)
        assert len(eng_small._frag_cache) <= 1

    def test_safeguard_recovers_transform(self, rng):
        engine = tiny_engine()
        src = rng.rand(400, 3).astype(np.float32) * 2
        R = rand_rot(rng)
        t = np.array([0.1, 0.4, -0.2], np.float32)
        tgt = src @ R.T + t
        # corrupt 60%
        idx = rng.choice(400, 240, replace=False)
        tgt[idx] = rng.rand(240, 3) * 2
        T = engine.safeguard_registration(src, tgt)
        np.testing.assert_allclose(T[:3, :3], R, atol=2e-2)
        np.testing.assert_allclose(T[:3, 3], t, atol=3e-2)


class TestInlierFeatureTypes:
    """The three inlier-feature modes
    (ref core/deep_global_registration.py:236-246)."""

    def test_feature_generation_semantics(self, rng):
        from gmf_tpu.models.dgr import inlier_input_features

        pts0 = rng.rand(20, 3).astype(np.float32)
        pts1 = rng.rand(30, 3).astype(np.float32)
        F0 = rng.randn(20, 8).astype(np.float32)
        F1 = rng.randn(30, 8).astype(np.float32)
        idx0 = np.arange(20)
        idx1 = rng.randint(0, 30, 20)

        ones = np.asarray(inlier_input_features(
            "ones", pts0, pts1, F0, F1, idx0, idx1))
        np.testing.assert_array_equal(ones, np.ones((20, 1), np.float32))

        feats = np.asarray(inlier_input_features(
            "feats", pts0, pts1, F0, F1, idx0, idx1))
        np.testing.assert_allclose(
            feats, np.concatenate([F0[idx0], F1[idx1]], 1), atol=1e-6)

        coords = np.asarray(inlier_input_features(
            "coords", pts0, pts1, F0, F1, idx0, idx1))
        np.testing.assert_allclose(
            coords, np.concatenate([np.cos(pts0[idx0]),
                                    np.cos(pts1[idx1])], 1), atol=1e-6)

    def test_feature_dim(self):
        from gmf_tpu.models.dgr import inlier_input_feature_dim

        assert inlier_input_feature_dim("ones") == 1
        assert inlier_input_feature_dim("coords") == 6
        assert inlier_input_feature_dim("feats", 32) == 64
        import pytest

        with pytest.raises(ValueError):
            inlier_input_feature_dim("bogus")

    def test_register_with_coords_and_feats_modes(self, rng):
        xyz0 = rng.rand(250, 3).astype(np.float32)
        ang = 0.3
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        xyz1 = xyz0 @ R.T + np.array([0.2, 0.0, 0.1], np.float32)
        img = np.zeros((1, 16, 16, 3), np.float32)
        for ft in ("coords", "feats"):
            engine = tiny_engine(feat_type=ft)
            res = engine.register(xyz0, xyz1, img, img)
            assert res["trans"].shape == (4, 4), ft
            assert np.all(np.isfinite(res["trans"])), ft

    def test_feature_mode_changes_logits(self, rng):
        """The config field must actually reach the net: different modes
        on identically-seeded nets give different logits."""
        xyz0 = rng.rand(200, 3).astype(np.float32)
        xyz1 = xyz0 + 0.03
        img = np.zeros((1, 16, 16, 3), np.float32)
        outs = {}
        for ft in ("ones", "coords"):
            engine = tiny_engine(feat_type=ft)
            outs[ft] = engine.register(xyz0, xyz1, img, img)["weights"]
        assert not np.allclose(outs["ones"], outs["coords"])


class TestICPPolish:
    def test_icp_runs_on_full_clouds(self, rng, monkeypatch):
        """ICP polish must target the FULL voxelized clouds, not the
        matched subset (ref :286-289, 398-406)."""
        import gmf_tpu.models.dgr as dgr_mod

        engine = tiny_engine()
        engine.config.use_icp = True
        xyz0 = rng.rand(300, 3).astype(np.float32)
        xyz1 = (np.concatenate([xyz0, rng.rand(150, 3)], 0)
                .astype(np.float32) + np.array([0.1, 0, 0], np.float32))
        img = np.zeros((1, 16, 16, 3), np.float32)

        calls = {}
        real_icp = dgr_mod.icp_refine

        def spy(src, tgt, T, **kw):
            calls["src_n"] = src.shape[0]
            calls["tgt_n"] = tgt.shape[0]
            return real_icp(src, tgt, T, **kw)

        monkeypatch.setattr(dgr_mod, "icp_refine", spy)
        res = engine.register(xyz0, xyz1, img, img)
        assert np.all(np.isfinite(res["trans"]))
        # the target must be the whole voxelized cloud 1 — strictly more
        # points than the matched subset (which is capped at len(cloud0))
        assert calls["tgt_n"] > calls["src_n"]

    def test_full_cloud_icp_beats_subset_icp(self, rng):
        """Divergence proof: when matches only cover half the scene,
        per-iteration NN over the full target can correct a coarse pose;
        NN restricted to the matched subset cannot."""
        from gmf_tpu.geometry.icp import icp_refine

        rngl = np.random.RandomState(3)
        # target: dense ring; matched subset: one side only, with a bias
        theta = rngl.rand(600).astype(np.float32) * 2 * np.pi
        full = np.stack([np.cos(theta), np.sin(theta),
                         0.1 * rngl.rand(600).astype(np.float32)], 1)
        src = full[full[:, 0] > 0.3][:150]
        # subset target: the matched points shifted by a consistent bias
        subset_tgt = src + np.array([0.05, 0.02, 0.0], np.float32)
        T0 = np.eye(4, dtype=np.float32)
        T_full = np.asarray(icp_refine(
            jnp.asarray(src), jnp.asarray(full), jnp.asarray(T0),
            max_corr_dist=0.2, num_iters=20))
        T_sub = np.asarray(icp_refine(
            jnp.asarray(src), jnp.asarray(subset_tgt), jnp.asarray(T0),
            max_corr_dist=0.2, num_iters=20))
        # subset ICP locks onto the biased matches; full-cloud ICP snaps
        # to the true surface — the two polishes disagree materially
        assert np.linalg.norm(T_full[:3, 3] - T_sub[:3, 3]) > 0.01


class TestFPFHVariant:
    def test_register_with_fpfh_descriptor(self, rng):
        """The fpfh-variant deltas (SURVEY §2.4): descriptor swap only."""
        engine = tiny_engine()
        engine.config.descriptor = "fpfh"
        xyz0 = rng.rand(200, 3).astype(np.float32)
        xyz1 = xyz0 + np.array([0.05, 0, 0], np.float32)
        img = np.zeros((1, 16, 16, 3), np.float32)
        res = engine.register(xyz0, xyz1, img, img)
        assert np.all(np.isfinite(res["trans"]))
