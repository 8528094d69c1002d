"""Torch-conversion tests: per-layer numeric parity + full-tree structure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from gmf_tpu.utils.convert_torch import (  # noqa: E402
    _dense, _conv2d, _depthwise_conv1d, _bn, _ln,
    convert_pointdsc, convert_fusion_layer,
)
from gmf_tpu.models import PointDSC  # noqa: E402
from gmf_tpu.nn.fusion import FusionLayer  # noqa: E402


class TestLayerParity:
    """Each converter unit must make flax reproduce the torch forward."""

    def test_linear(self, rng):
        lin = torch.nn.Linear(8, 5)
        x = torch.randn(3, 8)
        sd = {f"m.{k}": v for k, v in lin.state_dict().items()}
        p = _dense(sd, "m")
        got = np.asarray(jnp.asarray(x.numpy()) @ p["kernel"] + p["bias"])
        np.testing.assert_allclose(got, lin(x).detach().numpy(), atol=1e-5)

    def test_conv1d_k1_as_dense(self, rng):
        conv = torch.nn.Conv1d(6, 4, kernel_size=1)
        x = torch.randn(2, 6, 10)
        sd = {f"m.{k}": v for k, v in conv.state_dict().items()}
        p = _dense(sd, "m")
        # our layout: [B, N, C]
        got = np.asarray(
            jnp.asarray(x.numpy().transpose(0, 2, 1)) @ p["kernel"] + p["bias"])
        expect = conv(x).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_conv2d(self, rng):
        conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        x = torch.randn(1, 3, 16, 16)
        sd = {f"m.{k}": v for k, v in conv.state_dict().items()}
        p = _conv2d(sd, "m")
        fl = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False)
        got = fl.apply({"params": {"kernel": jnp.asarray(p["kernel"])}},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        expect = conv(x).detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)

    def test_depthwise_conv1d(self, rng):
        conv = torch.nn.Conv1d(6, 6, 3, padding=1, groups=6)
        x = torch.randn(2, 6, 12)
        sd = {f"m.{k}": v for k, v in conv.state_dict().items()}
        p = _depthwise_conv1d(sd, "m")
        fl = nn.Conv(6, (3,), padding="SAME", feature_group_count=6)
        got = fl.apply(
            {"params": {"kernel": jnp.asarray(p["kernel"]),
                        "bias": jnp.asarray(p["bias"])}},
            jnp.asarray(x.numpy().transpose(0, 2, 1)))
        expect = conv(x).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)

    def test_batchnorm_eval(self, rng):
        bn = torch.nn.BatchNorm1d(5)
        bn.eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.randn(5))
            bn.running_var.copy_(torch.rand(5) + 0.5)
            bn.weight.copy_(torch.randn(5))
            bn.bias.copy_(torch.randn(5))
        x = torch.randn(4, 5, 7)
        sd = {f"m.{k}": v for k, v in bn.state_dict().items()}
        params, stats = _bn(sd, "m")
        xf = jnp.asarray(x.numpy().transpose(0, 2, 1))
        got = ((xf - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-5)
               * params["scale"] + params["bias"])
        expect = bn(x).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)

    def test_layernorm(self, rng):
        ln = torch.nn.LayerNorm(9)
        with torch.no_grad():
            ln.weight.copy_(torch.randn(9))
            ln.bias.copy_(torch.randn(9))
        x = torch.randn(3, 9)
        sd = {f"m.{k}": v for k, v in ln.state_dict().items()}
        p = _ln(sd, "m")
        fl = nn.LayerNorm(epsilon=1e-5)
        got = fl.apply({"params": {"scale": jnp.asarray(p["scale"]),
                                   "bias": jnp.asarray(p["bias"])}},
                       jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), ln(x).detach().numpy(),
                                   atol=1e-5)


class TestFusionLayerTorchParity:
    """End-to-end: a torch fusion block built from primitives == our
    FusionLayer with converted weights."""

    def test_cross_attention_block(self, rng):
        dim, latent, dh = 16, 16, 8
        tq = torch.nn.Linear(latent, dh, bias=False)
        tkv = torch.nn.Linear(dim, 2 * dh, bias=False)
        tout = torch.nn.Linear(dh, dim)
        nq = torch.nn.LayerNorm(latent)
        nctx = torch.nn.LayerNorm(dim)
        nff = torch.nn.LayerNorm(latent)
        ff1 = torch.nn.Linear(latent, latent * 8)
        ff2 = torch.nn.Linear(latent * 4, latent)
        cq = torch.nn.Conv1d(latent, latent, 3, padding=1, groups=latent)
        cc = torch.nn.Conv1d(dim, dim, 3, padding=1, groups=dim)

        def torch_forward(x, data):
            # LCPE
            x = (cq(x.transpose(1, 2)).transpose(1, 2) + x)
            data = (cc(data.transpose(1, 2)).transpose(1, 2) + data)
            xn, dn = nq(x), nctx(data)
            q, kv = tq(xn), tkv(dn)
            k, v = kv.chunk(2, dim=-1)
            sim = torch.einsum("bid,bjd->bij", q, k) * (dh ** -0.5)
            attn = sim.softmax(dim=-1)
            o = torch.einsum("bij,bjd->bid", attn, v)
            x = tout(o) + x
            xn = nff(x)
            h = ff1(xn)
            h1, g = h.chunk(2, dim=-1)
            h = h1 * torch.nn.functional.gelu(g)
            return ff2(h) + x

        sd = {}
        for name, mod in [("cpe.proj_q", cq), ("cpe.proj_content", cc),
                          ("cross_attend_blocks.0.norm", nq),
                          ("cross_attend_blocks.0.norm_context", nctx),
                          ("cross_attend_blocks.0.fn.to_q", tq),
                          ("cross_attend_blocks.0.fn.to_kv", tkv),
                          ("cross_attend_blocks.0.fn.to_out", tout),
                          ("cross_attend_blocks.1.norm", nff),
                          ("cross_attend_blocks.1.fn.net.0", ff1),
                          ("cross_attend_blocks.1.fn.net.2", ff2)]:
            for k, v in mod.state_dict().items():
                sd[f"f.{name}.{k}"] = v
        params = convert_fusion_layer(sd, "f.", pe=True)
        params = jax.tree.map(jnp.asarray, params)

        layer = FusionLayer(dim=dim, latent_dim=latent, depth=0,
                            cross_heads=1, cross_dim_head=dh, pe=True)
        x = torch.randn(2, 10, latent)
        data = torch.randn(2, 7, dim)
        got = layer.apply({"params": params}, jnp.asarray(data.numpy()),
                          jnp.asarray(x.numpy()))
        expect = torch_forward(x, data).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)


class TestFullTreeStructure:
    def test_pointdsc_tree_matches(self, rng):
        """Synthesized torch state_dict converts to exactly the flax tree."""
        model = PointDSC(num_layers=2, num_channels=32, k=10)
        x = jnp.zeros((1, 40, 6))
        pts = jnp.zeros((1, 40, 3))
        img = jnp.zeros((1, 24, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, pts, pts, img, img)

        sd = synthesize_pointdsc_state_dict(num_layers=2, C=32)
        converted = convert_pointdsc(sd, num_layers=2)

        flat_ref = {"/".join(map(str, k)): v.shape for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        variables["params"])[0]}
        flat_got = {"/".join(map(str, k)): np.asarray(v).shape for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        converted["params"])[0]}

        def norm(d):
            return {k.replace("DictKey(key='", "").replace("')", ""): v
                    for k, v in d.items()}

        ref, got = norm(flat_ref), norm(flat_got)
        missing = set(ref) - set(got)
        extra = set(got) - set(ref)
        assert not missing, f"missing params: {sorted(missing)[:8]}"
        assert not extra, f"extra params: {sorted(extra)[:8]}"
        mismatched = {k: (ref[k], got[k]) for k in ref if ref[k] != got[k]}
        assert not mismatched, mismatched


def synthesize_pointdsc_state_dict(num_layers: int, C: int):
    """Random torch-style state_dict with the reference's names/shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def conv1d(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i, 1).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def dconv1d(name, c):
        sd[f"{name}.weight"] = rng.randn(c, 1, 3).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.01

    def bnorm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def lnorm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def conv2d(name, i, o, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def fusion(prefix, dim, latent, dh, pe):
        if pe:
            dconv1d(f"{prefix}cpe.proj_q", latent)
            dconv1d(f"{prefix}cpe.proj_content", dim)
        lnorm(f"{prefix}cross_attend_blocks.0.norm", latent)
        lnorm(f"{prefix}cross_attend_blocks.0.norm_context", dim)
        lin(f"{prefix}cross_attend_blocks.0.fn.to_q", latent, dh, bias=False)
        lin(f"{prefix}cross_attend_blocks.0.fn.to_kv", dim, 2 * dh, bias=False)
        lin(f"{prefix}cross_attend_blocks.0.fn.to_out", dh, dim)
        lnorm(f"{prefix}cross_attend_blocks.1.norm", latent)
        lin(f"{prefix}cross_attend_blocks.1.fn.net.0", latent, latent * 8)
        lin(f"{prefix}cross_attend_blocks.1.fn.net.2", latent * 4, latent)

    def resnet_block(prefix, i, o, downsample):
        conv2d(f"{prefix}.conv1", i, o, 3)
        bnorm(f"{prefix}.bn1", o)
        conv2d(f"{prefix}.conv2", o, o, 3)
        bnorm(f"{prefix}.bn2", o)
        if downsample:
            conv2d(f"{prefix}.downsample.0", i, o, 1)
            bnorm(f"{prefix}.downsample.1", o)

    sd["sigma"] = np.ones(1, np.float32)
    conv1d("encoder.layer0", 6, C)
    w = C // 2
    rb = "encoder.image_encoder.backbone"
    conv2d(f"{rb}.conv1", 3, w, 7)
    bnorm(f"{rb}.bn1", w)
    for i in range(3):
        resnet_block(f"{rb}.layer1.{i}", w, w, False)
    for i in range(4):
        resnet_block(f"{rb}.layer2.{i}", w if i == 0 else 2 * w, 2 * w, i == 0)
    fusion("encoder.fusion_layer_1.", C, C, C // 2, pe=False)
    for i in range(num_layers):
        conv1d(f"encoder.blocks.PointCN_layer_{i}.0", C, C)
        bnorm(f"encoder.blocks.PointCN_layer_{i}.1", C)
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        conv1d(f"{nl}.projection_q", C, C)
        conv1d(f"{nl}.projection_k", C, C)
        conv1d(f"{nl}.projection_v", C, C)
        conv1d(f"{nl}.fc_message.0", C, C // 2)
        bnorm(f"{nl}.fc_message.1", C // 2)
        conv1d(f"{nl}.fc_message.3", C // 2, C // 2)
        bnorm(f"{nl}.fc_message.4", C // 2)
        conv1d(f"{nl}.fc_message.6", C // 2, C)
        fusion(f"{nl}.fusion_layer_2.", C, C, C // 2, pe=True)
    conv1d("classification.0", C, 32)
    conv1d("classification.2", 32, 32)
    conv1d("classification.4", 32, 1)
    return sd
