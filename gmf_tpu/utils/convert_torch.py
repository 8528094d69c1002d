"""Torch-checkpoint -> gmf_tpu parameter conversion.

The reference ships torch ``state_dict`` checkpoints (PointDSC snapshots
``model_best.pkl``, DGR ``.pth`` with both nets + config, torchvision
ResNet-34 ImageNet weights). This module maps those onto our flax trees so
released weights can be evaluated for recall parity (SURVEY.md §7 step 4).

Layout conventions:
- torch Conv1d k=1 [out, in, 1]      -> Dense kernel [in, out]
- torch Linear    [out, in]          -> Dense kernel [in, out]
- torch Conv2d    [out, in, kh, kw]  -> flax Conv kernel [kh, kw, in, out]
- torch depthwise Conv1d [C, 1, k]   -> flax Conv kernel [k, 1, C]
- torch BatchNorm weight/bias        -> params scale/bias
        running_mean/var             -> batch_stats mean/var
- LayerNorm weight/bias              -> scale/bias

Accepts dicts of numpy arrays or torch tensors (torch optional).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: np.ndarray}."""
    import torch  # CPU torch is available in the image

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items()}


def _dense(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).squeeze(-1).T
           if _np(sd[f"{name}.weight"]).ndim == 3
           else _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _conv2d(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}


def _depthwise_conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [C, 1, k]
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _bn(sd, name) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{name}.weight"]),
              "bias": _np(sd[f"{name}.bias"])}
    stats = {"mean": _np(sd[f"{name}.running_mean"]),
             "var": _np(sd[f"{name}.running_var"])}
    return params, stats


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


# ---------------------------------------------------------------------------
# ResNet-34 trunk (torchvision names -> gmf_tpu.nn.resnet)
# ---------------------------------------------------------------------------


def convert_resnet_trunk(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Convert conv1/bn1/layer1/layer2 of a torchvision ResNet(34).

    Returns (params, batch_stats) for gmf_tpu ResNet (layers=(3, 4)).
    """
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    p["conv1"] = _conv2d(sd, f"{prefix}conv1")
    p["bn1"], bs["bn1"] = _bn(sd, f"{prefix}bn1")

    for stage, blocks in (("layer1", 3), ("layer2", 4)):
        for i in range(blocks):
            src = f"{prefix}{stage}.{i}"
            dst = f"{stage}_{i}"
            blk: Dict[str, Any] = {
                "conv1": _conv2d(sd, f"{src}.conv1"),
                "conv2": _conv2d(sd, f"{src}.conv2"),
            }
            blk_bs: Dict[str, Any] = {}
            blk["bn1"], blk_bs["bn1"] = _bn(sd, f"{src}.bn1")
            blk["bn2"], blk_bs["bn2"] = _bn(sd, f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv2d(sd, f"{src}.downsample.0")
                blk["downsample_bn"], blk_bs["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            p[dst] = blk
            bs[dst] = blk_bs
    return p, bs


def convert_image_encoder(sd: Dict[str, np.ndarray], prefix: str):
    """ImageEncoder wrapper (reference: ``<prefix>backbone.<resnet>``)."""
    p, bs = convert_resnet_trunk(sd, prefix=f"{prefix}backbone.")
    return {"backbone": p}, {"backbone": bs}


# ---------------------------------------------------------------------------
# FusionLayer (reference fusion_layer.py / perceiver_io.py names)
# ---------------------------------------------------------------------------


def convert_fusion_layer(sd: Dict[str, np.ndarray], prefix: str,
                         pe: bool, depth: int = 0):
    """Map one FusionLayer/PerceiverIO block."""
    p: Dict[str, Any] = {}
    if pe:
        p["cpe"] = {
            "proj_q": _depthwise_conv1d(sd, f"{prefix}cpe.proj_q"),
            "proj_content": _depthwise_conv1d(sd, f"{prefix}cpe.proj_content"),
        }
    cab = f"{prefix}cross_attend_blocks"
    p["cross_norm_q"] = _ln(sd, f"{cab}.0.norm")
    p["cross_norm_ctx"] = _ln(sd, f"{cab}.0.norm_context")
    p["cross_attn"] = {
        "to_q": _dense(sd, f"{cab}.0.fn.to_q"),
        "to_kv": _dense(sd, f"{cab}.0.fn.to_kv"),
        "to_out": _dense(sd, f"{cab}.0.fn.to_out"),
    }
    p["cross_ff_norm"] = _ln(sd, f"{cab}.1.norm")
    p["cross_ff"] = {
        "proj_in": _dense(sd, f"{cab}.1.fn.net.0"),
        "proj_out": _dense(sd, f"{cab}.1.fn.net.2"),
    }
    for i in range(depth):
        lay = f"{prefix}layers.{i}"
        p[f"self_norm_{i}"] = _ln(sd, f"{lay}.0.norm")
        p[f"self_attn_{i}"] = {
            "to_q": _dense(sd, f"{lay}.0.fn.to_q"),
            "to_kv": _dense(sd, f"{lay}.0.fn.to_kv"),
            "to_out": _dense(sd, f"{lay}.0.fn.to_out"),
        }
        p[f"self_ff_norm_{i}"] = _ln(sd, f"{lay}.1.norm")
        p[f"self_ff_{i}"] = {
            "proj_in": _dense(sd, f"{lay}.1.fn.net.0"),
            "proj_out": _dense(sd, f"{lay}.1.fn.net.2"),
        }
    return p


# ---------------------------------------------------------------------------
# Full PointDSC model
# ---------------------------------------------------------------------------


def convert_pointdsc(sd: Dict[str, np.ndarray], num_layers: int = 12):
    """Map a GMF_PointDSC ``model_best.pkl`` state_dict onto our tree.

    Returns {"params": ..., "batch_stats": ...} ready for
    ``PointDSC().apply``.
    """
    params: Dict[str, Any] = {"sigma": _np(sd["sigma"]).reshape(1)}
    stats: Dict[str, Any] = {}

    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    enc_p["layer0"] = _dense(sd, "encoder.layer0")
    ie_p, ie_s = convert_image_encoder(sd, "encoder.image_encoder.")
    enc_p["image_encoder"] = ie_p
    enc_s["image_encoder"] = ie_s
    enc_p["fusion_layer_1"] = convert_fusion_layer(
        sd, "encoder.fusion_layer_1.", pe=False)

    for i in range(num_layers):
        pcn = f"encoder.blocks.PointCN_layer_{i}"
        enc_p[f"PointCN_layer_{i}"] = _dense(sd, f"{pcn}.0")
        bn_p, bn_s = _bn(sd, f"{pcn}.1")
        enc_p[f"PointCN_bn_{i}"] = bn_p
        enc_s[f"PointCN_bn_{i}"] = bn_s

        nl = f"encoder.blocks.NonLocal_layer_{i}"
        blk_p: Dict[str, Any] = {
            "projection_q": _dense(sd, f"{nl}.projection_q"),
            "projection_k": _dense(sd, f"{nl}.projection_k"),
            "projection_v": _dense(sd, f"{nl}.projection_v"),
            "fc_message_0": _dense(sd, f"{nl}.fc_message.0"),
            "fc_message_1": _dense(sd, f"{nl}.fc_message.3"),
            "fc_message_2": _dense(sd, f"{nl}.fc_message.6"),
            "fusion_layer_2": convert_fusion_layer(
                sd, f"{nl}.fusion_layer_2.", pe=True),
        }
        blk_s: Dict[str, Any] = {}
        blk_p["fc_message_bn0"], blk_s["fc_message_bn0"] = _bn(
            sd, f"{nl}.fc_message.1")
        blk_p["fc_message_bn1"], blk_s["fc_message_bn1"] = _bn(
            sd, f"{nl}.fc_message.4")
        enc_p[f"NonLocal_layer_{i}"] = blk_p
        enc_s[f"NonLocal_layer_{i}"] = blk_s

    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    params["classification_0"] = _dense(sd, "classification.0")
    params["classification_1"] = _dense(sd, "classification.2")
    params["classification_2"] = _dense(sd, "classification.4")

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# OANet (reference models/OANet.py:89-156, act_pos='post')
# ---------------------------------------------------------------------------


def convert_oanet(sd: Dict[str, np.ndarray], num_layers: int = 6):
    """Map an OANet state_dict onto gmf_tpu.models.oanet.OANet.

    Reference Sequential layouts (post-activation):
    - l1_1: [Conv(in,C)] + nl//2 x [Conv, CN, BN, ReLU]
    - l2:   nl//2 x OAFilter(conv1=[IN,BN,ReLU,Conv,T], conv2=[BN,ReLU,Conv],
            conv3=[T,IN,BN,ReLU,Conv])
    - l1_2: [Conv(2C,C)] + (nl//2-1) x [Conv, CN, BN, ReLU]
    - down1/up1: conv=[IN,BN,ReLU,Conv]; output: Conv(C,1).
    """
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def stack(prefix, dst, n_blocks):
        for i in range(n_blocks):
            base = 1 + 4 * i
            p[f"{dst}_conv_{i}"] = _dense(sd, f"{prefix}.{base}")
            p[f"{dst}_bn_{i}"], bs[f"{dst}_bn_{i}"] = _bn(
                sd, f"{prefix}.{base + 2}")

    p["layer0"] = _dense(sd, "l1_1.0")
    stack("l1_1", "l1_1", num_layers // 2)
    for name in ("down1", "up1"):
        blk_p: Dict[str, Any] = {"proj": _dense(sd, f"{name}.conv.3")}
        blk_bs: Dict[str, Any] = {}
        blk_p["bn"], blk_bs["bn"] = _bn(sd, f"{name}.conv.1")
        p[name] = blk_p
        bs[name] = blk_bs
    for i in range(num_layers // 2):
        oa_p: Dict[str, Any] = {
            "conv1": _dense(sd, f"l2.{i}.conv1.3"),
            "conv2": _dense(sd, f"l2.{i}.conv2.2"),
            "conv3": _dense(sd, f"l2.{i}.conv3.4"),
        }
        oa_bs: Dict[str, Any] = {}
        oa_p["bn1"], oa_bs["bn1"] = _bn(sd, f"l2.{i}.conv1.1")
        oa_p["bn2"], oa_bs["bn2"] = _bn(sd, f"l2.{i}.conv2.0")
        oa_p["bn3"], oa_bs["bn3"] = _bn(sd, f"l2.{i}.conv3.2")
        p[f"oa_{i}"] = oa_p
        bs[f"oa_{i}"] = oa_bs
    p["l1_2_in"] = _dense(sd, "l1_2.0")
    stack("l1_2", "l1_2", num_layers // 2 - 1)
    p["output"] = _dense(sd, "output")
    return {"params": p, "batch_stats": bs}


def main():
    """CLI: convert a reference torch state_dict to a gmf_tpu checkpoint
    directory (state.msgpack + config.json). The eval CLIs also accept
    .pkl/.pth directly (model_io.load_pointdsc converts on the fly) —
    this persists the conversion once.
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="torch checkpoint (.pkl/.pth state_dict)")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--model", choices=["pointdsc", "oanet"],
                    default="pointdsc")
    ap.add_argument("--num-layers", type=int, default=None)
    args = ap.parse_args()

    from gmf_tpu.utils.checkpoint import save_checkpoint

    sd = load_torch_state_dict(args.input)
    if args.model == "pointdsc":
        n = args.num_layers or 12
        variables = convert_pointdsc(sd, num_layers=n)
        # encoder.layer0 Dense kernel is [in_dim, num_channels]
        num_channels = int(np.asarray(
            variables["params"]["encoder"]["layer0"]["kernel"]).shape[-1])
        cfg = {"converted_from": args.input, "arch": "pointdsc",
               "model": {"num_layers": n, "num_channels": num_channels}}
    else:
        n = args.num_layers or 6
        variables = convert_oanet(sd, num_layers=n)
        # 'arch' guards load_pointdsc from misreading this as a PointDSC
        # checkpoint; OANet loads via convert_oanet + OANet(...) directly
        cfg = {"converted_from": args.input, "arch": "oanet",
               "model": {"arch": "oanet", "num_layers": n}}
    save_checkpoint(args.out, variables, config=cfg)
    print(f"converted {args.input} -> {args.out}")


if __name__ == "__main__":
    main()
