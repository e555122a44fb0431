"""One-time torch -> JAX weight converters (E2VID backbone, ResNet18).

Capability parity with the reference's checkpoint factory
(/root/reference/e2vid/utils/loading_utils.py:5-60: torch.load of the E2VID
``.pth.tar`` incl. the ``module.``-prefix stripper) and torchvision's
ImageNet resnet18 init of the image encoder
(models/style_networks.py:115-123 — note the 1-channel stem conv is fresh
there, NOT pretrained).

Layout conversion: torch conv kernels are OIHW, flax wants HWIO
(transpose 2,3,1,0). The ConvLSTM gates conv keeps torch's output-channel
gate order (input, forget, output, candidate) which our cell splits
identically (ess_tpu/models/layers.py ConvLSTMCell).

These run on the host once; outputs are plain pytrees you can feed to
``init_state(..., e2vid_params=...)`` or save via orbax.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t2np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_kernel(w) -> np.ndarray:
    return _t2np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Drop a leading 'module.' from DataParallel-saved keys
    (loading_utils.py:50-60)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def load_e2vid_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert an E2VID ``.pth.tar`` to (flax params pytree, arch config).

    The returned params match ``ess_tpu.models.RecurrentUNet`` with the
    checkpoint's geometry (num_encoders / base channels read from the file's
    embedded config, loading_utils.py:11-21).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    config = dict(raw.get("model", {}))
    sd = strip_module_prefix(raw["state_dict"])

    # keys are 'unetrecurrent.<...>'
    def get(name: str) -> np.ndarray:
        return sd[f"unetrecurrent.{name}"]

    num_encoders = int(config.get("num_encoders", 3))
    num_resblocks = int(config.get("num_residual_blocks", 2))

    params: Dict[str, Any] = {}
    params["head"] = {"Conv_0": {
        "kernel": _conv_kernel(get("head.conv2d.weight")),
        "bias": _t2np(get("head.conv2d.bias")),
    }}
    for i in range(num_encoders):
        gates_w = get(f"encoders.{i}.recurrent_block.Gates.weight")
        params[f"encoder_{i}"] = {
            "conv": {"Conv_0": {
                "kernel": _conv_kernel(get(f"encoders.{i}.conv.conv2d.weight")),
                "bias": _t2np(get(f"encoders.{i}.conv.conv2d.bias")),
            }},
            "rnn": {"gates": {
                "kernel": _conv_kernel(gates_w),
                "bias": _t2np(get(f"encoders.{i}.recurrent_block.Gates.bias")),
            }},
        }
    for i in range(num_resblocks):
        params[f"resblock_{i}"] = {
            "Conv_0": {
                "kernel": _conv_kernel(get(f"resblocks.{i}.conv1.weight")),
                "bias": _t2np(get(f"resblocks.{i}.conv1.bias")),
            },
            "Conv_1": {
                "kernel": _conv_kernel(get(f"resblocks.{i}.conv2.weight")),
                "bias": _t2np(get(f"resblocks.{i}.conv2.bias")),
            },
        }
    for i in range(num_encoders):
        params[f"decoder_{i}"] = {"Conv_0": {
            "kernel": _conv_kernel(get(f"decoders.{i}.conv2d.weight")),
            "bias": _t2np(get(f"decoders.{i}.conv2d.bias")),
        }}
    params["pred"] = {"Conv_0": {
        "kernel": _conv_kernel(get("pred.conv2d.weight")),
        "bias": _t2np(get("pred.conv2d.bias")),
    }}
    return params, config


def _bn(sd: Dict[str, Any], prefix: str):
    p = {"scale": _t2np(sd[f"{prefix}.weight"]),
         "bias": _t2np(sd[f"{prefix}.bias"])}
    s = {"mean": _t2np(sd[f"{prefix}.running_mean"]),
         "var": _t2np(sd[f"{prefix}.running_var"])}
    return p, s


def _basic_block(sd: Dict[str, Any], prefix: str):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = {"kernel": _conv_kernel(sd[f"{prefix}.conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    params["conv2"] = {"kernel": _conv_kernel(sd[f"{prefix}.conv2.weight"])}
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.bn2")
    if f"{prefix}.downsample.0.weight" in sd:
        params["proj_conv"] = {
            "kernel": _conv_kernel(sd[f"{prefix}.downsample.0.weight"])}
        params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def load_resnet18_torch(
    source, template_params: Dict[str, Any], template_stats: Dict[str, Any],
    *, adapt_stem: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fill a ResNet18Encoder param/stat pytree from a torch state_dict.

    ``source``: a state_dict, a path to one, or a torchvision resnet18
    module. The fresh 1-channel stem conv stays at the template's init (the
    reference trains it from scratch, style_networks.py:115); pass
    ``adapt_stem=True`` to instead average the pretrained RGB stem into one
    channel.
    """
    if isinstance(source, str):
        import torch
        source = torch.load(source, map_location="cpu", weights_only=False)
    if hasattr(source, "state_dict"):
        source = source.state_dict()
    sd = strip_module_prefix(dict(source))

    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in template_params.items()}
    stats = {k: dict(v) if isinstance(v, dict) else v
             for k, v in template_stats.items()}

    if adapt_stem and "conv1.weight" in sd:
        w = _t2np(sd["conv1.weight"]).mean(axis=1, keepdims=True)  # (64,1,7,7)
        params["stem_conv"] = {"kernel": w.transpose(2, 3, 1, 0)}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    for layer in (1, 2, 3):
        for block in (0, 1):
            p, s = _basic_block(sd, f"layer{layer}.{block}")
            params[f"layer{layer}_{block}"] = p
            stats[f"layer{layer}_{block}"] = s
    return params, stats


def load_style_encoder_torch(
    source, template_params: Dict[str, Any], template_stats: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fill a ResNet18Encoder pytree from a reference StyleEncoderE2VID
    state_dict (models/style_networks.py:110-145 naming:
    ``encoder_scale_1`` = [stem conv, bn1, relu, layer1],
    ``encoder_scale_2/3`` = layer2/3). The fresh 1-channel stem conv maps
    directly (7x7, bias-free)."""
    if isinstance(source, str):
        import torch
        source = torch.load(source, map_location="cpu", weights_only=False)
    if hasattr(source, "state_dict"):
        source = source.state_dict()
    sd = strip_module_prefix(dict(source))

    remap: Dict[str, Any] = {}
    renames = (
        ("encoder_scale_1.0.", "conv1."),
        ("encoder_scale_1.1.", "bn1."),
        ("encoder_scale_1.3.", "layer1."),
        ("encoder_scale_2.", "layer2."),
        ("encoder_scale_3.", "layer3."),
    )
    for key, value in sd.items():
        for old, new in renames:
            if key.startswith(old):
                remap[new + key[len(old):]] = value
                break
    return load_resnet18_torch(remap, template_params, template_stats,
                               adapt_stem=True)


def load_semseg_head_torch(
    source, template_params: Dict[str, Any], *, skip_connect: bool = True,
) -> Dict[str, Any]:
    """Fill a SegmentationHead param pytree from a reference SemSegE2VID
    state_dict (models/style_networks.py:9-65). Instance norms carry no
    parameters; the mapping is purely the conv stack, in both the
    skip-connect and plain variants."""
    if isinstance(source, str):
        import torch
        source = torch.load(source, map_location="cpu", weights_only=False)
    if hasattr(source, "state_dict"):
        source = source.state_dict()
    sd = strip_module_prefix(dict(source))

    def conv(prefix: str) -> Dict[str, np.ndarray]:
        out = {"kernel": _conv_kernel(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = _t2np(sd[f"{prefix}.bias"])
        return out

    def resblock(prefix: str) -> Dict[str, Any]:
        return {"Conv_0": conv(f"{prefix}.model.0"),
                "Conv_1": conv(f"{prefix}.model.3")}

    params = {k: dict(v) if isinstance(v, dict) else v
              for k, v in template_params.items()}
    if skip_connect:
        for i in range(5):
            params[f"res_{i}"] = resblock(f"decoder_scale_1.{i}")
        params["reduce"] = {"Conv_0": conv("decoder_scale_1.5.model.0")}
        params["s2_a"] = {"Conv_0": conv("decoder_scale_2.0.model.0")}
        params["s2_b"] = {"Conv_0": conv("decoder_scale_2.1.model.0")}
        params["s3_a"] = {"Conv_0": conv("decoder_scale_3.0.model.0")}
        params["s3_b"] = {"Conv_0": conv("decoder_scale_3.1.model.0")}
        params["s4"] = {"Conv_0": conv("decoder_scale_4.0.model.0")}
        params["logits"] = conv("decoder_scale_5.0")
    else:
        for i in range(3):
            params[f"res_{i}"] = resblock(f"decoder_scale_1.{i}")
        # .0 of each scale is the parameterless InterpolationLayer
        params["s2"] = {"Conv_0": conv("decoder_scale_2.1.model.0")}
        params["s3"] = {"Conv_0": conv("decoder_scale_3.1.model.0")}
        params["s4"] = {"Conv_0": conv("decoder_scale_4.1.model.0")}
        params["logits"] = conv("decoder_scale_5.0")
    return params
