"""Import reference PyTorch checkpoints (.pth) into uaps-tpu params.

The reference ships trained checkpoints (e.g. UAPS_NEU_10P.pth, loaded by
the testing notebooks — UAPS-Testing.ipynb cell 4); this converter maps a
torch `state_dict` of the reference's UNet / UNet_UAPS / UNet_CCT /
UNet_UCC family onto our Flax param + batch_stats trees so existing
checkpoints evaluate directly on TPU.

Layout translation:
  conv weight  [out, in, kh, kw]  ->  kernel [kh, kw, in, out]
  BN weight/bias                  ->  scale/bias (params)
  BN running_mean/var             ->  batch_stats mean/var
Name translation handles the reference's nn.Sequential indices
(conv_conv.{0,1,4,5}) and DataParallel's 'module.' prefix.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _convblock(prefix: str):
    """flax ConvBlock subtree <- torch conv_conv Sequential indices."""
    return {
        "Conv_0": f"{prefix}.conv_conv.0",
        "BatchNorm_0": f"{prefix}.conv_conv.1",
        "Conv_1": f"{prefix}.conv_conv.4",
        "BatchNorm_1": f"{prefix}.conv_conv.5",
    }


def _encoder(prefix: str = "encoder"):
    m = {"in_conv": _convblock(f"{prefix}.in_conv")}
    for i in range(1, 5):
        m[f"down{i}"] = {
            "ConvBlock_0": _convblock(
                f"{prefix}.down{i}.maxpool_conv.1")}
    return m


def _decoder(prefix: str):
    m = {}
    for i in range(1, 5):
        m[f"up{i}"] = {
            "Conv_0": f"{prefix}.up{i}.conv1x1",
            "ConvBlock_0": _convblock(f"{prefix}.up{i}.conv"),
        }
    m["out_conv"] = f"{prefix}.out_conv"
    return m


def _ds_decoder(prefix: str):
    """Decoder_mcps (m_unet.py:156-210): _decoder plus the multi-scale
    deep-supervision heads. The reference also declares out_conv_dp4 but
    never calls it (dead code, omitted here — ARCHITECTURE.md deviation);
    load_state_dict(strict=False) tolerates it in either direction."""
    m = _decoder(prefix)
    for i in (1, 2, 3):
        m[f"out_conv_dp{i}"] = f"{prefix}.out_conv_dp{i}"
    return m


def _model_map(flax_params) -> Dict:
    """Name map keyed by the top-level flax modules present."""
    m = {}
    for top in flax_params:
        if top == "encoder":
            m["encoder"] = _encoder()
        elif top == "decoder":
            m["decoder"] = _decoder("decoder")
        elif top == "main_decoder":
            sub = flax_params[top]
            if "out_conv_dp1" in sub:
                # DeepSupervisionUNet (UNet_f/g/h, the CPS net): the
                # torch module is named 'decoder' (m_unet.py:277)
                m[top] = _ds_decoder("decoder")
            else:
                m[top] = _decoder("main_decoder")
        elif top.startswith("aux_decoder"):
            m[top] = _decoder(top)
        else:
            raise ValueError(f"no torch mapping for module {top!r}")
    return m


def _strip_module(sd: Dict) -> Dict:
    """Remove DataParallel's 'module.' prefix (UAPS_model.py:13)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def convert_state_dict(state_dict: Dict, flax_params,
                       flax_batch_stats) -> Tuple[Dict, Dict]:
    """(params, batch_stats) trees with values from the torch state_dict.

    `state_dict` values may be torch tensors or numpy arrays.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in _strip_module(state_dict).items()}
    name_map = _model_map(flax_params)

    def conv_kernel(t):  # OIHW -> HWIO
        return np.transpose(t, (2, 3, 1, 0)).copy()

    def fill_params(sub_map, sub_params):
        out = {}
        for k, v in sub_params.items():
            entry = sub_map[k]
            if isinstance(v, dict) and "kernel" in v:       # Conv
                out[k] = {"kernel": conv_kernel(sd[f"{entry}.weight"]),
                          "bias": sd[f"{entry}.bias"]}
            elif isinstance(v, dict) and "scale" in v:      # BatchNorm
                out[k] = {"scale": sd[f"{entry}.weight"],
                          "bias": sd[f"{entry}.bias"]}
            else:                                           # nested module
                out[k] = fill_params(entry, v)
        return out

    def fill_stats(sub_map, sub_stats):
        out = {}
        for k, v in sub_stats.items():
            entry = sub_map[k]
            if isinstance(v, dict) and "mean" in v:         # BN stats
                out[k] = {"mean": sd[f"{entry}.running_mean"],
                          "var": sd[f"{entry}.running_var"]}
            else:
                out[k] = fill_stats(entry, v)
        return out

    params = {k: fill_params(name_map[k], v) for k, v in flax_params.items()}
    stats = {k: fill_stats(name_map[k], v)
             for k, v in flax_batch_stats.items()}
    return params, stats


def export_state_dict(flax_params, flax_batch_stats) -> Dict:
    """Inverse of convert_state_dict: our trees -> a torch-named
    state_dict (numpy values) loadable by the reference models, so
    TPU-trained weights evaluate in the original PyTorch notebooks."""
    name_map = _model_map(flax_params)
    out: Dict[str, np.ndarray] = {}

    def conv_kernel(t):  # HWIO -> OIHW
        return np.transpose(np.asarray(t), (3, 2, 0, 1)).copy()

    def walk_params(sub_map, sub_params):
        for k, v in sub_params.items():
            entry = sub_map[k]
            if isinstance(v, dict) and "kernel" in v:       # Conv
                out[f"{entry}.weight"] = conv_kernel(v["kernel"])
                out[f"{entry}.bias"] = np.asarray(v["bias"])
            elif isinstance(v, dict) and "scale" in v:      # BatchNorm
                out[f"{entry}.weight"] = np.asarray(v["scale"])
                out[f"{entry}.bias"] = np.asarray(v["bias"])
            else:
                walk_params(entry, v)

    def walk_stats(sub_map, sub_stats):
        for k, v in sub_stats.items():
            entry = sub_map[k]
            if isinstance(v, dict) and "mean" in v:
                out[f"{entry}.running_mean"] = np.asarray(v["mean"])
                out[f"{entry}.running_var"] = np.asarray(v["var"])
                out[f"{entry}.num_batches_tracked"] = np.asarray(
                    0, np.int64)
            else:
                walk_stats(entry, v)

    for k, v in flax_params.items():
        walk_params(name_map[k], v)
    for k, v in flax_batch_stats.items():
        walk_stats(name_map[k], v)
    return out


def save_pth(path: str, flax_params, flax_batch_stats, extra=None):
    """Write a torch-loadable checkpoint of our weights."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(flax_params, flax_batch_stats).items()}
    blob = {"state_dict": sd}
    if extra:
        blob.update(extra)
    torch.save(blob, path)


def load_pth(path: str, flax_params, flax_batch_stats):
    """Load a reference checkpoint file. Accepts both raw state_dicts and
    the reference's training dicts ({'state_dict': ..., 'optimizer': ...},
    UAPS_train.py:442-450)."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_state_dict(sd, flax_params, flax_batch_stats)
