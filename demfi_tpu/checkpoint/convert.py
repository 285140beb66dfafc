"""PyTorch .pt <-> Flax parameter conversion.

The released DeMFI checkpoint (``DeMFInet_exp1_latest.pt``,
/root/reference/DeMFInet_exp1/info.txt) stores a torch state dict under
``state_dict_Model`` (main.py:269). Our Flax modules mirror the torch
attribute names with list indices flattened (``RDBs.3`` -> ``RDBs_3``), so
conversion is mechanical:

  torch key                      flax path
  FF_RDB_Module.RDBs.3.convs.2.conv.0.weight
     -> params/FF_RDB_Module/RDBs_3/convs_2/conv_0/kernel   (OIHW->HWIO)
  Dec_first.weight  (Conv3d [O,I,1,kH,kW], temporal extent 1)
     -> params/Dec_first/kernel                             (squeeze T, ->HWIO)
  *.bias -> */bias                                          (unchanged)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """('FF_RDB_Module.RDBs.3.LFF.weight') ->
    (('FF_RDB_Module', 'RDBs_3', 'LFF'), 'kernel')."""
    parts = key.split(".")
    leaf = parts.pop()
    if leaf == "weight":
        leaf = "kernel"
    elif leaf != "bias":
        raise ValueError(f"unexpected torch leaf {leaf!r} in {key!r}")
    merged = []
    for p in parts:
        if re.fullmatch(r"\d+", p):
            if not merged:
                raise ValueError(f"leading index in {key!r}")
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged), leaf


def flax_path_to_torch_key(path: Tuple[str, ...], module_index_names=None) -> str:
    """Inverse of :func:`torch_key_to_flax_path` for known list containers."""
    # containers that are lists in the torch model: trailing _N splits back
    list_prefixes = ("RDBs", "convs", "conv", "GFF", "UPNet",
                     "feature_extraction", "Decoder_res", "Decoder_res_2")
    parts = []
    for p in path[:-1]:
        m = re.fullmatch(r"(.*)_(\d+)", p)
        if m and m.group(1) in list_prefixes:
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(p)
    leaf = "weight" if path[-1] == "kernel" else path[-1]
    return ".".join(parts + [leaf])


def _weight_to_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight -> flax kernel.

    Conv2d [O, I, kH, kW] -> [kH, kW, I, O]; Conv3d with temporal extent 1
    [O, I, 1, kH, kW] -> squeeze -> [kH, kW, I, O] (the model folds frames
    into batch, models/demfi.py).
    """
    if w.ndim == 5:
        if w.shape[2] != 1:
            raise ValueError(f"only temporal-extent-1 Conv3d supported, got {w.shape}")
        w = w[:, :, 0]
    if w.ndim != 4:
        raise ValueError(f"unexpected conv weight rank {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))


def _kernel_to_weight(k: np.ndarray, conv3d: bool) -> np.ndarray:
    w = np.transpose(k, (3, 2, 0, 1))
    if conv3d:
        w = w[:, :, None]
    return w


# torch modules that are Conv3d in the reference (DeMFInet.py:30-34,532-533)
_CONV3D_PREFIXES = ("Dec_first.", "Decoder_res.", "Dec_last1.", "Dec_last2.")


def convert_torch_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state dict (tensors or ndarrays) -> flax variables dict
    {'params': nested}."""
    root: Dict[str, Any] = {}
    for key, val in sd.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach")
                         else val)
        path, leaf = torch_key_to_flax_path(key)
        if leaf == "kernel":
            arr = _weight_to_kernel(arr)
        node = root
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr.astype(np.float32)
    return {"params": root}


def flax_to_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse conversion (for exporting to the reference format)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        for name, val in node.items():
            if isinstance(val, Mapping):
                walk(val, path + (name,))
            else:
                key = flax_path_to_torch_key(path + (name,))
                arr = np.asarray(val)
                if name == "kernel":
                    conv3d = any(key.startswith(p) for p in _CONV3D_PREFIXES)
                    arr = _kernel_to_weight(arr, conv3d)
                out[key] = arr

    walk(variables["params"], ())
    return out


def load_pt_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pt checkpoint -> (flax variables, metadata).

    Accepts either the combined training checkpoint (main.py:254-271) or a
    bare state dict. Requires torch (CPU build is fine) only at call time.
    """
    import torch  # local import: torch is optional at runtime

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict_Model" in ckpt:
        sd = ckpt["state_dict_Model"]
        meta = {k: v for k, v in ckpt.items()
                if not k.startswith("state_dict")}
    else:
        sd, meta = ckpt, {}
    return convert_torch_state_dict(sd), meta
