"""TPU inference engine: t-batched whole-window forward + tiled big-frame path.

Two deliberate departures from the reference inference driver
(/root/reference/utils.py:1339-1477, main.py:733-748), both pure wins on TPU:

1. **t-batching.** The reference re-runs the entire network for each of the
   M-1 interpolation instants of a 4-frame window. Here the t-independent
   Stage I context (RDB backbone + FAC-FB, the dominant FLOPs) runs once and
   ``synthesize`` is vmapped over all t-values in a single compiled program.

2. **Deterministic tiling under jit.** For frames too large for HBM, the
   reflect-pad-to-32-multiples + 32 px halo + trim + stitch semantics of
   ``patch_forward_DeFInet_itr`` are preserved exactly (so test_patch=(1,1)
   evals match the reference bit-for-bit and tiled evals match its tiled
   output), with each distinct tile shape compiled once.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from demfi_tpu.config import DeMFIConfig
from demfi_tpu.models.demfi import DeMFINet, DeMFIOutputs


@dataclasses.dataclass
class WindowResult:
    """Outputs for one 4-frame window at a batch of t-values.

    All arrays are numpy NHWC with a leading t axis of size M-1 (even the
    t-independent ovlp is broadcast, matching per-sample reference output).
    """
    s0_prime: np.ndarray   # [T,H,W,3]
    s1_prime: np.ndarray
    st_prime: np.ndarray
    s0_final: np.ndarray   # [T,H,W,3] (last boosting iteration)
    s1_final: np.ndarray
    st_final: np.ndarray
    flow_init: np.ndarray  # [T,H,W,4]
    flow_final: np.ndarray
    occ0_init: np.ndarray  # [T,H,W,1]
    occ0_final: np.ndarray
    ovlp: np.ndarray       # [T,H,W,3]
    blend_w0: np.ndarray   # [T,H,W,1] FGAC gate maps (t-independent,
    blend_w1: np.ndarray   #           broadcast over t)
    diff_10: np.ndarray    # [T,H,W,1] FGAC difference maps
    diff_01: np.ndarray


def _pad_reflect_to_multiple(frames: np.ndarray, m: int) -> Tuple[np.ndarray, int, int]:
    """Reflect-pad H, W (bottom/right) to multiples of m
    (utils.py:1352-1365). frames: [B,T,H,W,C]."""
    h, w = frames.shape[2], frames.shape[3]
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
    return frames, h, w


def _tile_bounds(pb: int, h: int, w: int, ph: int, sh: int, pw: int, sw: int):
    """Reference get_HW_boundary (utils.py:1757-1774)."""
    h_lo = max(ph * sh - pb, 0)
    h_hi = min((ph + 1) * sh + pb, h)
    w_lo = max(pw * sw - pb, 0)
    w_hi = min((pw + 1) * sw + pb, w)
    return h_lo, h_hi, w_lo, w_hi


def _trim(img: np.ndarray, pb: int, h: int, w: int, ph: int, sh: int,
          pw: int, sw: int) -> np.ndarray:
    """Reference trim_patch_boundary (utils.py:1777-1798) in [..., H, W, C]."""
    if pb == 0:
        return img
    if ph * sh >= pb:
        img = img[..., pb:, :, :]
    if (ph + 1) * sh + pb <= h:
        img = img[..., :-pb, :, :]
    if pw * sw >= pb:
        img = img[..., :, pb:, :]
    if (pw + 1) * sw + pb <= w:
        img = img[..., :, :-pb, :]
    return img


class InferenceEngine:
    """Compiled whole-window inference for a fixed model + parameters."""

    def __init__(self, model: DeMFINet, variables, num_update: int,
                 t_chunk: Optional[int] = None):
        self.model = model
        self.variables = variables
        self.num_update = num_update
        self.t_chunk = t_chunk  # optional cap on t-values per device batch

        def forward_multi_t(variables, frames, ts):
            """frames [1,4,H,W,3]; ts [M] -> DeMFIOutputs with leading t axis."""
            ctx = model.apply(variables, frames, method=model.extract)
            def synth(t):
                return model.apply(variables, ctx, t[None, None], num_update,
                                   method=model.synthesize)
            out = jax.vmap(synth)(ts)

            # Reorder vmap output axes: per-frame fields arrive [M,1,H,W,C]
            # -> [M,H,W,C]; per-iteration stacks arrive [M,K,1,H,W,C]
            # -> [K,M,H,W,C] (iteration leading, t second — same layout as
            # the un-vmapped model with batch M).
            def sq_b(x):
                return x[:, 0]

            def iters(x):
                return x[:, :, 0].swapaxes(0, 1)

            return DeMFIOutputs(
                s0_prime=sq_b(out.s0_prime), s1_prime=sq_b(out.s1_prime),
                st_prime=sq_b(out.st_prime),
                s0_final=iters(out.s0_final), s1_final=iters(out.s1_final),
                st_final=iters(out.st_final),
                flow_preds=iters(out.flow_preds),
                occ0_preds=iters(out.occ0_preds),
                ovlp_b0b1=sq_b(out.ovlp_b0b1),
                diff_maps=tuple(sq_b(d) for d in out.diff_maps),
                blend_weights=tuple(sq_b(d) for d in out.blend_weights),
            )

        self._forward = jax.jit(forward_multi_t)

    # -------------------------------------------------------------- core
    def _run_window(self, frames: np.ndarray, ts: np.ndarray) -> DeMFIOutputs:
        out = self._forward(self.variables, jnp.asarray(frames),
                            jnp.asarray(ts))
        return jax.device_get(out)

    def forward_window(self, frames: np.ndarray, ts: Sequence[float],
                       test_patch: Tuple[int, int] = (1, 1),
                       patch_boundary: int = 32) -> WindowResult:
        """Full-resolution window inference.

        frames: [1,4,H,W,3] float32 BGR in [-1,1] (order B0,B1,B-1,B2);
        ts: the M-1 interpolation instants. Implements the reference's
        pad/tile/halo/trim/stitch semantics, batching all t per tile.
        """
        ts = np.asarray(ts, np.float32)
        if self.t_chunk and len(ts) > self.t_chunk:
            parts = [self.forward_window(frames, ts[i:i + self.t_chunk],
                                         test_patch, patch_boundary)
                     for i in range(0, len(ts), self.t_chunk)]
            return WindowResult(**{
                f.name: np.concatenate([getattr(p, f.name) for p in parts])
                for f in dataclasses.fields(WindowResult)})

        frames, ori_h, ori_w = _pad_reflect_to_multiple(frames, patch_boundary)
        new_h, new_w = frames.shape[2], frames.shape[3]
        n_ph, n_pw = test_patch
        sh, sw = new_h // n_ph, new_w // n_pw
        m = len(ts)

        def canvas(c):
            return np.zeros((m, new_h, new_w, c), np.float32)

        fields = dict(
            s0_prime=canvas(3), s1_prime=canvas(3), st_prime=canvas(3),
            s0_final=canvas(3), s1_final=canvas(3), st_final=canvas(3),
            flow_init=canvas(4), flow_final=canvas(4),
            occ0_init=canvas(1), occ0_final=canvas(1), ovlp=canvas(3),
            blend_w0=canvas(1), blend_w1=canvas(1),
            diff_10=canvas(1), diff_01=canvas(1))

        for ph in range(n_ph):
            for pw in range(n_pw):
                h_lo, h_hi, w_lo, w_hi = _tile_bounds(
                    patch_boundary, new_h, new_w, ph, sh, pw, sw)
                tile = frames[:, :, h_lo:h_hi, w_lo:w_hi, :]
                out = self._run_window(tile, ts)

                def put(name, arr):
                    t = _trim(arr, patch_boundary, new_h, new_w, ph, sh, pw, sw)
                    fields[name][:, ph * sh:(ph + 1) * sh,
                                 pw * sw:(pw + 1) * sw, :] = t

                put("s0_prime", out.s0_prime)
                put("s1_prime", out.s1_prime)
                put("st_prime", out.st_prime)
                if out.s0_final.shape[0]:
                    put("s0_final", out.s0_final[-1])
                    put("s1_final", out.s1_final[-1])
                    put("st_final", out.st_final[-1])
                else:  # bs variant: Stage II outputs = Stage I
                    put("s0_final", out.s0_prime)
                    put("s1_final", out.s1_prime)
                    put("st_final", out.st_prime)
                put("flow_init", out.flow_preds[0])
                put("flow_final", out.flow_preds[-1])
                put("occ0_init", out.occ0_preds[0])
                put("occ0_final", out.occ0_preds[-1])
                put("ovlp", out.ovlp_b0b1)
                put("blend_w0", out.blend_weights[0])
                put("blend_w1", out.blend_weights[1])
                put("diff_10", out.diff_maps[0])
                put("diff_01", out.diff_maps[1])

        # crop the pad back (utils.py:1452-1474)
        return WindowResult(**{k: v[:, :ori_h, :ori_w, :]
                               for k, v in fields.items()})
