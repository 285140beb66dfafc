"""DeMFI-Net in Flax (NHWC, TPU-native).

Architecture parity with the reference model (/root/reference/DeMFInet.py):
Stage I (feature-flow warping & blending + FAC-FB + refine U-Net + joint 3D
decoder) and Stage II (recursive boosting with a separable ConvGRU). The
module/parameter naming mirrors the reference's torch attribute names with
``.N`` list indices flattened to ``_N`` so that released ``.pt`` checkpoints
convert mechanically (see demfi_tpu/checkpoint/convert.py).

TPU-first design decisions (not translations):
  - NHWC layout end-to-end; convs hit the MXU directly.
  - The reference's Conv3d layers all have temporal extent 1
    (DeMFInet.py:30-34, 532), so the "3D" decoder is three frames folded
    into the batch axis sharing one 2D conv — identical math, better
    batching.
  - ``extract()`` (t-independent: RDB backbone + FAC-FB) is split from
    ``synthesize()`` (t-dependent) so arbitrary-M interpolation vmaps all
    t-values over a single backbone pass; the reference re-runs the whole
    network per t (main.py:733-748).
  - Recursive boosting runs the static ``num_update`` (1/3/5) iterations
    through ``nn.scan`` with parameters broadcast (one traced/compiled
    Stage-II body instead of N copies; per-iteration outputs are the
    stacked scan ys). ``scan_booster=False`` falls back to a Python
    unroll producing bit-identical parameter trees — both paths share
    ``_boost_step`` and are tested equal (tests/test_model.py).
"""
from __future__ import annotations

import os
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from demfi_tpu.config import DeMFIConfig
from demfi_tpu.ops import (
    bwarp_pair,
    cfr_flow_t_align,
    depth_to_space,
    fgac_correlate,
    space_to_depth,
)

Array = jnp.ndarray

_init = nn.initializers.xavier_normal()


def _conv(features: int, k: int = 3, stride: int = 1, pad: Optional[int] = None,
          name: Optional[str] = None, dtype=jnp.float32) -> nn.Conv:
    if pad is None:
        pad = (k - 1) // 2
    # HIGHEST precision for float32 keeps TPU convs at true-f32 accumulation
    # (checkpoint parity, the 0.05 dB budget); bf16 mode uses the MXU native
    # path.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return nn.Conv(features, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=True,
                   kernel_init=_init, dtype=dtype, precision=prec, name=name)


def _minmax_norm(v: Array) -> Array:
    """Per-sample min-max normalization over H, W (DeMFInet.py:457-462)."""
    lo = jnp.min(v, axis=(1, 2, 3), keepdims=True)
    v = v - lo
    hi = jnp.max(v, axis=(1, 2, 3), keepdims=True)
    return v / hi


def _t_blend(a: Array, b: Array, occ_0: Array, t: Array) -> Array:
    """Occlusion-weighted temporal blend, Eq.(2) (DeMFInet.py:68-71).

    The [B,H,W,1]/[B,1,1,1] operands are broadcast EXPLICITLY: an
    implicit broadcast-multiply fused into the same XLA:TPU program as
    the warp gathers miscompiles at >=352x640 f32 (NaNs in ~4% of
    elements from mathematically-bounded inputs; bisected 2026-08-17,
    ROUND2_NOTES.md "f32 NaN"). broadcast_to is semantically identity
    and dodges the bad fusion on every size tested. For float32 the
    warped operands additionally pass through an optimization_barrier:
    the residual in-model NaN was context-sensitive (the same subgraph
    compiled clean in isolation), so the gather producers must not be
    fused into the blend at all. bf16 — the serving default — was never
    affected and keeps the fully fused path."""
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        a, b = jax.lax.optimization_barrier((a, b))
    occ_0 = jnp.broadcast_to(occ_0, a.shape)
    t = jnp.broadcast_to(t, a.shape)
    occ_1 = 1.0 - occ_0
    num = (1.0 - t) * occ_0 * a + t * occ_1 * b
    den = (1.0 - t) * occ_0 + t * occ_1
    return num / den


# --------------------------------------------------------------------------
# Stage I building blocks
# --------------------------------------------------------------------------
class RDBConv(nn.Module):
    """One dense conv of an RDB (DeMFInet.py:275-287): conv+relu, concat."""
    growth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.relu(_conv(self.growth, 3, dtype=self.dtype, name="conv_0")(x))
        return jnp.concatenate([x, out], axis=-1)


class RDB(nn.Module):
    """Residual dense block (DeMFInet.py:256-272)."""
    g0: int
    growth: int
    n_convs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for i in range(self.n_convs):
            h = RDBConv(self.growth, self.dtype, name=f"convs_{i}")(h)
        return _conv(self.g0, 1, dtype=self.dtype, name="LFF")(h) + x


class FFRDB(nn.Module):
    """Feature & flow extractor (DeMFInet.py:189-253).

    4 blurry frames -> space_to_depth(2) -> RDN backbone at half
    resolution -> pixel-shuffle head -> (F0, F1, flow_01, flow_10,
    occ_0_logit) at full resolution.
    """
    nf: int
    scale_factor: int = 2
    g0: int = 96
    num_rdb: int = 12
    n_convs: int = 4
    growth: int = 32
    # remat each RDB block (fine-grained checkpointing: inter-RDB
    # activations survive to the backward pass, intra-RDB ones recompute)
    remat_rdb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: Array) -> Tuple[Array, Array, Array, Array, Array]:
        # frames: [B, H, W, 12] = concat(B0, B1, Bm1, B2)
        x = space_to_depth(frames, self.scale_factor)
        f1 = _conv(self.g0, 5, dtype=self.dtype, name="SFENet1")(x)
        x = _conv(self.g0, 3, dtype=self.dtype, name="SFENet2")(f1)

        rdb_outs = []
        rdb_cls = nn.remat(RDB) if self.remat_rdb else RDB
        for i in range(self.num_rdb):
            x = rdb_cls(self.g0, self.growth, self.n_convs, self.dtype,
                        name=f"RDBs_{i}")(x)
            rdb_outs.append(x)
        x = _conv(self.g0, 1, dtype=self.dtype, name="GFF_0")(
            jnp.concatenate(rdb_outs, axis=-1))
        x = _conv(self.g0, 3, dtype=self.dtype, name="GFF_1")(x)
        x = x + f1

        x = _conv(256, 3, dtype=self.dtype, name="UPNet_0")(x)
        x = depth_to_space(x, 2)
        s = _conv(self.nf * 2 + 4 + 1, 3, dtype=self.dtype, name="UPNet_2")(x)

        f0f1 = jnp.tanh(s[..., : 2 * self.nf])
        flow_01 = s[..., 2 * self.nf: 2 * self.nf + 2].astype(jnp.float32)
        flow_10 = s[..., 2 * self.nf + 2: 2 * self.nf + 4].astype(jnp.float32)
        occ = s[..., 2 * self.nf + 4: 2 * self.nf + 5]
        return (f0f1[..., : self.nf], f0f1[..., self.nf:],
                flow_01, flow_10, occ)


class ResBlock(nn.Module):
    """conv-relu-conv residual block, no BN (DeMFInet.py:545-563)."""
    nf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(_conv(self.nf, 3, dtype=self.dtype, name="conv1")(x))
        h = _conv(self.nf, 3, dtype=self.dtype, name="conv2")(h)
        return x + h


class FGAC(nn.Module):
    """Flow-Guided Attentive Correlation (DeMFInet.py:361-496).

    Correlates source keys with ref keys gathered at the raw flow values
    (absolute-coordinate quirk preserved), then gates the aggregated
    feature against the source (Eq. 3-4).
    """
    nf: int
    rr: int = 0
    sr: int = 0
    viz: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref: Array, source: Array, flow_s2r: Array
                 ) -> Tuple[Array, Array, Array, Tuple[Array, ...]]:
        ref_k = _conv(self.nf, 1, dtype=self.dtype, name="conv_ref_k")(ref)
        source_k = _conv(self.nf, 1, dtype=self.dtype, name="conv_source_k")(source)

        fac = fgac_correlate(ref_k.astype(jnp.float32),
                             source_k.astype(jnp.float32),
                             flow_s2r.astype(jnp.float32),
                             rr=self.rr, sr=self.sr).astype(self.dtype)
        e_s = _conv(self.nf, 1, dtype=self.dtype, name="fusion")(fac)
        w = nn.sigmoid(_conv(1, 3, dtype=self.dtype, name="w_gen_2")(
            nn.relu(_conv(self.nf, 3, dtype=self.dtype, name="w_gen")(
                jnp.concatenate([source, e_s], axis=-1)))))
        bolstered = w * source + (1.0 - w) * e_s

        diff = _minmax_norm(jnp.mean(jnp.abs(bolstered - source), axis=-1,
                                     keepdims=True))
        if self.viz:
            # min-max-normalized mean-|.| single-channel views of the
            # FGAC internals for the --visualization_flag grid
            # (DeMFInet.py:464-494): source key feature, initial ref key,
            # aggregated E_s ("final_warped_r2s"), bolstered ("FCW")
            def norm1(v):
                return _minmax_norm(jnp.mean(jnp.abs(
                    v.astype(jnp.float32)), axis=-1, keepdims=True))
            extras = (norm1(source), norm1(ref_k), norm1(e_s),
                      norm1(bolstered))
        else:
            extras = ()
        return bolstered, w, diff, extras


class FACFB(nn.Module):
    """Feature bolstering with (shared) FGAC (DeMFInet.py:319-358)."""
    nf: int
    num_res_blocks: int
    shared: bool = True
    rr: int = 0
    sr: int = 0
    viz: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f0: Array, f1: Array, flow_10: Array, flow_01: Array):
        b, h, w, c = f0.shape
        x = jnp.stack([f0, f1], axis=1).reshape(b * 2, h, w, c)
        x = nn.relu(_conv(self.nf, 3, dtype=self.dtype, name="conv_first")(x))
        for i in range(self.num_res_blocks):
            x = ResBlock(self.nf, self.dtype, name=f"feature_extraction_{i}")(x)
        enc = x.reshape(b, 2, h, w, self.nf)
        enc0, enc1 = enc[:, 0], enc[:, 1]

        if self.shared:
            fgac = FGAC(self.nf, self.rr, self.sr, self.viz, self.dtype,
                        name="shared_FGAC")
            a_f0, bw0, d10, x10 = fgac(enc1, enc0, flow_01)   # F1 -> F0
            a_f1, bw1, d01, x01 = fgac(enc0, enc1, flow_10)   # F0 -> F1
        else:
            a_f0, bw0, d10, x10 = FGAC(self.nf, self.rr, self.sr, self.viz,
                                       self.dtype,
                                       name="FGAC_F1toF0")(enc1, enc0, flow_01)
            a_f1, bw1, d01, x01 = FGAC(self.nf, self.rr, self.sr, self.viz,
                                       self.dtype,
                                       name="FGAC_F0toF1")(enc0, enc1, flow_10)
        return a_f0, a_f1, (bw0, bw1), (d10, d01), (x10, x01)


class RefineUNet(nn.Module):
    """3-level strided-conv U-Net (DeMFInet.py:566-603)."""
    nf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nf = self.nf
        e1 = nn.relu(_conv(nf, 4, 2, 1, dtype=self.dtype, name="enc1")(x))
        e2 = nn.relu(_conv(2 * nf, 4, 2, 1, dtype=self.dtype, name="enc2")(e1))
        h = nn.relu(_conv(4 * nf, 4, 2, 1, dtype=self.dtype, name="enc3")(e2))

        h = nn.relu(_conv(4 * nf, 3, dtype=self.dtype, name="dec0")(h))
        h = _nearest_up2(h)
        h = nn.relu(_conv(2 * nf, 3, dtype=self.dtype, name="dec1")(
            jnp.concatenate([h, e2], axis=-1)))
        h = _nearest_up2(h)
        h = nn.relu(_conv(nf, 3, dtype=self.dtype, name="dec2")(
            jnp.concatenate([h, e1], axis=-1)))
        h = _nearest_up2(h)
        return _conv(2 * 2 + 1 + 2 * nf, 3, dtype=self.dtype, name="dec3")(h)


def _nearest_up2(x: Array) -> Array:
    """UpsamplingNearest2d(scale_factor=2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# --------------------------------------------------------------------------
# Stage II (recursive boosting)
# --------------------------------------------------------------------------
class Mixer(nn.Module):
    """Two-branch ref/delta encoder (DeMFInet.py:796-824).

    The ``ref`` input is LOOP-INVARIANT across the recursive-boosting
    iterations (it is part of the scan's ``const``, DeMFInet.py:130-165
    recomputes it every iteration anyway), and the ref branch carries
    ~70% of the Mixer's conv FLOPs (7x7 over ~30 channels vs 5 for
    delta). ``encode_ref`` is therefore exposed separately so the model
    hoists it OUT of the boosting loop — computed once per window
    instead of once per iteration. Exact math, same parameter tree."""
    nf: int
    dtype: Any = jnp.float32

    def setup(self):
        nf = self.nf
        self.conv_ref1 = _conv(nf // 2, 7, dtype=self.dtype,
                               name="conv_ref1")
        self.conv_ref2 = _conv(nf // 2, 3, dtype=self.dtype,
                               name="conv_ref2")
        self.conv_delta1 = _conv(nf // 2, 7, dtype=self.dtype,
                                 name="conv_delta1")
        self.conv_delta2 = _conv(nf // 2, 3, dtype=self.dtype,
                                 name="conv_delta2")
        self.conv_blend1 = _conv(nf // 2, 3, dtype=self.dtype,
                                 name="conv_blend1")
        self.conv_blend2 = _conv(nf, 3, dtype=self.dtype,
                                 name="conv_blend2")

    def encode_ref(self, ref: Array) -> Array:
        return nn.relu(self.conv_ref2(nn.relu(self.conv_ref1(ref))))

    def __call__(self, ref: Array, delta: Array,
                 ref_enc: Optional[Array] = None) -> Array:
        r = self.encode_ref(ref) if ref_enc is None else ref_enc
        d = nn.relu(self.conv_delta2(nn.relu(self.conv_delta1(delta))))
        h = nn.relu(self.conv_blend1(jnp.concatenate([r, d], axis=-1)))
        return nn.relu(self.conv_blend2(h))


class _ConvParams(nn.Module):
    """Parameter-only conv holder: declares ``kernel``/``bias`` exactly as
    ``nn.Conv`` would (same names, shapes, initializers) so the checkpoint
    converter's mechanical torch<->flax mapping is unaffected, while the
    owning module is free to fuse/split the actual convolutions."""
    features: int
    kshape: Tuple[int, int]
    in_features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        k = self.param("kernel", _init,
                       self.kshape + (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SepConvGRU(nn.Module):
    """RAFT-style separable ConvGRU (DeMFInet.py:827-857).

    TPU formulation (exact math, same parameter tree), selected by
    ``DEMFI_GRU_CONCAT`` (default 1):
      concat (1): the z and r gates read the same ``[h, x]`` input, so
        their kernels concatenate on the output axis and run as ONE
        conv on the materialized ``hx`` concat; the q gate runs one
        conv on ``[r*h, x]``. Two conv passes per half.
      split (0): every conv on a concatenated input splits into
        per-operand convs summed afterwards, avoiding the
        [B,H,W,2*h_dim] ``hx`` HBM materialization (the round-3 form).
    Isolated on v5e (scripts/variant_lab.py, B=7 352x640 bf16,
    tpu_reports/variant_lab.json): concat 25.2 ms vs split 32.9 ms vs
    im2col 67.5 ms. Both forms are kept because isolated op wins do
    not always survive composition into the full synthesize program —
    the flag lets bench.py A/B them end-to-end."""
    h_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        prec = jax.lax.Precision.HIGHEST if self.dtype == jnp.float32 else None
        hd = self.h_dim
        dn = ("NHWC", "HWIO", "NHWC")
        concat_form = os.environ.get("DEMFI_GRU_CONCAT", "1") != "0"

        def conv(inp, k, pad):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype), k.astype(self.dtype), (1, 1),
                (pad[0], pad[1]), dimension_numbers=dn, precision=prec)

        def half(h, x, names, kshape, pad):
            kz, bz = _ConvParams(hd, kshape, 2 * hd, name=names[0])()
            kr, br = _ConvParams(hd, kshape, 2 * hd, name=names[1])()
            kq, bq = _ConvParams(hd, kshape, 2 * hd, name=names[2])()
            kzr = jnp.concatenate([kz, kr], axis=-1)
            bzr = jnp.concatenate([bz, br]).astype(self.dtype)
            if concat_form:
                hx = jnp.concatenate([h.astype(self.dtype),
                                      x.astype(self.dtype)], axis=-1)
                zr = conv(hx, kzr, pad) + bzr
                z = nn.sigmoid(zr[..., :hd])
                r = nn.sigmoid(zr[..., hd:])
                q = jnp.tanh(conv(jnp.concatenate(
                    [(r * h).astype(self.dtype), x.astype(self.dtype)],
                    axis=-1), kq, pad) + bq.astype(self.dtype))
                return (1.0 - z) * h + z * q
            # all three gates' x-branches share one conv pass (the
            # q-gate's h-branch can't join: it reads r * h)
            xzrq = conv(x, jnp.concatenate([kzr[:, :, hd:],
                                            kq[:, :, hd:]], axis=-1), pad)
            zr = conv(h, kzr[:, :, :hd], pad) + xzrq[..., :2 * hd] + bzr
            z = nn.sigmoid(zr[..., :hd])
            r = nn.sigmoid(zr[..., hd:])
            q = jnp.tanh(conv(r * h, kq[:, :, :hd], pad)
                         + xzrq[..., 2 * hd:]
                         + bq.astype(self.dtype))
            return (1.0 - z) * h + z * q

        h = half(h, x, ("convz1", "convr1", "convq1"), (1, 5),
                 ((0, 0), (2, 2)))
        return half(h, x, ("convz2", "convr2", "convq2"), (5, 1),
                    ((2, 2), (0, 0)))


class FlowOcc(nn.Module):
    """Delta flow/occlusion head (DeMFInet.py:860-868)."""
    nf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(_conv(self.nf // 2, 3, dtype=self.dtype, name="conv1")(x))
        return _conv(5, 3, dtype=self.dtype, name="conv2")(h)


class Booster(nn.Module):
    """One recursive-boosting step (DeMFInet.py:770-793).

    ``encode_ref`` precomputes the Mixer's loop-invariant ref branch so
    the caller can hoist it out of the boosting scan (see Mixer)."""
    nf: int
    dtype: Any = jnp.float32

    def setup(self):
        self.Mixer = Mixer(self.nf, self.dtype, name="Mixer")
        self.GB = SepConvGRU(self.nf, self.dtype, name="GB")
        self.flow_occ = FlowOcc(self.nf, self.dtype, name="flow_occ")

    def encode_ref(self, ref: Array) -> Array:
        return self.Mixer.encode_ref(ref)

    def __call__(self, f_rec: Array, ref: Optional[Array], delta: Array,
                 ref_enc: Optional[Array] = None
                 ) -> Tuple[Array, Array, Array]:
        blend = self.Mixer(ref, delta, ref_enc=ref_enc)
        f_rec = self.GB(f_rec, blend)
        d = self.flow_occ(f_rec)
        return f_rec, d[..., :4], d[..., 4:5]


# --------------------------------------------------------------------------
# Outputs
# --------------------------------------------------------------------------
@flax.struct.dataclass
class DeMFIOutputs:
    """Pytree of everything the reference forward returns
    (DeMFInet.py:170-179), with per-iteration lists stacked on axis 0."""
    s0_prime: Array          # [B,H,W,3]
    s1_prime: Array
    st_prime: Array
    s0_final: Array          # [N,B,H,W,3]  (N = num_update; empty if 0)
    s1_final: Array
    st_final: Array
    flow_preds: Array        # [N+1,B,H,W,4]  (init + per-iteration)
    occ0_preds: Array        # [N+1,B,H,W,1]  (sigmoided)
    ovlp_b0b1: Array         # [B,H,W,3]
    diff_maps: Tuple[Array, Array]        # (diff_1to0, diff_0to1)
    blend_weights: Tuple[Array, Array]    # FGAC gate maps (w_F0, w_F1)
    # --visualization_flag FGAC internals (DeMFInet.py:464-494): per
    # direction (1to0, 0to1) a tuple of normalized 1-channel maps
    # (source_v, init_ref_k, E_s, bolstered/"FCW"); () when disabled
    viz_stacks: Tuple = ()


@flax.struct.dataclass
class StageIContext:
    """t-independent intermediates shared by all t-values of a window."""
    f0: Array
    f1: Array
    flow_01: Array
    flow_10: Array
    occ_0_logit: Array
    a_f0: Array
    a_f1: Array
    blend_weights: Tuple[Array, Array]
    diff_maps: Tuple[Array, Array]
    frames: Array            # [B,H,W,12] (B0,B1,Bm1,B2)
    viz_stacks: Tuple = ()


# --------------------------------------------------------------------------
# Top-level model
# --------------------------------------------------------------------------
class DeMFINet(nn.Module):
    """DeMFI-Net (DeMFInet.py:13-179).

    Call with frames [B, 4, H, W, 3] in reference order (B0, B1, B-1, B2)
    and t_value [B] or [B, 1]. ``num_update`` is a static Python int.
    """
    nf: int = 64
    scale_factor: int = 2
    num_res_facfb: int = 5
    num_res_dec: int = 5
    shared_fgac: bool = True
    fgac_rr: int = 0
    fgac_sr: int = 0
    use_stage2: bool = True
    # lax.scan the Stage-II loop (params broadcast): one compiled booster
    # body regardless of num_update. False = Python unroll (same params,
    # same outputs; lets XLA specialize per iteration at N× compile cost).
    scan_booster: bool = True
    # rematerialize the RDB backbone in the backward pass (trades FLOPs
    # for HBM during training)
    remat: bool = False
    # remat granularity: "backbone" wraps the whole FFRDB; "rdb" wraps
    # each RDB block individually (keeps inter-RDB activations — less
    # recompute in the backward pass at a higher HBM footprint)
    remat_scope: str = "backbone"
    # carry normalized FGAC internals for --visualization_flag
    # (extra outputs; off on the hot path)
    viz_internals: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        rdb_scope = self.remat and self.remat_scope == "rdb"
        ffrdb_cls = (nn.remat(FFRDB) if self.remat and not rdb_scope
                     else FFRDB)
        self.FF_RDB_Module = ffrdb_cls(self.nf, self.scale_factor,
                                       remat_rdb=rdb_scope,
                                       dtype=self.dtype,
                                       name="FF_RDB_Module")
        self.FAC_FB_Module = FACFB(self.nf, self.num_res_facfb,
                                   self.shared_fgac, self.fgac_rr,
                                   self.fgac_sr, self.viz_internals,
                                   dtype=self.dtype,
                                   name="FAC_FB_Module")
        self.Refine_Module = RefineUNet(self.nf, dtype=self.dtype,
                                        name="Refine_Module")
        # "3D" decoder D1 — temporal kernel extent is 1 in the reference
        # (Conv3d [1,3,3], DeMFInet.py:30-34), so these are 2D convs shared
        # across the 3 stacked frames (folded into batch).
        self.Dec_first = _conv(self.nf, 3, dtype=self.dtype, name="Dec_first")
        self.Decoder_res = [ResBlock(self.nf, self.dtype, name=f"Decoder_res_{i}")
                            for i in range(self.num_res_dec)]
        self.Dec_last1 = _conv(self.nf, 3, dtype=self.dtype, name="Dec_last1")
        self.Dec_last2 = _conv(3, 3, dtype=self.dtype, name="Dec_last2")

        if self.use_stage2:
            self.Ch_Reducer = _conv(self.nf, 7, dtype=self.dtype,
                                    name="Ch_Reducer")
            self.Booster_Module = Booster(self.nf, self.dtype,
                                          name="Booster_Module")
            self.Dec_first_2 = _conv(self.nf, 3, dtype=self.dtype,
                                     name="Dec_first_2")
            self.Decoder_res_2 = [
                ResBlock(self.nf, self.dtype, name=f"Decoder_res_2_{i}")
                for i in range(self.num_res_dec)]
            self.Dec_last1_2 = _conv(self.nf, 3, dtype=self.dtype,
                                     name="Dec_last1_2")
            self.Dec_last2_2 = _conv(9, 3, dtype=self.dtype, name="Dec_last2_2")

    # ---------------------------------------------------- t-independent
    def extract(self, frames: Array) -> StageIContext:
        """RDB backbone + FAC-FB; runs once per 4-frame window."""
        b, t, h, w, c = frames.shape
        assert t == 4, f"expected 4 input frames, got {t}"
        cat = frames.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        f0, f1, flow_01, flow_10, occ = self.FF_RDB_Module(cat)
        a_f0, a_f1, bws, diffs, stacks = self.FAC_FB_Module(
            f0, f1, flow_10, flow_01)
        # per-direction FGAC internals + the bidirectional flows the
        # reference appends as the "FCW flow" panels (DeMFInet.py:168)
        viz_stacks = (stacks + ((flow_01, flow_10),)
                      if self.viz_internals else ())
        return StageIContext(f0, f1, flow_01, flow_10, occ, a_f0, a_f1,
                             bws, diffs, cat, viz_stacks)

    # ------------------------------------------------------ t-dependent
    def synthesize(self, ctx: StageIContext, t_value: Array,
                   num_update: int, upto: Optional[str] = None
                   ) -> DeMFIOutputs:
        """t-dependent Stage I + Stage II (DeMFInet.py:46-179).

        ``upto`` is a measurement-only hook (scripts/breakdown_tpu.py):
        a static cut-point name that returns the prefix of the graph up
        to and including that stage, so on-chip timing can attribute the
        window budget by differencing consecutive prefixes (XLA
        dead-code-eliminates everything past the cut). ``None`` (the
        default and the only value used outside measurement) runs the
        full graph. Cut order: cfr, ftblend, agg1, refine, rftblend, d1.
        """
        nf = self.nf
        t = jnp.reshape(t_value.astype(jnp.float32), (-1, 1, 1, 1))
        b0 = ctx.frames[..., 0:3]
        b1 = ctx.frames[..., 3:6]

        # t-alignment: CFR + feature warp/blend (Eq. 2); a bf16 model
        # routes CFR's forward warps through the bf16 one-hot MXU path
        flow_t0, flow_t1 = cfr_flow_t_align(ctx.flow_01, ctx.flow_10, t,
                                            compute_dtype=self.dtype)
        if upto == "cfr":
            return flow_t0, flow_t1
        occ_0 = nn.sigmoid(ctx.occ_0_logit.astype(jnp.float32))
        # features warp in their native dtype (bf16 rows gather exactly;
        # interpolation weights/accumulation are f32 inside bwarp)
        ft = _t_blend(*bwarp_pair(ctx.f0, ctx.f1, flow_t0, flow_t1),
                      occ_0, t)
        if upto == "ftblend":
            return ft

        # refinement (DeMFInet.py:77-87)
        agg1 = jnp.concatenate(
            [ctx.a_f0, ctx.a_f1, ft.astype(self.dtype),
             flow_t0.astype(self.dtype), flow_t1.astype(self.dtype),
             ctx.flow_01.astype(self.dtype), ctx.flow_10.astype(self.dtype),
             ctx.occ_0_logit.astype(self.dtype)], axis=-1)
        if upto == "agg1":
            return agg1
        agg1 = self.Refine_Module(agg1) + jnp.concatenate(
            [flow_t0.astype(self.dtype), flow_t1.astype(self.dtype),
             ctx.occ_0_logit.astype(self.dtype), ctx.a_f0, ctx.a_f1], axis=-1)
        if upto == "refine":
            return agg1

        rflow_t0 = agg1[..., 0:2].astype(jnp.float32)
        rflow_t1 = agg1[..., 2:4].astype(jnp.float32)
        occ_0_logit = agg1[..., 4:5].astype(jnp.float32)
        occ_0 = nn.sigmoid(occ_0_logit)
        r_f0 = jnp.tanh(agg1[..., 5:5 + nf])
        r_f1 = jnp.tanh(agg1[..., 5 + nf:5 + 2 * nf])

        r_ft = _t_blend(*bwarp_pair(r_f0, r_f1, rflow_t0, rflow_t1),
                        occ_0, t).astype(self.dtype)
        if upto == "rftblend":
            return r_f0, r_f1, r_ft

        # D1: joint 3-frame decode (frames folded into batch)
        b, h, w, _ = r_f0.shape
        dec_in = jnp.stack([r_f0, r_f1, r_ft], axis=1).reshape(3 * b, h, w, nf)
        out = nn.relu(self.Dec_first(dec_in))
        for blk in self.Decoder_res:
            out = blk(out)
        out = nn.relu(self.Dec_last1(out))
        out = self.Dec_last2(out).reshape(b, 3, h, w, 3)
        s0p, s1p, stp = out[:, 0], out[:, 1], out[:, 2]
        if upto == "d1":
            return s0p, s1p, stp

        flow_init = jnp.concatenate([rflow_t0, rflow_t1], axis=-1)

        if self.use_stage2 and num_update > 0:
            f_rec = jnp.tanh(self.Ch_Reducer(
                jnp.concatenate([r_f0, r_f1, r_ft], axis=-1)))
            t_ref = jnp.concatenate(
                [flow_init.astype(self.dtype),
                 occ_0_logit.astype(self.dtype)], axis=-1)
            length1_ref = jnp.concatenate([ctx.flow_10, ctx.flow_01],
                                          axis=-1).astype(self.dtype)
            sp_ref = jnp.concatenate([s0p, s1p, stp, ctx.frames], axis=-1)
            ref = jnp.concatenate([sp_ref, length1_ref, t_ref], axis=-1)

            # the Mixer's ref branch is loop-invariant: encode once per
            # window, not once per boosting iteration (exact; see Mixer)
            ref_enc = self.Booster_Module.encode_ref(ref)

            carry = (f_rec, flow_init.astype(self.dtype),
                     occ_0_logit.astype(self.dtype))
            const = (ref_enc, s0p, s1p, occ_0,
                     rflow_t0.astype(self.dtype), rflow_t1.astype(self.dtype),
                     ctx.flow_10.astype(self.dtype),
                     ctx.flow_01.astype(self.dtype), ctx.frames, t)
            if self.scan_booster:
                # one traced booster body; params broadcast across
                # iterations; loop-invariants enter via closure
                _, ys = nn.scan(
                    lambda mdl, c, _: mdl._boost_step(c, const),
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    length=num_update)(self, carry, None)
            else:
                ys_list = []
                for _ in range(num_update):
                    carry, y = self._boost_step(carry, const)
                    ys_list.append(y)
                ys = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs, axis=0), *ys_list)
            flow_iters, occ_iters, s0_fin, s1_fin, st_fin = ys
            flow_preds = jnp.concatenate([flow_init[None], flow_iters], axis=0)
            occ0_preds = jnp.concatenate([occ_0[None], occ_iters], axis=0)
        else:
            empty = lambda like: jnp.zeros((0,) + like.shape, like.dtype)
            s0_fin, s1_fin, st_fin = empty(s0p), empty(s1p), empty(stp)
            flow_preds = flow_init[None]
            occ0_preds = occ_0[None]

        return DeMFIOutputs(
            s0_prime=s0p, s1_prime=s1p, st_prime=stp,
            s0_final=s0_fin, s1_final=s1_fin, st_final=st_fin,
            flow_preds=flow_preds,
            occ0_preds=occ0_preds,
            ovlp_b0b1=(b0 + b1) / 2.0,
            diff_maps=ctx.diff_maps,
            blend_weights=ctx.blend_weights,
            viz_stacks=ctx.viz_stacks,
        )

    def _boost_step(self, carry, const):
        """One recursive-boosting iteration (DeMFInet.py:130-165).

        ``carry`` = (f_rec, delta_flow, delta_occ) in compute dtype;
        ``const`` holds the loop-invariant tensors. Shared by the
        nn.scan and unrolled paths so both produce identical math and an
        identical parameter tree (Stage-II modules stay direct children).
        """
        f_rec, delta_flow, delta_occ = carry
        (ref_enc, s0p, s1p, occ_0, rflow_t0_c, rflow_t1_c,
         flow_10_c, flow_01_c, frames, t) = const

        delta = jnp.concatenate([delta_flow, delta_occ], axis=-1)
        f_rec, d_flow, d_occ = self.Booster_Module(f_rec, None, delta,
                                                   ref_enc=ref_enc)
        delta_flow = delta_flow + d_flow
        delta_occ = delta_occ + d_occ

        ft0_f = delta_flow[..., :2].astype(jnp.float32)
        ft1_f = delta_flow[..., 2:4].astype(jnp.float32)
        occ_0_f = nn.sigmoid(delta_occ.astype(jnp.float32))

        st_new = _t_blend(
            *bwarp_pair(s0p, s1p, ft0_f, ft1_f),
            occ_0_f, t).astype(self.dtype)

        agg3 = jnp.concatenate(
            [s0p, s1p, st_new, f_rec,
             occ_0.astype(self.dtype), rflow_t0_c, rflow_t1_c,
             flow_10_c, flow_01_c,
             ft0_f.astype(self.dtype), ft1_f.astype(self.dtype),
             occ_0_f.astype(self.dtype), frames], axis=-1)
        out = nn.relu(self.Dec_first_2(agg3))
        for blk in self.Decoder_res_2:
            out = blk(out)
        out = nn.relu(self.Dec_last1_2(out))
        out = self.Dec_last2_2(out)
        ys = (delta_flow.astype(jnp.float32), occ_0_f,
              out[..., 0:3] + s0p, out[..., 3:6] + s1p,
              out[..., 6:9] + st_new)
        return (f_rec, delta_flow, delta_occ), ys

    def __call__(self, frames: Array, t_value: Array,
                 num_update: int = 1) -> DeMFIOutputs:
        ctx = self.extract(frames)
        return self.synthesize(ctx, t_value, num_update)


def make_model(cfg: DeMFIConfig) -> DeMFINet:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return DeMFINet(
        nf=cfg.nf,
        scale_factor=cfg.scale_factor,
        num_res_facfb=cfg.num_ResB_FACFB,
        num_res_dec=cfg.num_ResB_Dec,
        shared_fgac=cfg.shared_FGAC_flag,
        fgac_rr=cfg.fgac_rr,
        fgac_sr=cfg.fgac_sr,
        use_stage2=max(cfg.N_trn, cfg.N_tst) > 0,
        scan_booster=cfg.scan_booster,
        remat=cfg.remat_backbone,
        remat_scope=cfg.remat_granularity,
        viz_internals=cfg.visualization_flag,
        dtype=dtype,
    )
