"""Pallas TPU kernels for the irregular-memory warping ops.

XLA lowers arbitrary gathers to near-scalar loops on TPU, and Mosaic's
native dynamic gather is element-serial — so the bilinear gather at the
heart of ``bwarp`` and the FGAC sampler is reformulated onto the MXU:

  For a 128-column output tile, the horizontal bilinear interpolation at
  per-pixel coordinates is a matmul with a banded soft-one-hot matrix
  A[(row, lane), src_col] = wx0*[src == x0] + wx1*[src == x0+1] built with
  two vector compares. The vertical dimension is a sweep over candidate
  8-row source slabs; per active source row the kernel accumulates
      out += wrow * (A_s @ slab_row[src_cols, C]).
  All heavy lifting is 128xC matmuls.

Pipelining (v2): the slab sweep is the innermost GRID axis ("arbitrary"
dimension semantics) and each slab arrives as three 128-column BlockSpec
views of the padded image — Pallas' automatic pipeline issues the copies.
v1 used manual ``pltpu.make_async_copy`` predicated on slab hits; the
development TPU's AOT compile helper rejects ANY kernel containing a
manual DMA (even a trivial static one — bisected 2026-08-16), and the
predication only saved bandwidth, not compute, so the sweep now fetches
its full static window and predicates the matmuls only. Cost scales with
the window (vr), not the image; pick vr to cover realistic motion.

Semantics: zero padding outside the image (grid_sample 'zeros',
/root/reference/DeMFInet.py:508, 757). Taps farther than the static
window (vr rows vertically / +-127 px horizontally in relative mode)
contribute zero — the runtime motion guard in ops/warp.py falls back to
the exact XLA path when flows exceed the window.

Addressing modes:
  relative=True  : source rows/cols cluster around the output pixel
                   (bwarp). Window = output band +- vr rows, +-128 cols.
  relative=False : coordinates cluster near the image origin (the FGAC
                   absolute-coordinate quirk, DeMFInet.py:413-419).
                   Window = rows [-slab_rows, span_al) where span_al is
                   the span rounded up to a slab multiple (the sweep
                   starts one full slab above the origin), cols
                   [-128, 256).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_kernel(py_ref, px_ref, i0_ref, i1_ref, i2_ref, out_ref, *,
                   C: int, block_rows: int, slab_rows: int, relative: bool,
                   vr_al: int, acc_dtype):
    rb = pl.program_id(1)
    ct = pl.program_id(2)
    q = pl.program_id(3)
    r0 = rb * block_rows
    cs = ct * LANES

    @pl.when(q == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    py = py_ref[0]   # [block_rows, 128] absolute y coords
    px = px_ref[0]
    y0f = jnp.floor(py)
    fy = (py - y0f).astype(acc_dtype)
    x0f = jnp.floor(px)
    fx = (px - x0f).astype(acc_dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    # image coords of this slab's first row / of col view 0's first col
    slab_lo = (r0 - vr_al + slab_rows * q) if relative \
        else (slab_rows * q - slab_rows)
    cw = (cs - LANES) if relative else -LANES

    in0 = (y0 >= slab_lo) & (y0 < slab_lo + slab_rows)
    in1 = (y0 + 1 >= slab_lo) & (y0 + 1 < slab_lo + slab_rows)

    @pl.when(jnp.any(in0 | in1))
    def _():
        # Soft interpolation matrices, one per 128-col source view s,
        # built lazily on first use (VMEM: one [BR*128,128] live at a time)
        # A_s[(i, l), k] = (1-fx)*[k == x0 - base_s] + fx*[k == x0+1 - base_s]
        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, LANES, LANES), 2)

        def a_mat(s):
            base = cw + s * LANES
            lidx = (x0 - base)[:, :, None]
            a = (jnp.where(k_iota == lidx, 1.0 - fx[:, :, None], 0.0)
                 + jnp.where(k_iota == lidx + 1, fx[:, :, None], 0.0))
            return a.reshape(block_rows * LANES, LANES).astype(acc_dtype)

        views = (i0_ref, i1_ref, i2_ref)
        # process source rows in pairs: one [*, 2C] matmul serves two rows
        # (full MXU width at C=64)
        for o in range(0, slab_rows, 2):
            rows = (slab_lo + o, slab_lo + o + 1)
            wrows = []
            used = None
            for sr in rows:
                h0 = y0 == sr
                h1 = y0 + 1 == sr
                wrows.append(jnp.where(h0, 1.0 - fy, 0.0)
                             + jnp.where(h1, fy, 0.0))
                u = h0 | h1
                used = u if used is None else (used | u)

            @pl.when(jnp.any(used))
            def _():
                for s in range(3):
                    # does any pixel read from this source view?
                    near = (x0 >= cw + s * LANES - 1) & \
                           (x0 < cw + (s + 1) * LANES)

                    @pl.when(jnp.any(used & near))
                    def _():
                        pair = jnp.concatenate(
                            [views[s][0, o], views[s][0, o + 1]], axis=-1)
                        # HIGHEST: f32 MXU passes — default precision
                        # rounds the interpolation weights to bf16
                        # (measured 1e-2 error on-chip)
                        g = jnp.dot(a_mat(s), pair.astype(acc_dtype),
                                    preferred_element_type=acc_dtype,
                                    precision=jax.lax.Precision.HIGHEST)
                        g = g.reshape(block_rows, LANES, 2 * C)
                        out_ref[0] += (
                            g[..., :C] * wrows[0][:, :, None]
                            + g[..., C:] * wrows[1][:, :, None]
                        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relative", "vr", "block_rows", "slab_rows",
                              "acc_dtype"))
def bilinear_gather_tpu(img: jnp.ndarray, coords: jnp.ndarray, *,
                        relative: bool = True, vr: int = 64,
                        block_rows: int = 32, slab_rows: int = 32,
                        acc_dtype=jnp.float32
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear gather of img [B,H,W,C] at absolute pixel coords
    [B,H,W,2] (x, y). Returns (values [B,H,W,C], ones [B,H,W,1]) where
    ``ones`` is the closed-form warp of an all-ones image with in-image
    validity (used for bwarp's 0.999 mask)."""
    b, h, w, c = img.shape
    dtype = img.dtype
    px = coords[..., 0].astype(jnp.float32)
    py = coords[..., 1].astype(jnp.float32)

    cp = _ceil_to(max(c, 8), 8)
    wp_out = _ceil_to(w, LANES)
    hp_out = _ceil_to(h, block_rows)
    vr = min(vr, hp_out)
    sr = slab_rows
    assert block_rows % sr == 0 or sr % block_rows == 0
    vr_al = _ceil_to(vr + 2, sr if block_rows % sr == 0 else block_rows)
    if block_rows % sr:
        sr = block_rows  # slabs can't exceed the output block stride
    vr_al = _ceil_to(vr_al, sr)

    if relative:
        pad_top = vr_al
        n_slabs = (2 * vr_al + block_rows) // sr
        pad_bot = vr_al + (hp_out - h)
        row_map = lambda r_, q: (block_rows // sr) * r_ + q
    else:
        pad_top = sr
        span_al = _ceil_to(vr + 2, sr)
        n_slabs = (span_al + sr) // sr
        # sweep rows [-sr, span_al): keep indices in range even when the
        # span exceeds the image
        pad_bot = max(sr * n_slabs - pad_top - h, hp_out - h)
        row_map = lambda r_, q: q

    imgp = jnp.pad(img.astype(jnp.float32),
                   ((0, 0), (pad_top, pad_bot),
                    (LANES, LANES + wp_out - w), (0, cp - c)))

    pxp = jnp.pad(px, ((0, 0), (0, hp_out - h), (0, wp_out - w)),
                  constant_values=-1e6)
    pyp = jnp.pad(py, ((0, 0), (0, hp_out - h), (0, wp_out - w)),
                  constant_values=-1e6)

    grid = (b, hp_out // block_rows, wp_out // LANES, n_slabs)

    kernel = functools.partial(
        _gather_kernel, C=cp, block_rows=block_rows, slab_rows=sr,
        relative=relative, vr_al=vr_al, acc_dtype=acc_dtype)

    coord_spec = pl.BlockSpec((1, block_rows, LANES),
                              lambda b_, r_, c_, q_: (b_, r_, c_),
                              memory_space=pltpu.VMEM)

    def img_spec(s):
        if relative:
            return pl.BlockSpec(
                (1, sr, LANES, cp),
                lambda b_, r_, c_, q_, s=s: (b_, row_map(r_, q_), c_ + s, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, sr, LANES, cp),
            lambda b_, r_, c_, q_, s=s: (b_, row_map(r_, q_), s, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp_out, wp_out, cp),
                                       jnp.float32),
        grid=grid,
        in_specs=[coord_spec, coord_spec,
                  img_spec(0), img_spec(1), img_spec(2)],
        out_specs=pl.BlockSpec((1, block_rows, LANES, cp),
                               lambda b_, r_, c_, q_: (b_, r_, c_, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(pyp, pxp, imgp, imgp, imgp)

    vals = out[:, :h, :w, :c].astype(dtype)

    # closed-form warp of ones (in-image validity only — reference mask
    # semantics, DeMFInet.py:758-759)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fxf = px - x0
    fyf = py - y0
    ones = jnp.zeros_like(px)
    for ty in (0, 1):
        for tx in (0, 1):
            yt = y0 + ty
            xt = x0 + tx
            wgt = (fyf if ty else 1 - fyf) * (fxf if tx else 1 - fxf)
            valid = ((yt >= 0) & (yt < h) & (xt >= 0) & (xt < w))
            ones = ones + wgt * valid.astype(jnp.float32)
    return vals, ones[..., None].astype(dtype)


def bwarp_tpu(x: jnp.ndarray, flow: jnp.ndarray, *, vr: int = 64) -> jnp.ndarray:
    """TPU fast path for demfi_tpu.ops.bwarp (same semantics; taps farther
    than vr rows vertically or 127 px horizontally contribute zero)."""
    b, h, w, c = x.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    coords = jnp.stack([gx + flow[..., 0].astype(jnp.float32),
                        gy + flow[..., 1].astype(jnp.float32)], axis=-1)
    vals, ones = bilinear_gather_tpu(x, coords, relative=True, vr=vr)
    mask = (ones >= 0.999).astype(x.dtype)
    return vals * mask


def bilinear_sample_abs_tpu(img: jnp.ndarray, coords: jnp.ndarray, *,
                            span: int = 128) -> jnp.ndarray:
    """TPU fast path for the FGAC absolute-coordinate sampler: coordinates
    cluster near the image origin (raw flow values), so the window is rows
    [-8, span) x cols [-128, 256)."""
    vals, _ = bilinear_gather_tpu(img, coords, relative=False, vr=span)
    return vals


# ---------------------------------------------------------------------------
# Forward warp (scatter-add) — CFR's fwarp (DeMFInet.py:625-729)
# ---------------------------------------------------------------------------
def _fwarp_kernel(ty0_ref, ty1_ref, ty2_ref, tx0_ref, tx1_ref, tx2_ref,
                  v0_ref, v1_ref, v2_ref, out_ref, *,
                  C: int, block_rows: int, vr_al: int):
    """Output-stationary scatter: sweep candidate *source* slabs (grid
    axis); each source row's pixels are split by target row with Gaussian
    row weights (separable, get_gaussian_weights in the reference), then
    routed to target columns by a transposed banded soft-one-hot matmul."""
    rb = pl.program_id(1)
    ct = pl.program_id(2)
    q = pl.program_id(3)
    r0 = rb * block_rows
    cs = ct * LANES

    @pl.when(q == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    row_i = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1, 1), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

    ty_views = (ty0_ref, ty1_ref, ty2_ref)
    tx_views = (tx0_ref, tx1_ref, tx2_ref)
    v_views = (v0_ref, v1_ref, v2_ref)

    for s in range(3):
        sty = ty_views[s][0]        # [8, 128] target y (absolute, float)
        stx = tx_views[s][0]
        y0 = jnp.floor(sty)
        fyw = sty - y0
        x0 = jnp.floor(stx)
        fxw = stx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        # Gaussian corner weights (separable): exp(-(f-t)^2) per axis
        wy = (jnp.exp(-(fyw ** 2)), jnp.exp(-((fyw - 1.0) ** 2)))
        wx = (jnp.exp(-(fxw ** 2)), jnp.exp(-((fxw - 1.0) ** 2)))

        # any source pixel in this view targeting our block?
        hit_any = ((y0i >= r0 - 1) & (y0i < r0 + block_rows)
                   & (x0i >= cs - 1) & (x0i < cs + LANES))

        @pl.when(jnp.any(hit_any))
        def _():
            for o in range(8):
                y0r = y0i[o][None, :]      # [1, 128]
                row_hit = ((y0r >= r0 - 1) & (y0r < r0 + block_rows))

                @pl.when(jnp.any(row_hit))
                def _():
                    # route columns: A[src, dst] with both x taps
                    lx = (x0i[o][:, None] - cs)          # [128, 1]
                    a = (jnp.where(k_iota == lx, wx[0][o][:, None], 0.0)
                         + jnp.where(k_iota == lx + 1,
                                     wx[1][o][:, None], 0.0))
                    # split source pixels by target row with y-tap weights
                    wr = (jnp.where(y0r == r0 + row_i, wy[0][o], 0.0)
                          + jnp.where(y0r + 1 == r0 + row_i,
                                      wy[1][o], 0.0))  # [block_rows,1,128]
                    v = v_views[s][0, o]                 # [128, C]
                    # [block_rows, 128, C] masked values -> matmul over src
                    mv = wr.reshape(block_rows, LANES, 1) * v[None]
                    mv = mv.transpose(0, 2, 1).reshape(
                        block_rows * C, LANES)
                    g = jnp.dot(mv, a, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                    g = g.reshape(block_rows, C, LANES).transpose(0, 2, 1)
                    out_ref[0] += g


@functools.partial(jax.jit, static_argnames=("vr", "block_rows"))
def fwarp_tpu(img: jnp.ndarray, flo: jnp.ndarray, *, vr: int = 64,
              block_rows: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU forward warp: Gaussian-weighted scatter-add of img [B,H,W,C]
    along flo [B,H,W,2] (ch0 = dx, ch1 = dy). Returns (warped,
    weight_norm [B,H,W,1]). Displacements beyond +-vr rows / +-127 cols
    are dropped (they land out of the swept window)."""
    b, h, w, c = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ty = gy + flo[..., 1].astype(jnp.float32)
    tx = gx + flo[..., 0].astype(jnp.float32)

    cp = _ceil_to(max(c + 1, 8), 8)
    wp = _ceil_to(w, LANES)
    hp = _ceil_to(h, block_rows)
    vr = min(vr, hp)
    vr_al = _ceil_to(vr + 2, 8)
    pad_top = vr_al
    pad_bot = vr_al + (hp - h)
    n_slabs = (2 * vr_al + block_rows) // 8

    # fuse the weight-normalizer as an extra ones channel
    vals = jnp.concatenate(
        [img.astype(jnp.float32), jnp.ones((b, h, w, 1), jnp.float32)],
        axis=-1)
    vals = jnp.pad(vals, ((0, 0), (pad_top, pad_bot),
                          (LANES, LANES + wp - w), (0, cp - c - 1)))
    # pad targets with -1e6 so padded source pixels never hit any block
    typ = jnp.pad(ty, ((0, 0), (pad_top, pad_bot),
                       (LANES, LANES + wp - w)),
                  constant_values=-1e6)
    txp = jnp.pad(tx, ((0, 0), (pad_top, pad_bot),
                       (LANES, LANES + wp - w)),
                  constant_values=-1e6)

    grid = (b, hp // block_rows, wp // LANES, n_slabs)

    kernel = functools.partial(
        _fwarp_kernel, C=cp, block_rows=block_rows, vr_al=vr_al)

    def view2d(s):
        return pl.BlockSpec(
            (1, 8, LANES),
            lambda b_, r_, c_, q_, s=s: (b_, (block_rows // 8) * r_ + q_,
                                         c_ + s),
            memory_space=pltpu.VMEM)

    def view3d(s):
        return pl.BlockSpec(
            (1, 8, LANES, cp),
            lambda b_, r_, c_, q_, s=s: (b_, (block_rows // 8) * r_ + q_,
                                         c_ + s, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), jnp.float32),
        grid=grid,
        in_specs=[view2d(0), view2d(1), view2d(2),
                  view2d(0), view2d(1), view2d(2),
                  view3d(0), view3d(1), view3d(2)],
        out_specs=pl.BlockSpec((1, block_rows, LANES, cp),
                               lambda b_, r_, c_, q_: (b_, r_, c_, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(typ, typ, typ, txp, txp, txp, vals, vals, vals)

    out = out[:, :h, :w]
    return (out[..., :c].astype(img.dtype),
            out[..., c:c + 1].astype(img.dtype))


# ---------------------------------------------------------------------------
# Shift-stencil forward warp (round-3 candidate; opt-in, interpreter-
# validated; see ROUND2_NOTES.md "Leads" for the on-chip plan)
# ---------------------------------------------------------------------------
def _fwarp_shift_kernel(*refs, C: int, block_rows: int, D: int, d_al: int,
                        n_slabs: int):
    """Descriptor-free forward warp: static shift-stencil sum with
    separable Gaussian masks. The source window arrives as n_slabs
    8-row x 3x128-col BlockSpec views of one packed (ty, tx, vals)
    array, so every slab offset is a PYTHON constant and every term is
    a static VMEM slice-multiply-add — no scatter, no matmul, no DMA.
    Displacements beyond the window drop (caller guards at runtime)."""
    out_ref = refs[-1]
    out_ref[0] = jnp.zeros_like(out_ref[0])

    for k in range(n_slabs):
        packed = jnp.concatenate(
            [refs[3 * k][0], refs[3 * k + 1][0], refs[3 * k + 2][0]],
            axis=1)                          # [8, 384, 2+C]
        # raw DISPLACEMENTS (not absolute targets): floor(x + d) - x can
        # differ from floor(d) when the f32 sum rounds across an integer
        # — the reference buckets by floor(d) (DeMFInet.py:654-680).
        # All coordinate/mask tensors stay 3-D keepdim [8, 384, 1]:
        # a 2-D squeezed mask re-broadcast via [..., None] lowers to a
        # gather Mosaic rejects ("Shape mismatch in input, indices and
        # output" — bisected 2026-08-17, scripts/mosaic_bisect.py).
        dyf = packed[..., 0:1]
        dxf = packed[..., 1:2]
        vals = packed[..., 2:]
        slab_lo = -d_al + 8 * k              # python int, rows rel. to r0
        gy = jnp.floor(dyf)
        gx = jnp.floor(dxf)
        fy = dyf - gy
        fx = dxf - gx
        r1 = gy.astype(jnp.int32)
        c1 = gx.astype(jnp.int32)
        wy = (jnp.exp(-(fy ** 2)), jnp.exp(-((fy - 1.0) ** 2)))
        wx = (jnp.exp(-(fx ** 2)), jnp.exp(-((fx - 1.0) ** 2)))

        hit = ((r1 >= -D) & (r1 <= D + 1) & (c1 >= -D) & (c1 <= D + 1))

        @pl.when(jnp.any(hit))
        def _(vals=vals, r1=r1, c1=c1, wy=wy, wx=wx, slab_lo=slab_lo):
            mx = {dx: jnp.where(c1 == dx, wx[0], 0.0)
                  + jnp.where(c1 == dx - 1, wx[1], 0.0)
                  for dx in range(-D, D + 2)}       # each [8, 384, 1]
            for dy in range(-D, D + 2):
                rel = slab_lo + dy           # static output row of row 0
                lo = max(rel, 0)
                hi = min(rel + 8, block_rows)
                if lo >= hi:
                    continue
                o0 = lo - rel
                o1 = o0 + (hi - lo)
                my = (jnp.where(r1[o0:o1] == dy, wy[0][o0:o1], 0.0)
                      + jnp.where(r1[o0:o1] == dy - 1, wy[1][o0:o1], 0.0))
                for dx in range(-D, D + 2):
                    sl = slice(LANES - dx, 2 * LANES - dx)
                    m2 = my[:, sl, :] * mx[dx][o0:o1, sl, :]  # [n,128,1]
                    out_ref[0, lo:hi] += vals[o0:o1, sl, :] * m2


def _fwarp_shift_kernel_v2(v0_ref, v1_ref, v2_ref, out_ref, *, C: int,
                           block_rows: int, D: int, d_al: int):
    """Compile-budget-bounded variant.

    Two structural changes vs the fully-unrolled v1 (whose remote
    compile exceeds the dev helper's budget — HTTP 500 after minutes;
    every individual construct compiles fine, /tmp/v2_bisect.py c1-c6
    all PASS on silicon):

      1. the slab sweep is the innermost GRID axis ("arbitrary"
         semantics, output block revisited) — one slab body per program;
      2. the dy sweep is a ``fori_loop`` writing full 8-row bands at a
         DYNAMIC row offset into a per-block padded canvas (dim1 of the
         rank-4 out ref is untiled, so any offset is legal), with a
         ``pl.when`` guard skipping bands outside the block.

    Only the 18 dx terms are unrolled: the Mosaic program is ~100x
    smaller than v1 at identical executed VPU work. The caller discards
    the 8-row canvas pads — an edge band a slab writes into a neighbour
    block's rows is recomputed by that neighbour, never summed twice.
    All coordinate/mask tensors stay 3-D keepdim [8, 384, 1] (a 2-D
    squeezed mask re-broadcast via [..., None] lowers to a gather
    Mosaic rejects — scripts/mosaic_bisect.py)."""
    q = pl.program_id(3)

    @pl.when(q == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    packed = jnp.concatenate(
        [v0_ref[0], v1_ref[0], v2_ref[0]], axis=1)   # [8, 384, 2+C]
    dyf = packed[..., 0:1]
    dxf = packed[..., 1:2]
    vals = packed[..., 2:]
    slab_lo = -d_al + 8 * q                  # traced, rows rel. to r0
    gy = jnp.floor(dyf)
    gx = jnp.floor(dxf)
    fy = dyf - gy
    fx = dxf - gx
    r1 = gy.astype(jnp.int32)
    c1 = gx.astype(jnp.int32)
    wy = (jnp.exp(-(fy ** 2)), jnp.exp(-((fy - 1.0) ** 2)))
    wx = (jnp.exp(-(fx ** 2)), jnp.exp(-((fx - 1.0) ** 2)))

    hit = ((r1 >= -D) & (r1 <= D + 1) & (c1 >= -D) & (c1 <= D + 1))

    @pl.when(jnp.any(hit))
    def _():
        mx = {dx: jnp.where(c1 == dx, wx[0], 0.0)
              + jnp.where(c1 == dx - 1, wx[1], 0.0)
              for dx in range(-D, D + 2)}           # each [8, 384, 1]

        def dy_body(j, _):
            dy = j - D                       # traced dy in [-D, D+1]
            rel = slab_lo + dy               # output row of slab row 0

            @pl.when((rel > -8) & (rel < block_rows))
            def _():
                my = (jnp.where(r1 == dy, wy[0], 0.0)
                      + jnp.where(r1 == dy - 1, wy[1], 0.0))
                band = jnp.zeros((8, LANES, C), jnp.float32)
                for dx in range(-D, D + 2):
                    sl = slice(LANES - dx, 2 * LANES - dx)
                    band = band + vals[:, sl, :] * (
                        my[:, sl, :] * mx[dx][:, sl, :])
                out_ref[0, pl.ds(8 + rel, 8)] += band
            return 0

        jax.lax.fori_loop(0, 2 * D + 2, dy_body, 0)


@functools.partial(jax.jit, static_argnames=("D", "block_rows", "v2"))
def fwarp_shift_tpu(img: jnp.ndarray, flo: jnp.ndarray, *, D: int = 8,
                    block_rows: int = 16, v2: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift-stencil forward warp; exact for |flo| <= D-1 (drops splats
    beyond the window — pair with the runtime motion guard). Same
    contract as fwarp_tpu."""
    b, h, w, c = img.shape
    cp = _ceil_to(max(c + 1, 8), 8)
    wp = _ceil_to(w, LANES)
    hp = _ceil_to(h, block_rows)
    d_al = _ceil_to(D + 2, 8)
    pad_top = d_al
    pad_bot = d_al + (hp - h)
    n_slabs = (2 * d_al + block_rows) // 8

    vals = jnp.concatenate(
        [img.astype(jnp.float32), jnp.ones((b, h, w, 1), jnp.float32)],
        axis=-1)
    vals = jnp.pad(vals, ((0, 0), (pad_top, pad_bot),
                          (LANES, LANES + wp - w), (0, cp - c - 1)))
    # pack (dy, dx, vals) so each slab view is ONE ref; padded sources
    # get -1e6 displacements and never hit any bucket
    coords = jnp.stack([flo[..., 1].astype(jnp.float32),
                        flo[..., 0].astype(jnp.float32)], axis=-1)
    coords = jnp.pad(coords, ((0, 0), (pad_top, pad_bot),
                              (LANES, LANES + wp - w), (0, 0)),
                     constant_values=-1e6)
    packed = jnp.concatenate([coords, vals], axis=-1)   # [B,Hp,Wp,2+cp]

    grid = (b, hp // block_rows, wp // LANES)

    def view(k, s):
        return pl.BlockSpec(
            (1, 8, LANES, 2 + cp),
            lambda b_, r_, c_, k=k, s=s: (b_, (block_rows // 8) * r_ + k,
                                          c_ + s, 0),
            memory_space=pltpu.VMEM)

    if v2:
        # per-block padded canvas: block_rows core rows + 8 pad rows on
        # each side so the fori_loop's dynamic 8-row band stores never
        # need clamping; pads are dropped below. The slab sweep is the
        # 4th grid axis (out block revisited across q).
        rows_blk = block_rows + 16
        n_rb = hp // block_rows
        kernel = functools.partial(
            _fwarp_shift_kernel_v2, C=cp, block_rows=block_rows, D=D,
            d_al=d_al)

        def qview(s):
            return pl.BlockSpec(
                (1, 8, LANES, 2 + cp),
                lambda b_, r_, c_, q_, s=s: (b_, (block_rows // 8) * r_
                                             + q_, c_ + s, 0),
                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n_rb * rows_blk, wp, cp),
                                           jnp.float32),
            grid=grid + (n_slabs,),
            in_specs=[qview(0), qview(1), qview(2)],
            out_specs=pl.BlockSpec((1, rows_blk, LANES, cp),
                                   lambda b_, r_, c_, q_: (b_, r_, c_, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
        )(packed, packed, packed)
        out = out.reshape(b, n_rb, rows_blk, wp, cp)[:, :, 8:8 + block_rows]
        out = out.reshape(b, hp, wp, cp)
    else:
        kernel = functools.partial(
            _fwarp_shift_kernel, C=cp, block_rows=block_rows, D=D,
            d_al=d_al, n_slabs=n_slabs)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), jnp.float32),
            grid=grid,
            in_specs=[view(k, s)
                      for k in range(n_slabs) for s in range(3)],
            out_specs=pl.BlockSpec((1, block_rows, LANES, cp),
                                   lambda b_, r_, c_: (b_, r_, c_, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(*([packed] * (3 * n_slabs)))

    out = out[:, :h, :w]
    return (out[..., :c].astype(img.dtype),
            out[..., c:c + 1].astype(img.dtype))
