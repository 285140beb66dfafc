"""Pallas TPU kernels for the irregular-memory warping ops.

XLA lowers arbitrary gathers to near-scalar loops on TPU (~2 s for one
64-channel 640x352 backward warp), so the bilinear gather at the heart of
``bwarp``/FGAC is hand-written here.

Kernel design (bilinear_gather_tpu):
  The only fast dynamic gather Mosaic exposes is ``take_along_axis`` on a
  [sublanes, 128] block along lanes. A 2D bilinear gather decomposes
  canonically into a sweep over candidate source *rows* (the "delta sweep"):
  for each window row offset d, pixels whose vertical tap lands on that row
  contribute a lane-gather from an aligned 8/16-row slice of the source
  window. The sweep is predicated (@pl.when) on any pixel actually using
  the row, so cost adapts to the true vertical span of the flow instead of
  the worst case. Horizontally, each 128-column output tile gathers from
  the 3 source tiles covering +-128 px, each predicated as well.

  Out-of-window taps contribute zero. The source image is zero-padded so
  in-window/out-of-image taps read zeros — exactly grid_sample's
  zeros-padding (/root/reference/DeMFInet.py:508, 757). Taps farther than
  the static window (|dy| > vr, |dx| > 127) also produce zero instead of
  the reference's true sample; callers pick vr large enough that this
  affects only extreme-motion outliers.

  Channels are packed into the gather operand's sublane axis ([Cc*rows,
  128]) so one gather serves a whole channel chunk.

Two addressing modes:
  relative=True  : source rows cluster around the output row (bwarp).
                   Window = output band +- vr rows.
  relative=False : absolute coordinates near the image origin (the FGAC
                   absolute-coordinate quirk, DeMFInet.py:413-419).
                   Window = rows [-2, span+8).
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


def _gather_kernel(py_ref, px_ref, img_ref, out_ref, win, sem, *,
                   Cc: int, WR: int, H: int, W: int, Wpad: int,
                   pad_rows: int, pad_cols: int, block_rows: int,
                   n_ctiles: int, relative: bool, vr: int):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    cc = pl.program_id(2)
    r0 = rb * block_rows
    ws = (r0 - vr - 1) if relative else -2  # window start, image row coords

    # Align the DMA row start down to the sublane tiling (8); WR carries
    # +8 slack so the window still covers all needed rows.
    start_p = ws + pad_rows
    aligned = pl.multiple_of((start_p // 8) * 8, 8)
    ws = aligned - pad_rows

    dma = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(pl.multiple_of(cc * Cc, Cc), Cc),
                   pl.ds(aligned, WR), :],
        win, sem)
    dma.start()

    py = py_ref[0]   # [block_rows, W]
    px = px_ref[0]
    y0f = jnp.floor(py)
    fy = py - y0f
    x0f = jnp.floor(px)
    fx = px - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    out_ref[0] = jnp.zeros_like(out_ref[0])

    dma.wait()

    # Sweep candidate source rows in aligned 8-row slabs (Mosaic requires
    # sublane slice starts to be multiples of 8); rows within a slab are
    # selected at value level and broadcast across the output block.
    n_slabs = WR // 8

    def slab_body(q, _):
        q8 = pl.multiple_of(q * 8, 8)
        slab = win[:, pl.ds(q8, 8), :]          # [Cc, 8, Wpad] (aligned)
        slab_lo = ws + q * 8                    # image row of slab row 0

        # any tap row in this slab?
        in_slab0 = (y0 >= slab_lo) & (y0 < slab_lo + 8)
        in_slab1 = (y0 + 1 >= slab_lo) & (y0 + 1 < slab_lo + 8)

        @pl.when(jnp.any(in_slab0 | in_slab1))
        def _():
            for o in range(8):
                src_row = slab_lo + o
                hit0 = y0 == src_row
                hit1 = y0 + 1 == src_row
                hit = hit0 | hit1

                @pl.when(jnp.any(hit))
                def _():
                    wrow = (jnp.where(hit0, 1.0 - fy, 0.0)
                            + jnp.where(hit1, fy, 0.0))
                    row = slab[:, o, :]         # [Cc, Wpad] value select
                    for c in range(n_ctiles):
                        cs = c * LANES
                        x0_t = x0[:, cs:cs + LANES]
                        fx_t = fx[:, cs:cs + LANES]
                        w_t = wrow[:, cs:cs + LANES]
                        hit_t = hit[:, cs:cs + LANES]

                        @pl.when(jnp.any(hit_t))
                        def _():
                            for s in range(3):  # source tiles: +-128 px
                                base = cs + s * LANES - pad_cols
                                rt = row[:, cs + s * LANES:
                                         cs + (s + 1) * LANES]  # [Cc,128]
                                opm = jnp.broadcast_to(
                                    rt[:, None, :],
                                    (Cc, block_rows, LANES)
                                ).reshape(Cc * block_rows, LANES)
                                for tx in (0, 1):
                                    xt = x0_t + tx
                                    lidx = xt - base
                                    inr = (lidx >= 0) & (lidx < LANES)

                                    @pl.when(jnp.any(inr & hit_t))
                                    def _():
                                        wx = fx_t if tx else 1.0 - fx_t
                                        w = (w_t * wx
                                             * inr.astype(jnp.float32))
                                        idx = jnp.clip(lidx, 0, LANES - 1)
                                        idx = jnp.broadcast_to(
                                            idx[None],
                                            (Cc, block_rows, LANES)
                                        ).reshape(Cc * block_rows, LANES)
                                        g = jnp.take_along_axis(
                                            opm, idx, axis=1)
                                        g = g.reshape(
                                            Cc, block_rows, LANES)
                                        out_ref[0, :, :, cs:cs + LANES] \
                                            += g * w[None]

    jax.lax.fori_loop(0, n_slabs, slab_body, None)


@functools.partial(
    jax.jit, static_argnames=("relative", "vr", "block_rows", "c_chunk"))
def bilinear_gather_tpu(img: jnp.ndarray, coords: jnp.ndarray, *,
                        relative: bool = True, vr: int = 48,
                        block_rows: int = 16, c_chunk: int = 8
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear gather of img [B,H,W,C] at absolute pixel coords
    [B,H,W,2] (x, y). Returns (values [B,H,W,C], ones [B,H,W,1]) where
    ``ones`` is the closed-form warp of an all-ones image with
    grid_sample's in-image validity (used for bwarp's 0.999 mask).
    """
    b, h, w, c = img.shape
    dtype = img.dtype
    px = coords[..., 0].astype(jnp.float32)
    py = coords[..., 1].astype(jnp.float32)

    # pad channel count to a multiple of c_chunk, W to a multiple of 128
    cp = _ceil_to(c, c_chunk)
    wp_out = _ceil_to(w, LANES)
    hp_out = _ceil_to(h, block_rows)
    pad_rows = vr + 18  # slack for WR rounding + DMA start down-alignment
    pad_cols = LANES

    imgp = jnp.pad(img.astype(jnp.float32),
                   ((0, 0), (pad_rows, pad_rows + hp_out - h),
                    (pad_cols, pad_cols + wp_out - w), (0, cp - c)))
    imgp = imgp.transpose(0, 3, 1, 2)  # [B, C, Hpad, Wpad]
    wpad = imgp.shape[3]

    pxp = jnp.pad(px, ((0, 0), (0, hp_out - h), (0, wp_out - w)),
                  constant_values=-1e6)
    pyp = jnp.pad(py, ((0, 0), (0, hp_out - h), (0, wp_out - w)),
                  constant_values=-1e6)

    wr = _ceil_to(((2 * vr + 2 + block_rows) if relative
                   else (vr + 2 + block_rows)) + 8, 8)
    n_ctiles = wp_out // LANES
    grid = (b, hp_out // block_rows, cp // c_chunk)

    kernel = functools.partial(
        _gather_kernel, Cc=c_chunk, WR=wr, H=h, W=wp_out, Wpad=wpad,
        pad_rows=pad_rows, pad_cols=pad_cols, block_rows=block_rows,
        n_ctiles=n_ctiles, relative=relative, vr=vr)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, cp, hp_out, wp_out), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_rows, wp_out),
                         lambda b_, r_, c_: (b_, r_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, wp_out),
                         lambda b_, r_, c_: (b_, r_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c_chunk, block_rows, wp_out),
                               lambda b_, r_, c_: (b_, c_, r_, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_chunk, wr, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(pyp, pxp, imgp)

    vals = out.transpose(0, 2, 3, 1)[:, :h, :w, :c].astype(dtype)

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


def bwarp_tpu(x: jnp.ndarray, flow: jnp.ndarray, *, vr: int = 48) -> jnp.ndarray:
    """TPU fast path for demfi_tpu.ops.bwarp (same semantics; taps farther
    than vr rows vertically or 128 px horizontally contribute zero)."""
    b, h, w, c = x.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    coords = jnp.stack([gx + flow[..., 0].astype(jnp.float32),
                        gy + flow[..., 1].astype(jnp.float32)], axis=-1)
    vals, ones = bilinear_gather_tpu(x, coords, relative=True, vr=vr)
    mask = (ones >= 0.999).astype(x.dtype)
    return vals * mask


def bilinear_sample_abs_tpu(img: jnp.ndarray, coords: jnp.ndarray, *,
                            span: int = 96) -> jnp.ndarray:
    """TPU fast path for the FGAC absolute-coordinate sampler: coordinates
    cluster near the origin (raw flow values), so the window is rows
    [-2, span+block)."""
    vals, _ = bilinear_gather_tpu(img, coords, relative=False, vr=span)
    return vals
