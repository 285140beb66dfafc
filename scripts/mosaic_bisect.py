"""Bisect which Mosaic/Pallas constructs the axon TPU compile helper
accepts — drives the round-3 redesign of the shift-stencil fwarp kernel
(ops/pallas_kernels.py:fwarp_shift_tpu), whose on-chip compile was
rejected in round 2 (ROUND2_NOTES.md "Leads").

Each case is a tiny standalone kernel exercising ONE construct. Run on
TPU; prints PASS/FAIL (+ the error head) per case, and writes a JSON
summary next to the other measurement artifacts.
"""
from __future__ import annotations

import functools
import json
import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

C = 8
RESULTS = {}


def run_case(name, fn):
    try:
        out = jax.block_until_ready(fn())
        s = float(jnp.sum(out.astype(jnp.float32)))
        RESULTS[name] = {"ok": True, "checksum": s}
        print(f"PASS {name}  (sum={s:.3f})", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = "".join(traceback.format_exception_only(type(e), e))[:400]
        RESULTS[name] = {"ok": False, "error": msg}
        print(f"FAIL {name}: {msg.splitlines()[0][:160]}", flush=True)


# --------------------------------------------------------------- cases
def case_ref_major_unaligned_write():
    # out_ref[0, 3:11] += v : unaligned slice of an UNTILED (major) dim
    # of a rank-4 ref. Suspected round-2 culprit — confirm or clear it.
    def k(x_ref, o_ref):
        o_ref[0] = jnp.zeros_like(o_ref[0])
        o_ref[0, 3:11] += x_ref[0, 3:11] * 2.0

    x = jnp.ones((1, 16, 128, C), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 16, 128, C), jnp.float32),
    )(x)


def case_val_sublane_unaligned_slice_3d():
    # y[:, 37:165, :] on [8, 384, C] (dim1 = sublane axis, unaligned)
    def k(x_ref, o_ref):
        y = x_ref[...]
        o_ref[...] = y[:, 37:165, :]

    x = jnp.ones((8, 384, C), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128, C), jnp.float32))(x)


def case_val_sublane_unaligned_slice_dim0():
    # y[3:8] on [8, 384] (dim0 = sublane axis of a 2D value, unaligned)
    def k(x_ref, o_ref):
        y = x_ref[...]
        o_ref[...] = jnp.pad(y[3:8], ((0, 3), (0, 0)))

    x = jnp.ones((8, 384), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32))(x)


def case_val_lane_unaligned_slice():
    # y[:, 37:165] on [8, 384] (dim1 = LANE axis, unaligned)
    def k(x_ref, o_ref):
        y = x_ref[...]
        o_ref[...] = y[:, 37:165]

    x = jnp.ones((8, 384), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)


def case_pltpu_roll_sublane_3d():
    # pltpu.roll along the sublane axis of [8, 384, C]
    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 5, 1)

    x = jnp.arange(8 * 384 * C, dtype=jnp.float32).reshape(8, 384, C)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384, C), jnp.float32))(x)


def case_pltpu_roll_lane_2d():
    # pltpu.roll along the lane axis of [8, 384]
    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 5, 1)

    x = jnp.arange(8 * 384, dtype=jnp.float32).reshape(8, 384)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32))(x)


def case_concat_sublane_unaligned():
    # concatenate pieces of 3 and 5 rows on the sublane axis
    def k(x_ref, o_ref):
        y = x_ref[...]
        o_ref[...] = jnp.concatenate(
            [y[:, :131, :], y[:, 131:384, :]], axis=1)

    x = jnp.ones((8, 384, C), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384, C), jnp.float32))(x)


def case_ref_unaligned_sublane_write_3d():
    # o_ref[:, 37:165, :] = v : unaligned sublane slice WRITE
    def k(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[:, 37:165, :] = x_ref[...]

    x = jnp.ones((8, 128, C), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384, C), jnp.float32))(x)


def case_shift_stencil_mini():
    # a miniature of the actual fwarp shift-stencil inner loop:
    # value sublane slices at data-independent (python) offsets, masked
    # multiply-add into unaligned major-dim ref rows
    def k(p_ref, o_ref):
        o_ref[0] = jnp.zeros_like(o_ref[0])
        packed = p_ref[0]          # [8, 384, 2+C]
        dyf = packed[..., 0]
        vals = packed[..., 2:]
        r1 = jnp.floor(dyf).astype(jnp.int32)
        for dy in range(-2, 3):
            rel = 4 + dy
            lo, hi = max(rel, 0), min(rel + 8, 16)
            if lo >= hi:
                continue
            o0, o1 = lo - rel, lo - rel + (hi - lo)
            my = jnp.where(r1[o0:o1] == dy, 1.0, 0.0)
            sl = slice(128 - dy, 256 - dy)
            o_ref[0, lo:hi] += vals[o0:o1, sl, :] * my[:, sl, None]

    x = jnp.ones((1, 8, 384, 2 + C), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 16, 128, C), jnp.float32))(x)


def case_dynamic_rotate():
    # data-dependent roll amount (pltpu.roll with traced shift)
    def k(x_ref, s_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)

    x = jnp.arange(8 * 384, dtype=jnp.float32).reshape(8, 384)
    s = jnp.asarray([5], jnp.int32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
    )(x, s)


CASES = [
    ("ref_major_unaligned_write", case_ref_major_unaligned_write),
    ("val_sublane_unaligned_slice_3d", case_val_sublane_unaligned_slice_3d),
    ("val_sublane_unaligned_slice_dim0",
     case_val_sublane_unaligned_slice_dim0),
    ("val_lane_unaligned_slice", case_val_lane_unaligned_slice),
    ("pltpu_roll_sublane_3d", case_pltpu_roll_sublane_3d),
    ("pltpu_roll_lane_2d", case_pltpu_roll_lane_2d),
    ("concat_sublane_unaligned", case_concat_sublane_unaligned),
    ("ref_unaligned_sublane_write_3d", case_ref_unaligned_sublane_write_3d),
    ("shift_stencil_mini", case_shift_stencil_mini),
    ("dynamic_rotate", case_dynamic_rotate),
]


def main():
    only = sys.argv[1:] or None
    print("devices:", jax.devices(), flush=True)
    for name, fn in CASES:
        if only and name not in only:
            continue
        run_case(name, fn)
    with open("/root/repo/mosaic_bisect_r03.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
