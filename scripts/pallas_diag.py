"""Diagnose the axon remote-compile Pallas failure (ADVICE r3-2).

Round-3/4 measure runs recorded `pallas_error: HTTP 500:
tpu_compile_helper subprocess exit code 1` for the whole Pallas
section, which masks WHICH kernel regressed and WHY. This probe
compiles each shipped Pallas kernel (demfi_tpu/ops/pallas_kernels.py)
one at a time at a small geometry, plus two known-classification
controls:

- `control_blockspec`: a trivial BlockSpec-pipelined elementwise kernel
  (has always compiled through the relay helper);
- `control_manual_dma`: a trivial kernel with `pltpu.make_async_copy`
  (the helper has always REJECTED manual DMAs with HTTP 500 —
  CLAUDE.md "Environment traps").

Interpretation of the verdict matrix:
- controls pass/fail as documented + shipped kernels pass -> the old
  section-level error was one kernel; the per-kernel rows name it.
- `control_blockspec` fails too -> the helper regressed globally
  (toolchain issue, not our kernels).

Writes tpu_reports/pallas_diag.json. Safe to run on CPU (records
backend; kernels run in interpret mode off-TPU so only the TPU run is
meaningful for the helper question).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _clean(e: Exception) -> str:
    return re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "",
                  f"{type(e).__name__}: {str(e)[:500]}")[:400]


def _try(name: str, fn, report: dict) -> None:
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        # scalar readback — block_until_ready returns early on axon
        float(jnp.asarray(out[0] if isinstance(out, tuple) else out)
              .astype(jnp.float32).sum())
        report[name] = {"ok": True, "wall_s": round(time.time() - t0, 2)}
    except Exception as e:  # noqa: BLE001 — classifying arbitrary failures
        msg = _clean(e)
        kind = ("http500" if "HTTP 500" in msg else
                "oom" if "RESOURCE_EXHAUSTED" in msg else "other")
        report[name] = {"ok": False, "kind": kind,
                        "wall_s": round(time.time() - t0, 2), "error": msg}
        jax.clear_caches()
    print(f"  {name:24s} {report[name]}")


def control_blockspec():
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    x = jnp.ones((64, 256), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(2,),
        in_specs=[pl.BlockSpec((32, 256), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((32, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    )(x)


def control_manual_dma():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref, scratch, sem):
        cp = pltpu.make_async_copy(x_ref, scratch, sem)
        cp.start()
        cp.wait()
        o_ref[...] = scratch[...]

    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)


def gather_minimal():
    """Minimal slice of the _gather_kernel construct (round-4 VERDICT
    #9 minimization): ONE when-guarded iota-compare one-hot matmul —
    no row-pair loop, no source views, no accumulation grid. If this
    compiles while bwarp_tpu 500s, the helper failure is PROGRAM SIZE
    (the 16 row-pairs x 3 views unrolled whens), not the construct."""
    from jax.experimental import pallas as pl

    def kern(px_ref, img_ref, o_ref):
        px = px_ref[...]
        x0 = jnp.floor(px).astype(jnp.int32)
        fx = (px - jnp.floor(px)).astype(jnp.float32)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
        a = (jnp.where(k_iota == x0[:, :, None], 1.0 - fx[:, :, None], 0.0)
             + jnp.where(k_iota == x0[:, :, None] + 1, fx[:, :, None], 0.0))

        @pl.when(jnp.any(x0 >= 0))
        def _():
            g = jnp.dot(a.reshape(8 * 128, 128), img_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            o_ref[...] = g.reshape(8, 128, 64)

    px = jnp.abs(jnp.ones((8, 128), jnp.float32) * 13.3)
    img = jnp.ones((128, 64), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128, 64), jnp.float32),
    )(px, img)


def main() -> None:
    report = {"backend": jax.default_backend(),
              "jax": jax.__version__}
    print(f"pallas_diag on backend={report['backend']}")

    rng = np.random.RandomState(0)
    h, w = 64, 256
    x64 = jnp.asarray(rng.randn(1, h, w, 64).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, h, w, 2).astype(np.float32))
    flo = jnp.asarray((rng.randn(1, h, w, 2) * 5).astype(np.float32))
    coords = jnp.asarray((rng.randn(1, h, w, 2) * 8 + 4).astype(np.float32))

    _try("control_blockspec", control_blockspec, report)
    _try("control_manual_dma", control_manual_dma, report)

    from demfi_tpu.ops.pallas_kernels import (
        bilinear_sample_abs_tpu, bwarp_tpu, fwarp_tpu)
    _try("bwarp_tpu", lambda: bwarp_tpu(x64, flo), report)
    _try("fwarp_tpu", lambda: fwarp_tpu(x2, flo), report)
    _try("bilinear_sample_abs_tpu",
         lambda: bilinear_sample_abs_tpu(x64, coords), report)

    # minimization ladder for the gather-kernel HTTP 500 (VERDICT r4 #9):
    # construct alone -> small unrolled program -> shipped default.
    # wall_s matters as much as ok: the helper dies after ~85 s, so a
    # small-slab pass with a long wall says "compile-time blowup".
    _try("gather_minimal", gather_minimal, report)
    from demfi_tpu.ops.pallas_kernels import bilinear_gather_tpu
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    coords_rel = jnp.stack([gx + flo[..., 0], gy + flo[..., 1]], axis=-1)
    _try("bwarp_small_slab",
         lambda: bilinear_gather_tpu(x64, coords_rel, relative=True,
                                     vr=8, block_rows=8, slab_rows=8),
         report)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tpu_reports", "pallas_diag.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
