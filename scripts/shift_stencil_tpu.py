"""On-chip validation + timing of the shift-stencil forward warp
(ops/pallas_kernels.py:fwarp_shift_tpu) against the exact XLA path and
the current fused-scatter default — the round-3 perf lever (VERDICT
missing 2: fwarp costs 120 ms x2 per window via CFR).

Methodology: scalar-readback timing with in-jit fori_loop repetition
(memory: axon-tpu-environment). Writes shift_stencil_r03.json.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from demfi_tpu.ops.warp import _fwarp_xla, _fwarp_xla_quad
from demfi_tpu.ops.pallas_kernels import fwarp_shift_tpu

REPORT = {}


def put(k, v):
    REPORT[k] = v
    print(f"  {k} = {v}", flush=True)
    with open("/root/repo/shift_stencil_r03.json", "w") as f:
        json.dump(REPORT, f, indent=1)


def scalar_time(fn, *a, iters=6, inner=1, floor=0.0):
    def body(*a):
        def step(_, s):
            a0 = a[0] * jnp.sign(jnp.abs(s) * 1e-30 + 1.0)
            out = fn(a0, *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return s + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jax.lax.fori_loop(0, inner, step, jnp.float32(0.0))

    g = jax.jit(body)
    float(g(*a))
    t0 = time.time()
    for _ in range(iters):
        float(g(*a))
    return max((time.time() - t0) / iters - floor, 1e-9) / inner


def main():
    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)

    floor = scalar_time(lambda x: x + 1, jnp.ones((8, 128)), iters=10)
    put("dispatch_floor_ms", floor * 1000)

    # ---- correctness: moderate motion within the window (D=8 -> |f|<=7)
    b, h, w, c = 2, 96, 160, 2
    img = jnp.asarray(rs.uniform(-1, 1, (b, h, w, c)).astype(np.float32))
    flo = jnp.asarray(rs.uniform(-6.5, 6.5, (b, h, w, 2)).astype(np.float32))
    ref_v, ref_n = jax.jit(_fwarp_xla)(img, flo)
    try:
        got_v, got_n = jax.jit(
            lambda i, f: fwarp_shift_tpu(i, f, D=8))(img, flo)
        err_v = float(jnp.max(jnp.abs(got_v - ref_v)))
        err_n = float(jnp.max(jnp.abs(got_n - ref_n)))
        put("correct_maxerr_vals", err_v)
        put("correct_maxerr_norm", err_n)
        put("compiles", True)
    except Exception as e:  # noqa: BLE001
        put("compiles", False)
        put("compile_error", str(e)[:400])
        return

    # ---- timing at the CFR workload: B=7 t-batch, 352x640, C=2
    b, h, w, c = 7, 352, 640, 2
    img = jnp.asarray(rs.uniform(-1, 1, (b, h, w, c)).astype(np.float32))
    flo = jnp.asarray(rs.uniform(-6.5, 6.5, (b, h, w, 2)).astype(np.float32))

    t_quad = scalar_time(lambda f, i: _fwarp_xla_quad(i, f), flo, img,
                         inner=4, floor=floor)
    put("fused_scatter_ms", t_quad * 1000)

    for block_rows in (16, 32):
        t_shift = scalar_time(
            lambda f, i, br=block_rows: fwarp_shift_tpu(
                i, f, D=8, block_rows=br),
            flo, img, inner=4, floor=floor)
        put(f"shift_stencil_br{block_rows}_ms", t_shift * 1000)

    # big-motion guarded dispatch cost (cond with both branches)
    def guarded(f, i):
        ok = ~jnp.any(jnp.abs(f) > 7.0)
        return jax.lax.cond(
            ok, lambda i_, f_: fwarp_shift_tpu(i_, f_, D=8),
            _fwarp_xla_quad, i, f)
    t_g = scalar_time(guarded, flo, img, inner=4, floor=floor)
    put("guarded_dispatch_ms", t_g * 1000)


if __name__ == "__main__":
    main()
