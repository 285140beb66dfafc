"""Pallas warp kernel correctness in interpreter mode (CPU).

The same kernels run compiled on TPU; bench-time validation scripts
compare them against the exact XLA path on hardware. Here the Mosaic
interpreter checks the math (slab sweep, soft-one-hot matmuls, window
clamping) without a TPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from demfi_tpu.ops.warp import _bilinear_zeros
from demfi_tpu.ops.pallas_kernels import bilinear_gather_tpu, bwarp_tpu
import demfi_tpu.ops.warp as W


RNG = np.random.RandomState(0)


def xla_gather(img, coords):
    out, ones = _bilinear_zeros(jnp.asarray(img),
                                jnp.asarray(coords[..., 0]),
                                jnp.asarray(coords[..., 1]))
    return np.asarray(out), np.asarray(ones)


@pytest.mark.parametrize("scale,relative", [(3.0, True), (9.0, True),
                                            (6.0, False)])
def test_mm_gather_matches_xla(scale, relative):
    B, H, Wd, C = 1, 32, 128, 8
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(Wd), np.arange(H))
    if relative:
        coords = np.stack([gx, gy], -1)[None].astype(np.float32) \
            + RNG.randn(B, H, Wd, 2).astype(np.float32) * scale
    else:
        coords = (RNG.randn(B, H, Wd, 2) * scale + 4).astype(np.float32)

    want, want_ones = xla_gather(img, coords)
    with pltpu.force_tpu_interpret_mode():
        got, ones = bilinear_gather_tpu(jnp.asarray(img),
                                        jnp.asarray(coords),
                                        relative=relative, vr=24)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ones), want_ones, atol=1e-5)


def test_bwarp_tpu_matches_reference_path():
    B, H, Wd, C = 1, 32, 128, 8
    x = RNG.randn(B, H, Wd, C).astype(np.float32)
    flo = (RNG.randn(B, H, Wd, 2) * 4).astype(np.float32)
    want = np.asarray(W.bwarp(jnp.asarray(x), jnp.asarray(flo)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(bwarp_tpu(jnp.asarray(x), jnp.asarray(flo),
                                   vr=24))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_window_clamp_degrades_to_zero():
    """Taps beyond the vertical window produce zeros (documented
    deviation), never garbage."""
    B, H, Wd, C = 1, 32, 128, 8
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(Wd), np.arange(H))
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords[..., 1] += 100.0  # way beyond vr=24 rows
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(bilinear_gather_tpu(
            jnp.asarray(img), jnp.asarray(coords), relative=True,
            vr=24)[0])
    assert np.abs(got).max() == 0.0
