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


def test_fwarp_tpu_matches_reference_path():
    from demfi_tpu.ops.pallas_kernels import fwarp_tpu
    B, H, Wd, C = 1, 32, 128, 2
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    flo = (RNG.randn(B, H, Wd, 2) * 4).astype(np.float32)
    want, want_n = W.fwarp(jnp.asarray(img), jnp.asarray(flo))
    with pltpu.force_tpu_interpret_mode():
        got, got_n = fwarp_tpu(jnp.asarray(img), jnp.asarray(flo), vr=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               atol=1e-4, rtol=1e-4)


def test_cfr_with_pallas_fwarp_matches():
    """CFR composed on the pallas fwarp equals the XLA CFR."""
    from demfi_tpu.ops.pallas_kernels import fwarp_tpu
    import demfi_tpu.ops.warp as warp_mod
    B, H, Wd = 1, 32, 128
    f01 = (RNG.randn(B, H, Wd, 2) * 2).astype(np.float32)
    f10 = -f01
    t = np.array([0.625], np.float32)
    want0, want1 = W.cfr_flow_t_align(jnp.asarray(f01), jnp.asarray(f10),
                                      jnp.asarray(t))
    orig = warp_mod.fwarp
    try:
        with pltpu.force_tpu_interpret_mode():
            warp_mod.fwarp = (
                lambda img, flo, compute_dtype=None: fwarp_tpu(img, flo,
                                                               vr=24))
            got0, got1 = W.cfr_flow_t_align(
                jnp.asarray(f01), jnp.asarray(f10), jnp.asarray(t))
    finally:
        warp_mod.fwarp = orig
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               atol=1e-4, rtol=1e-4)


def test_mm_gather_batch_and_multitile():
    """B=2, C=16, W=384 (3 column tiles), flows near the vr boundary."""
    B, H, Wd, C = 2, 32, 384, 16
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(Wd), np.arange(H))
    base = np.stack([gx, gy], -1)[None].astype(np.float32)
    flows = RNG.uniform(-20, 20, (B, H, Wd, 2)).astype(np.float32)
    coords = base + flows
    want, want_ones = xla_gather(img, coords)
    with pltpu.force_tpu_interpret_mode():
        got, ones = bilinear_gather_tpu(jnp.asarray(img),
                                        jnp.asarray(coords),
                                        relative=True, vr=24)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ones), want_ones, atol=1e-5)


def test_mm_gather_horizontal_beyond_128_is_zero():
    """|dx| > 128 leaves the 3-tile window -> zero (documented)."""
    B, H, Wd, C = 1, 16, 256, 8
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(Wd), np.arange(H))
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords[..., 0] += 200.0
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(bilinear_gather_tpu(
            jnp.asarray(img), jnp.asarray(coords), relative=True, vr=16)[0])
    # each 128-col output tile reads source cols [tile-128, tile+256):
    # tile-0 cols 0..55 read x=200..255 (in-window -> true values);
    # cols 57..127 read x >= 257 (beyond window -> zero)
    want, _ = xla_gather(img, coords)
    np.testing.assert_allclose(got[:, :, :55], want[:, :, :55], atol=1e-5)
    assert np.abs(got[:, :, 57:128]).max() == 0.0


def test_fwarp_tpu_batch2():
    from demfi_tpu.ops.pallas_kernels import fwarp_tpu
    B, H, Wd, C = 2, 32, 256, 2
    img = RNG.randn(B, H, Wd, C).astype(np.float32)
    flo = (RNG.randn(B, H, Wd, 2) * 6).astype(np.float32)
    want, want_n = W.fwarp(jnp.asarray(img), jnp.asarray(flo))
    with pltpu.force_tpu_interpret_mode():
        got, got_n = fwarp_tpu(jnp.asarray(img), jnp.asarray(flo), vr=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               atol=1e-4, rtol=1e-4)


def test_bounded_motion_guard_falls_back_to_exact():
    """200 px in-image motion exceeds the static window (vr=64): the
    dispatch guard must take the exact XLA branch and return identical
    output — the window can never silently truncate (VERDICT r1 item 3)."""
    import demfi_tpu.ops.warp as warp_mod
    B, H, Wd, C = 1, 256, 128, 4
    x = RNG.randn(B, H, Wd, C).astype(np.float32)
    flo = np.zeros((B, H, Wd, 2), np.float32)
    flo[..., 1] = -200.0  # rows 200.. sample in-image rows 0.. -> in_img
    want = np.asarray(warp_mod._bwarp_xla(jnp.asarray(x), jnp.asarray(flo)))
    assert np.abs(want).max() > 0  # the motion really lands in-image
    orig = warp_mod._use_pallas
    try:
        warp_mod._use_pallas = lambda: True
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(W.bwarp(jnp.asarray(x), jnp.asarray(flo)))
            fw_want = warp_mod._fwarp_xla(jnp.asarray(x), jnp.asarray(flo))
            fw_got = W.fwarp(jnp.asarray(x), jnp.asarray(flo))
    finally:
        warp_mod._use_pallas = orig
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(fw_got[0]),
                                  np.asarray(fw_want[0]))
    np.testing.assert_array_equal(np.asarray(fw_got[1]),
                                  np.asarray(fw_want[1]))


def test_guard_keeps_pallas_for_out_of_image_motion():
    """Huge flows that land fully OUTSIDE the image are zero on both
    paths, so the guard must NOT force a fallback (both agree)."""
    import demfi_tpu.ops.warp as warp_mod
    B, H, Wd, C = 1, 32, 128, 4
    x = RNG.randn(B, H, Wd, C).astype(np.float32)
    flo = np.full((B, H, Wd, 2), 1e5, np.float32)
    orig = warp_mod._use_pallas
    try:
        warp_mod._use_pallas = lambda: True
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(W.bwarp(jnp.asarray(x), jnp.asarray(flo)))
    finally:
        warp_mod._use_pallas = orig
    assert np.abs(got).max() == 0.0


def test_pallas_dispatch_is_differentiable():
    """Grads must flow through the Pallas dispatch (training on TPU):
    custom_vjp recomputes through the exact XLA path, so gradients equal
    the XLA-path gradients bit-for-bit."""
    import demfi_tpu.ops.warp as warp_mod
    B, H, Wd, C = 1, 16, 128, 4
    x = jnp.asarray(RNG.randn(B, H, Wd, C), jnp.float32)
    flo = jnp.asarray(RNG.randn(B, H, Wd, 2) * 3, jnp.float32)

    def loss_b(x, f):
        return jnp.sum(W.bwarp(x, f) ** 2)

    def loss_f(x, f):
        o, n = W.fwarp(x, f)
        return jnp.sum(o ** 2) + jnp.sum(n ** 2)

    def loss_a(x, f):
        return jnp.sum(W.bilinear_sample_abs(x, f) ** 2)

    want = [jax.grad(l, argnums=(0, 1))(x, flo)
            for l in (loss_b, loss_f, loss_a)]
    orig = warp_mod._use_pallas
    try:
        warp_mod._use_pallas = lambda: True
        with pltpu.force_tpu_interpret_mode():
            got = [jax.grad(l, argnums=(0, 1))(x, flo)
                   for l in (loss_b, loss_f, loss_a)]
    finally:
        warp_mod._use_pallas = orig
    # bwd is the exact XLA vjp on both paths; the residual tolerance is
    # pallas-vs-XLA float noise in the PRIMAL feeding dL/dout = 2*out
    for (gw_x, gw_f), (gg_x, gg_f) in zip(want, got):
        np.testing.assert_allclose(np.asarray(gg_x), np.asarray(gw_x),
                                   atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gw_f),
                                   atol=5e-4, rtol=1e-4)


def test_full_model_through_pallas_dispatch():
    """Run the whole DeMFI forward with the pallas warp dispatch forced on
    (interpreter mode) and compare against the exact XLA path — derisks
    the integration the TPU bench executes."""
    import demfi_tpu.ops.warp as warp_mod
    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model

    cfg = config_rb(1, 1)
    model = make_model(cfg)
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32, 128, 3)),
                         jnp.float32)
    t = jnp.array([[0.375]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, t, num_update=1)
    want = model.apply(params, frames, t, num_update=1)

    orig = warp_mod._use_pallas
    try:
        warp_mod._use_pallas = lambda: True
        with pltpu.force_tpu_interpret_mode():
            got = model.apply(params, frames, t, num_update=1)
    finally:
        warp_mod._use_pallas = orig

    np.testing.assert_allclose(np.asarray(got.st_prime),
                               np.asarray(want.st_prime),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.st_final),
                               np.asarray(want.st_final),
                               atol=5e-4, rtol=1e-3)


def test_fwarp_shift_stencil_matches_xla():
    """Round-3 candidate kernel: descriptor-free shift-stencil forward
    warp (static VMEM slice-adds over per-slab views, no scatter/DMA).
    Exact vs the XLA oracle within its |flo| <= D-1 window, including
    border-drop semantics. Buckets by floor(displacement) — floor of
    the rounded absolute target differs on f32 integer crossings."""
    from demfi_tpu.ops.pallas_kernels import fwarp_shift_tpu
    from demfi_tpu.ops.warp import _fwarp_xla

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 48, 256, 2).astype(np.float32))
    flo = jnp.asarray(rng.uniform(-6.9, 6.9, (2, 48, 256, 2)
                                  ).astype(np.float32))
    want, wantn = _fwarp_xla(x, flo)
    # v2 (fori-loop dy sweep + padded canvas; the deployable variant —
    # v1's fully-unrolled program exceeds the compile helper's limits)
    with pltpu.force_tpu_interpret_mode():
        got, gotn = fwarp_shift_tpu(x, flo, D=8, v2=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gotn), np.asarray(wantn),
                               atol=1e-5)
    # v1 (reference formulation) kept in sync
    with pltpu.force_tpu_interpret_mode():
        got1, gotn1 = fwarp_shift_tpu(x, flo, D=8, v2=False)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               atol=1e-5)
