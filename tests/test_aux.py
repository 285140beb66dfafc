"""Aux subsystems: profiling, async checkpointing, tOF."""
import os
import time

import numpy as np
import pytest

from demfi_tpu.utils.profiling import StepTimer
from demfi_tpu import metrics


def test_step_timer(tmp_path):
    t = StepTimer(str(tmp_path / "steps.jsonl"))
    for i in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(step=i)
    s = t.summary()
    assert s["count"] == 3 and s["mean"] >= 0.01
    assert os.path.exists(tmp_path / "steps.jsonl")


def test_async_manager_roundtrip(tmp_path):
    import jax, jax.numpy as jnp
    from demfi_tpu.config import config_rb
    from demfi_tpu.checkpoint.manager import AsyncExperimentManager

    cfg = config_rb(1, 1, checkpoint_dir=str(tmp_path / "c"),
                    text_dir=str(tmp_path / "t"),
                    log_dir=str(tmp_path / "l"),
                    test_img_dir=str(tmp_path / "i"))
    em = AsyncExperimentManager(cfg)
    params = {"params": {"w": jnp.arange(4.0)}}
    em.save_latest(params, meta={"last_epoch": 3}, best_psnr_flag=True)
    got, _, meta = em.load_latest(params)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.arange(4.0))
    assert meta["last_epoch"] == 3
    # best copy happened after the async write committed
    got2, _, _ = em.load_best_psnr(params)
    np.testing.assert_array_equal(np.asarray(got2["params"]["w"]),
                                  np.arange(4.0))


def test_tof_zero_for_identical_sequences():
    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (48, 64, 3)).astype(np.float32)
    b = np.roll(a, 3, axis=1)
    assert metrics.tof_pair(a, b, a, b) == pytest.approx(0.0, abs=1e-6)
    # different motion -> positive
    c = np.roll(a, -3, axis=1)
    assert metrics.tof_pair(a, b, a, c) > 0.01


def test_orbax_manager_roundtrip(tmp_path):
    import jax, jax.numpy as jnp
    from demfi_tpu.config import config_rb
    from demfi_tpu.checkpoint.manager import OrbaxExperimentManager

    cfg = config_rb(1, 1, checkpoint_dir=str(tmp_path / "c"),
                    text_dir=str(tmp_path / "t"),
                    log_dir=str(tmp_path / "l"),
                    test_img_dir=str(tmp_path / "i"))
    em = OrbaxExperimentManager(cfg)
    params = {"params": {"w": jnp.arange(6.0), "b": jnp.ones((2, 3))}}
    opt = {"mu": jnp.zeros(6)}
    em.save_latest(params, opt, meta={"last_epoch": 9}, best_psnr_flag=True)
    got, got_opt, meta = em.load_latest(params, opt)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.arange(6.0))
    np.testing.assert_array_equal(np.asarray(got_opt["mu"]), np.zeros(6))
    assert meta["last_epoch"] == 9
    got2, _, _ = em.load_best_psnr(params, opt)
    np.testing.assert_array_equal(np.asarray(got2["params"]["b"]),
                                  np.ones((2, 3)))


def test_calibrate_flow_head_exact_scaling():
    """calibrate_flow_head rescales ONLY the flow output channels, the
    scaling is exact (flows are linear in those kernel slices), and the
    non-flow outputs are untouched — so calibrated benchmarking times
    the same graph at a trained checkpoint's motion range."""
    import jax
    import jax.numpy as jnp

    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model
    from demfi_tpu.utils.profiling import calibrate_flow_head

    model = make_model(config_rb(1, 1, compute_dtype="float32"))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32, 64, 3)),
                         jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, jnp.zeros((1, 1)),
                        num_update=1)
    ctx0 = model.apply(params, frames, method=model.extract)
    m0 = float(max(np.abs(np.asarray(ctx0.flow_01)).max(),
                   np.abs(np.asarray(ctx0.flow_10)).max()))
    target = m0 / 3.0   # force a rescale regardless of init magnitudes
    params2, raw = calibrate_flow_head(params, model, frames,
                                       target=target)
    assert raw == pytest.approx(m0)
    ctx1 = model.apply(params2, frames, method=model.extract)
    s = target / m0
    # s*(sum k_i x_i) vs sum (s*k_i) x_i re-associates the f32 conv
    # accumulation: tolerance is relative to the ~60 px flow magnitudes
    np.testing.assert_allclose(np.asarray(ctx1.flow_01),
                               np.asarray(ctx0.flow_01) * s,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ctx1.flow_10),
                               np.asarray(ctx0.flow_10) * s,
                               rtol=1e-4, atol=1e-3)
    # everything that is not a flow channel is bit-identical
    np.testing.assert_array_equal(np.asarray(ctx1.f0),
                                  np.asarray(ctx0.f0))
    np.testing.assert_array_equal(np.asarray(ctx1.occ_0_logit),
                                  np.asarray(ctx0.occ_0_logit))
    # already-in-range params come back unchanged
    params3, _ = calibrate_flow_head(params2, model, frames,
                                     target=target * 10)
    assert params3 is params2
