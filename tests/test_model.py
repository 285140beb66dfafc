"""Model-level tests: parameter count vs Table 2, shapes, staged-forward
equivalence, bs/rb variants."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demfi_tpu.config import DeMFIConfig, config_bs, config_rb
from demfi_tpu.models import make_model


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


@pytest.fixture(scope="module")
def rb_model_and_params():
    cfg = config_rb(5, 3)
    model = make_model(cfg)
    frames = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    t = jnp.array([[0.5]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, t, num_update=1)
    return model, params


def test_param_count_rb(rb_model_and_params):
    """Table 2 (figures/Table2.PNG): DeMFI-Net_rb has 7.41 M params."""
    _, params = rb_model_and_params
    n = n_params(params)
    assert abs(n - 7.41e6) < 0.02e6, f"rb params {n} != 7.41M"


def test_param_count_bs():
    """Table 2: DeMFI-Net_bs (no Stage II) has 5.96 M params."""
    cfg = config_bs()
    model = make_model(cfg)
    frames = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    t = jnp.array([[0.5]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), frames, t, num_update=0)
    n = n_params(params)
    assert abs(n - 5.96e6) < 0.02e6, f"bs params {n} != 5.96M"


def test_forward_shapes(rb_model_and_params):
    model, params = rb_model_and_params
    frames = jnp.asarray(
        np.random.RandomState(0).randn(2, 4, 64, 64, 3), jnp.float32)
    t = jnp.array([[0.25], [0.75]], jnp.float32)
    out = model.apply(params, frames, t, num_update=3)
    assert out.st_prime.shape == (2, 64, 64, 3)
    assert out.s0_final.shape == (3, 2, 64, 64, 3)
    assert out.flow_preds.shape == (4, 2, 64, 64, 4)
    assert out.occ0_preds.shape == (4, 2, 64, 64, 1)
    assert out.ovlp_b0b1.shape == (2, 64, 64, 3)
    for arr in (out.st_prime, out.st_final, out.flow_preds):
        assert np.isfinite(np.asarray(arr)).all()


def test_staged_forward_matches_full(rb_model_and_params):
    """extract() + synthesize() must equal __call__ (the t-batched eval
    engine relies on this decomposition)."""
    model, params = rb_model_and_params
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randn(1, 4, 32, 32, 3), jnp.float32)
    t = jnp.array([[0.375]], jnp.float32)

    full = model.apply(params, frames, t, num_update=2)
    ctx = model.apply(params, frames, method=model.extract)
    staged = model.apply(params, ctx, t, 2, method=model.synthesize)
    np.testing.assert_allclose(np.asarray(full.st_final),
                               np.asarray(staged.st_final), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.s0_prime),
                               np.asarray(staged.s0_prime), atol=1e-6)


def test_scan_booster_matches_unrolled(rb_model_and_params):
    """The nn.scan Stage-II loop must match the Python unroll: identical
    parameter tree (Stage-II modules stay direct children — checkpoint
    converter untouched) and equal outputs up to fp32 fusion noise
    (lax.scan compiles ONE body; the unroll lets XLA fuse each iteration
    differently, so bitwise equality is not expected)."""
    from demfi_tpu.models.demfi import DeMFINet

    model, params = rb_model_and_params  # default: scan_booster=True
    unrolled = DeMFINet(scan_booster=False)

    # param-tree parity: init the unrolled variant with the same seed
    frames0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    p2 = unrolled.init(jax.random.PRNGKey(0), frames0,
                       jnp.array([[0.5]], jnp.float32), num_update=1)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [jax.tree_util.keystr(k) for k, _ in flat1] == \
           [jax.tree_util.keystr(k) for k, _ in flat2]
    for (_, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    frames = jnp.asarray(
        np.random.RandomState(3).randn(2, 4, 32, 48, 3), jnp.float32)
    t = jnp.array([[0.25], [0.625]], jnp.float32)
    o_scan = model.apply(params, frames, t, num_update=3)
    o_unrl = unrolled.apply(params, frames, t, num_update=3)
    for name in ("st_prime", "s0_final", "s1_final", "st_final",
                 "flow_preds", "occ0_preds"):
        np.testing.assert_allclose(
            np.asarray(getattr(o_scan, name)),
            np.asarray(getattr(o_unrl, name)), atol=1e-4,
            err_msg=name)


def test_gru_concat_matches_split(rb_model_and_params, monkeypatch):
    """SepConvGRU's two formulations (DEMFI_GRU_CONCAT=1 concat-hx vs
    =0 split-conv, models/demfi.py:350+) are exact-math rewrites of the
    reference convs (DeMFInet.py:827-857) over the SAME parameter tree;
    outputs must agree up to f32 fusion reassociation (same 1e-4 bar as
    the scan/unroll equivalence — measured drift 3.6e-5 after three
    boosting iterations)."""
    model, params = rb_model_and_params
    frames = jnp.asarray(
        np.random.RandomState(7).randn(1, 4, 32, 48, 3), jnp.float32)
    t = jnp.array([[0.5]], jnp.float32)

    monkeypatch.setenv("DEMFI_GRU_CONCAT", "1")
    o_cat = model.apply(params, frames, t, num_update=3)
    monkeypatch.setenv("DEMFI_GRU_CONCAT", "0")
    o_split = model.apply(params, frames, t, num_update=3)
    for name in ("st_final", "s0_final", "s1_final", "flow_preds"):
        np.testing.assert_allclose(
            np.asarray(getattr(o_cat, name)),
            np.asarray(getattr(o_split, name)), atol=1e-4, err_msg=name)


def test_iterations_accumulate(rb_model_and_params):
    """num_update=1 outputs must equal the first iteration of num_update=3."""
    model, params = rb_model_and_params
    frames = jnp.asarray(
        np.random.RandomState(2).randn(1, 4, 32, 32, 3), jnp.float32)
    t = jnp.array([[0.5]], jnp.float32)
    o1 = model.apply(params, frames, t, num_update=1)
    o3 = model.apply(params, frames, t, num_update=3)
    np.testing.assert_allclose(np.asarray(o1.st_final[0]),
                               np.asarray(o3.st_final[0]), atol=1e-6)
    # later iterations actually change the result
    assert not np.allclose(np.asarray(o3.st_final[0]),
                           np.asarray(o3.st_final[2]))
