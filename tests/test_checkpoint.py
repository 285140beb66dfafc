"""Checkpoint conversion tests.

The strongest test here imports the *reference* PyTorch model from
/root/reference at test time as an oracle (no reference code is copied
into this repo): we initialize the torch model, convert its state dict
to Flax, run both on identical inputs, and require full-network
activation parity. This is equivalent to validating the released
checkpoint path end to end.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from demfi_tpu.config import config_rb
from demfi_tpu.models import make_model
from demfi_tpu.checkpoint import (
    convert_torch_state_dict, flax_to_torch_state_dict)
from demfi_tpu.checkpoint.convert import (
    torch_key_to_flax_path, flax_path_to_torch_key)


def test_key_mapping_roundtrip():
    keys = [
        "FF_RDB_Module.SFENet1.weight",
        "FF_RDB_Module.RDBs.3.convs.2.conv.0.weight",
        "FF_RDB_Module.RDBs.11.LFF.bias",
        "FF_RDB_Module.GFF.0.weight",
        "FF_RDB_Module.UPNet.2.bias",
        "FAC_FB_Module.feature_extraction.4.conv1.weight",
        "FAC_FB_Module.shared_FGAC.w_gen_2.weight",
        "Refine_Module.enc1.weight",
        "Dec_first.weight",
        "Decoder_res.2.conv1.weight",
        "Dec_last1.bias",
        "Ch_Reducer.weight",
        "Booster_Module.Mixer.conv_ref1.weight",
        "Booster_Module.GB.convz1.weight",
        "Booster_Module.flow_occ.conv2.bias",
        "Dec_first_2.weight",
        "Decoder_res_2.4.conv2.weight",
        "Dec_last2_2.bias",
    ]
    for k in keys:
        path, leaf = torch_key_to_flax_path(k)
        back = flax_path_to_torch_key(path + (leaf,))
        assert back == k, f"{k} -> {path} -> {back}"


@pytest.fixture(scope="module")
def torch_reference():
    """Instantiate the reference model (oracle only — never vendored)."""
    import torch

    sys.path.insert(0, "/root/reference")
    from DeMFInet import DeMFInet as TorchDeMFINet  # noqa

    class Args:
        gpu = 0
        nf = 64
        scale_factor = 2
        num_ResB_FACFB = 5
        num_ResB_Dec = 5
        shared_FGAC_flag = True
        visualization_flag = False

    torch.manual_seed(0)
    model = TorchDeMFINet(Args())
    model.eval()
    return model


def test_full_network_activation_parity(torch_reference):
    """Convert the torch model's weights and require Stage I + Stage II
    output parity on the same input — the checkpoint-porting contract."""
    import torch

    tm = torch_reference
    variables = convert_torch_state_dict(tm.state_dict())

    cfg = config_rb(5, 3)
    model = make_model(cfg)

    rng = np.random.RandomState(0)
    frames_nchw = rng.uniform(-1, 1, (1, 3, 4, 32, 48)).astype(np.float32)
    t = np.array([[0.375]], np.float32)
    n_update = 2

    with torch.no_grad():
        sharps_prime, sharps_final, flow_preds, occ0_preds, ovlp = tm(
            torch.from_numpy(frames_nchw), torch.from_numpy(t), n_update,
            is_training=False)

    # [B,C,T,H,W] -> [B,T,H,W,C]
    frames = jnp.asarray(np.transpose(frames_nchw, (0, 2, 3, 4, 1)))
    out = model.apply(variables, frames, jnp.asarray(t), num_update=n_update)

    def cmp(torch_nchw, jax_nhwc, name, atol=2e-4):
        want = np.transpose(torch_nchw.numpy(), (0, 2, 3, 1))
        got = np.asarray(jax_nhwc)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3,
                                   err_msg=name)

    cmp(sharps_prime[0], out.s0_prime, "S0_prime")
    cmp(sharps_prime[1], out.s1_prime, "S1_prime")
    cmp(sharps_prime[2], out.st_prime, "St_prime")
    for i in range(n_update):
        cmp(sharps_final[i][0], out.s0_final[i], f"S0_final[{i}]")
        cmp(sharps_final[i][1], out.s1_final[i], f"S1_final[{i}]")
        cmp(sharps_final[i][2], out.st_final[i], f"St_final[{i}]")
    for i in range(n_update + 1):
        cmp(flow_preds[i], out.flow_preds[i], f"flow[{i}]")
        cmp(occ0_preds[i], out.occ0_preds[i], f"occ0[{i}]")
    cmp(ovlp, out.ovlp_b0b1, "ovlp")


def test_state_dict_roundtrip(torch_reference):
    sd = {k: v.numpy() for k, v in torch_reference.state_dict().items()}
    variables = convert_torch_state_dict(sd)
    back = flax_to_torch_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_converted_tree_matches_model_init(torch_reference):
    """Converted tree must be loadable: identical structure & shapes to a
    fresh model.init."""
    variables = convert_torch_state_dict(torch_reference.state_dict())
    cfg = config_rb(5, 3)
    model = make_model(cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)),
                      num_update=1)
    got = jax.tree_util.tree_map(lambda x: x.shape, variables)
    want = jax.tree_util.tree_map(lambda x: x.shape, init)
    assert got == want


def test_gradient_parity_vs_torch(torch_reference):
    """Losses and gradients through the full net (incl. warping-op
    backward paths) must match torch autograd after conversion."""
    import torch
    import numpy.linalg as la
    from demfi_tpu.checkpoint.convert import torch_key_to_flax_path
    from demfi_tpu.train import demfi_loss

    tm = torch_reference
    tm.train()
    tm.zero_grad()
    rng = np.random.RandomState(0)
    frames_nchw = rng.uniform(-1, 1, (1, 3, 4, 32, 48)).astype(np.float32)
    gts = [rng.uniform(-1, 1, (1, 3, 32, 48)).astype(np.float32)
           for _ in range(3)]
    tval = np.array([[0.375]], np.float32)
    n = 2

    sp, sf, *_ = tm(torch.from_numpy(frames_nchw), torch.from_numpy(tval),
                    n, is_training=True)
    l1 = torch.nn.L1Loss()
    tg = [torch.from_numpy(x) for x in gts]
    d1 = (l1(tg[0], sp[0]) + l1(tg[1], sp[1]) + l1(tg[2], sp[2])) / 3
    d2 = sum((l1(tg[0], sf[i][0]) + l1(tg[1], sf[i][1])
              + l1(tg[2], sf[i][2])) / 3 for i in range(n))
    loss_t = d1 + d2
    loss_t.backward()
    tgrads = {k: v.grad.detach().numpy()
              for k, v in tm.named_parameters() if v.grad is not None}

    variables = convert_torch_state_dict(tm.state_dict())
    cfg = config_rb(n, n)
    model = make_model(cfg)
    frames = jnp.asarray(np.transpose(frames_nchw, (0, 2, 3, 4, 1)))
    jgts = [jnp.asarray(np.transpose(x, (0, 2, 3, 1))) for x in gts]

    def loss_fn(params):
        out = model.apply(params, frames, jnp.asarray(tval), num_update=n)
        return demfi_loss(cfg, out, jgts[0], jgts[1], jgts[2])[0]

    lj, grads = jax.value_and_grad(loss_fn)(variables)
    np.testing.assert_allclose(float(lj), float(loss_t.detach()),
                               rtol=1e-5)
    for key in ("FF_RDB_Module.SFENet1.weight",
                "FAC_FB_Module.shared_FGAC.fusion.weight",
                "Refine_Module.enc1.weight", "Dec_last2.weight",
                "Booster_Module.GB.convz1.weight", "Dec_last2_2.bias"):
        path, leaf = torch_key_to_flax_path(key)
        node = grads["params"]
        for p in path:
            node = node[p]
        gj = np.asarray(node[leaf])
        gt_ = tgrads[key]
        if leaf == "kernel":
            if gt_.ndim == 5:
                gt_ = gt_[:, :, 0]
            gt_ = np.transpose(gt_, (2, 3, 1, 0))
        rel = la.norm(gj - gt_) / (la.norm(gt_) + 1e-12)
        assert rel < 5e-3, f"{key}: rel grad err {rel}"
