"""End-to-end CPU test of the one-command Table-2 repro harness
(scripts/repro_table2.py): synthetic fixture tree + a random-weight
checkpoint exported to the reference .pt format, so the harness is
known-good before the real Adobe240 blobs / DeMFInet_exp1_latest.pt
ever arrive (VERDICT r4 missing #1)."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    """2-scene Adobe-layout eval tree (48x64, stride-8 blur names,
    zfill 5) + an rb(1,1) checkpoint saved as a reference-format .pt."""
    root = tmp_path_factory.mktemp("repro_t2")
    rng = np.random.RandomState(7)
    for scene in ("scene_a", "scene_b"):
        blur = root / "test_blur" / scene
        sharp = root / "test" / scene
        blur.mkdir(parents=True)
        sharp.mkdir(parents=True)
        for k in range(5):
            cv2.imwrite(str(blur / f"{17 + 8 * k:05d}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
        # GT: window frames (same names) + x2 midpoints (idx+4) and the
        # x8 in-betweens for the two windows (idx 25/33 -> +1..+7)
        need = {17 + 8 * k for k in range(5)}
        need |= {25 + j for j in range(1, 8)} | {33 + j for j in range(1, 8)}
        for n in sorted(need):
            cv2.imwrite(str(sharp / f"{n:05d}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))

    # random-weight rb(1,1) params -> reference combined .pt
    import torch

    from demfi_tpu.checkpoint.convert import flax_to_torch_state_dict
    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model

    cfg = config_rb(1, 1)
    model = make_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 48, 64, 3)),
                           jnp.zeros((1, 1)), num_update=1)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(variables).items()}
    pt = root / "DeMFInet_exp1_latest.pt"
    torch.save({"state_dict_Model": sd, "last_epoch": 7499}, str(pt))
    return str(root), str(pt)


def test_repro_harness_end_to_end(fixture_tree, tmp_path):
    root, pt = fixture_tree
    import repro_table2 as R

    out = tmp_path / "repro.json"
    # random weights can't hit Table 2 — an infinite budget checks the
    # full path (preflight -> .pt convert -> evaluate -> diff table)
    rc = R.main(["--data", root, "--ckpt", pt, "--N_tst", "1",
                 "--multiples", "2", "--budget_db", "inf",
                 "--workdir", str(tmp_path / "wd"),
                 "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["dataset"] == "adobe"
    assert rep["pass"] is True
    assert rep["dataset_info"]["scenes"] == 2
    assert rep["dataset_info"]["frame_stride"] == 8
    r = rep["results"]["x2"]
    for k in ("interp_psnr", "interp_ssim", "deblur_psnr", "deblur_ssim"):
        assert np.isfinite(r[k]), (k, r)
    # x2 has no Table-2 interp row; deblur still diffs against Table 2
    verdicts = {row[0]: row[-1] for row in rep["rows"]}
    assert verdicts["adobe deblur"] == "PASS"          # inf budget
    assert verdicts["adobe interp_x2"] == "info"

    # a tight budget against random weights must FAIL (rc 1)
    rc2 = R.main(["--data", root, "--ckpt", pt, "--N_tst", "1",
                  "--multiples", "2", "--budget_db", "0.05",
                  "--workdir", str(tmp_path / "wd2"),
                  "--out", str(tmp_path / "repro2.json")])
    assert rc2 == 1


def test_repro_harness_preflight_errors(fixture_tree, tmp_path):
    root, pt = fixture_tree
    import repro_table2 as R

    # missing dirs -> actionable SystemExit, no chip time spent
    with pytest.raises(SystemExit, match="missing directory"):
        R.preflight_dataset(str(tmp_path / "nope"))

    # a checkpoint whose manifest mismatches the model (rb weights vs a
    # different nf) -> key/shape diff in the error
    from demfi_tpu.config import config_rb
    cfg_bad = config_rb(1, 1, nf=32)
    with pytest.raises(SystemExit, match="shape|missing|unexpected"):
        R.preflight_checkpoint(pt, cfg_bad)
