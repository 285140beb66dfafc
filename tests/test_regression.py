"""Golden regression tests: pin model outputs at a fixed seed so
numerical behavior can't drift silently across refactors.

Golden values were captured on the CPU backend at the commit where the
full-network activation parity against the reference torch model was
established (tests/test_checkpoint.py). If an intentional change shifts
numerics, re-capture with:  python tests/test_regression.py --recapture
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from demfi_tpu.config import config_rb
from demfi_tpu.models import make_model

GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                           "golden_forward.json")


def compute_stats(dtype: str = "float32"):
    cfg = config_rb(2, 2, compute_dtype=dtype)
    model = make_model(cfg)
    rng = np.random.RandomState(42)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 4, 32, 48, 3)),
                         jnp.float32)
    t = jnp.array([[0.375]], jnp.float32)
    params = model.init(jax.random.PRNGKey(42), frames, t, num_update=1)
    out = model.apply(params, frames, t, num_update=2)

    def stats(x):
        x = np.asarray(x, np.float64)
        return [float(x.mean()), float(x.std()), float(np.abs(x).max())]

    def pix(x):
        """Per-pixel probe: a fixed 4x6 interior patch of channel 0 —
        drift-sensitive where mean/std/max statistics are not."""
        x = np.asarray(x, np.float64)
        return [round(float(v), 7) for v in
                x[0, 13:17, 20:26, 0].reshape(-1)]

    return {
        "st_prime": stats(out.st_prime),
        "st_final_0": stats(out.st_final[0]),
        "st_final_1": stats(out.st_final[1]),
        "flow_init": stats(out.flow_preds[0]),
        "flow_final": stats(out.flow_preds[-1]),
        "occ0_final": stats(out.occ0_preds[-1]),
        "st_prime_pix": pix(out.st_prime),
        "st_final_1_pix": pix(out.st_final[1]),
        "flow_final_pix": pix(out.flow_preds[-1]),
        "occ0_final_pix": pix(out.occ0_preds[-1]),
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH),
                    reason="golden file missing")
def test_forward_matches_golden():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = compute_stats()
    for k, want in golden.items():
        np.testing.assert_allclose(got[k], want, rtol=2e-4, atol=1e-6,
                                   err_msg=k)


if __name__ == "__main__":
    import subprocess
    import sys
    if os.environ.get("XLA_FLAGS", "") == "":
        # goldens MUST be captured under the exact pytest environment
        # (conftest's 8-virtual-device CPU backend): thread partitioning
        # shifts fp reduction order by ~1e-4, which the per-pixel probes
        # are tight enough to see
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        sys.exit(subprocess.call([sys.executable, __file__] + sys.argv[1:],
                                 env=env))
    jax.config.update("jax_platforms", "cpu")
    if "--recapture" in sys.argv:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(compute_stats(), f, indent=1)
        print("golden values recaptured:", GOLDEN_PATH)
