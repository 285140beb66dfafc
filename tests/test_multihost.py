"""Multi-host (multi-process) training: 2 real OS processes, each with 4
virtual CPU devices, joined via jax.distributed.initialize + gloo
collectives, run ONE sharded train step over an 8-device global
('data' x 'spatial') mesh — the CI stand-in for a TPU pod (SURVEY §2e
rebuild row 1; reference is single-GPU, /root/reference/main.py:157-159).

Also checks the TrainLoader's per-process batch sharding reproduces the
single-process stream exactly.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, sys.argv[4])

from demfi_tpu.parallel import init_distributed, make_global_mesh, shard_batch

got_pid, got_n = init_distributed(f"localhost:{port}", n, pid)
assert (got_pid, got_n) == (pid, n), (got_pid, got_n)
assert len(jax.devices()) == 4 * n

import numpy as np
from demfi_tpu.config import config_rb
from demfi_tpu.models import make_model
from demfi_tpu.train import create_train_state, make_train_step

cfg = config_rb(1, 1, batch_size=4, patch_size=32)
model = make_model(cfg)
state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               sample_shape=(1, 4, 32, 32, 3))
# host pytree: every process holds identical values (same PRNGKey), so the
# jitted step may commit them to the replicated global sharding
state = jax.device_get(state)

mesh = make_global_mesh(4, 2)  # 'data' spans the process boundary
assert mesh.devices.shape == (4, 2)
step = make_train_step(cfg, model, tx, mesh=mesh)

# deterministic per-process half of the global batch (2 of 4 samples)
from demfi_tpu.train import train_batch_specs
rng = np.random.RandomState(1000 + pid)
frames = rng.uniform(-1, 1, (2, 9, 32, 32, 3)).astype(np.float32)
tv = np.full((2, 1), 0.375, np.float32)
gframes, gt = shard_batch(mesh, (frames, tv), train_batch_specs(mesh))
assert gframes.shape == (4, 9, 32, 32, 3)  # global shape

for _ in range(2):
    state, m = step(state, gframes, gt)
loss = float(m["total_loss"])
assert np.isfinite(loss)
print(f"MHLOSS {pid} {loss:.10f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(p), "2", port, REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for p in range(2)]
    # generous: two processes compile the sharded step concurrently on a
    # 1-core CI box — with background load the XLA compile alone has been
    # observed to exceed 15 min (slow_operation_alarm), a contention
    # flake, not a hang
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    losses = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        for line in out.splitlines():
            if line.startswith("MHLOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    # gradient all-reduce makes the replicated update identical everywhere
    assert losses[0] == losses[1], losses


def test_loader_process_sharding_matches_global():
    """Union of N processes' local batches == the single-process batches,
    same order, same augmentation seeds."""
    from demfi_tpu.data.pipeline import TrainLoader

    class StubSample:
        def __init__(self, frames, t):
            self.frames, self.t_value = frames, t

    class StubDataset:
        def __len__(self):
            return 13

        def sample(self, idx, rng):
            # depends on BOTH the index and the per-sample seed
            aug = rng.random()
            return StubSample(np.full((2, 2), idx + aug, np.float32),
                              np.asarray([idx], np.float32))

    ds = StubDataset()
    single = list(TrainLoader(ds, 4, num_threads=1, seed=7).epoch(3))
    p0 = list(TrainLoader(ds, 4, num_threads=1, seed=7,
                          process_id=0, process_count=2).epoch(3))
    p1 = list(TrainLoader(ds, 4, num_threads=1, seed=7,
                          process_id=1, process_count=2).epoch(3))
    assert len(single) == len(p0) == len(p1) == 3
    for (gf, gt), (f0, t0), (f1, t1) in zip(single, p0, p1):
        np.testing.assert_array_equal(gf, np.concatenate([f0, f1]))
        np.testing.assert_array_equal(gt, np.concatenate([t0, t1]))


_TRAIN_WORKER = r"""
import os, sys
pid, n, port, repo, data = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4], sys.argv[5])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, repo)

from demfi_tpu.main import cli

args = ["--phase", "train", "--epochs", "1",
        "--train_data_path", data, "--test_data_path", data,
        "--checkpoint_dir", os.path.join(data, "ckpt"),
        "--log_dir", os.path.join(data, "log"),
        "--text_dir", os.path.join(data, "text"),
        "--test_img_dir", os.path.join(data, "imgs"),
        "--nf", "16", "--num_ResB_FACFB", "1", "--num_ResB_Dec", "1",
        "--N_trn", "1", "--N_tst", "1", "--batch_size", "4",
        "--patch_size", "32", "--freq_display", "1",
        "--num_thrds", "1", "--multiple_MFI", "2",
        "--mesh_data", "4", "--mesh_spatial", "2",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", str(n), "--process_id", str(pid)]
if os.environ.get("MH_RESUME"):
    args.append("--auto_resume")
cli(args)
print(f"MHTRAIN_DONE {pid}", flush=True)
"""


_EVAL_WORKER = r"""
import os, sys
pid, n, port, repo, data = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4], sys.argv[5])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, repo)

from demfi_tpu.main import cli

cli(["--phase", "test", "--epochs", "1", "--multiple_MFI", "2",
     "--test_data_path", data,
     "--checkpoint_dir", os.path.join(data, "ckpt"),
     "--log_dir", os.path.join(data, "log"),
     "--text_dir", os.path.join(data, "text"),
     "--test_img_dir", os.path.join(data, "imgs"),
     "--nf", "16", "--num_ResB_FACFB", "1", "--num_ResB_Dec", "1",
     "--N_tst", "1",
     "--coordinator_address", f"localhost:{port}",
     "--num_processes", str(n), "--process_id", str(pid)])
print(f"MHEVAL_DONE {pid}", flush=True)
"""


@pytest.mark.slow
def test_two_process_phase_test_scene_sharded(tmp_path):
    """CLI-level multi-process eval (`--phase test` with coordinator
    flags): run_test must join the process group, shard SCENES across
    the two processes (disjoint outputs, no file races) and
    cross-process-aggregate the headline meters — the round-3 review
    found N launched eval processes each evaluated everything."""
    import re

    import cv2
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    data = tmp_path / "ds"
    for s in range(4):
        sharp = data / "test" / f"scene{s}"
        blur = data / "test_blur" / f"scene{s}"
        sharp.mkdir(parents=True)
        blur.mkdir(parents=True)
        for i in range(60):
            cv2.imwrite(str(sharp / f"{str(i).zfill(5)}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
        for k in range(5):
            cv2.imwrite(str(blur / f"{str(17 + 8 * k).zfill(5)}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))

    # checkpoint the eval workers will load (same flag-derived config)
    from demfi_tpu.checkpoint.manager import ExperimentManager
    from demfi_tpu.main import parse_args
    from demfi_tpu.models import make_model

    cfg = parse_args(["--phase", "test", "--epochs", "1",
                      "--test_data_path", str(data),
                      "--checkpoint_dir", str(data / "ckpt"),
                      "--text_dir", str(data / "text"),
                      "--log_dir", str(data / "log"),
                      "--nf", "16", "--num_ResB_FACFB", "1",
                      "--num_ResB_Dec", "1", "--N_tst", "1"])
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 48, 64, 3)), jnp.zeros((1, 1)),
                        num_update=1)
    ExperimentManager(cfg).save_latest(
        params, None, {"last_epoch": 0, "best_PSNR": 0.0}, False)

    worker = tmp_path / "mh_eval_worker.py"
    worker.write_text(_EVAL_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(p), "2", port, REPO, str(data)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for p in range(2)]
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"eval worker failed:\n{out[-4000:]}"
        assert "MHEVAL_DONE" in out

    # each process reports the shard and the SAME global sample count
    counts = []
    for p, out in enumerate(outs):
        m = re.search(rf"\[eval shard {p}/2\] aggregated over (\d+)", out)
        assert m, f"no aggregation line in worker {p}:\n{out[-2000:]}"
        counts.append(int(m.group(1)))
    # 4 scenes x 2 windows x (multiple-1)=1 interp sample = 8 global
    assert counts == [8, 8], counts

    # union of written scene PNGs covers every scene exactly
    import glob as g
    root = data / "imgs" / cfg.model_dir
    dirs = g.glob(str(root / "epoch_00000*" / "scene*"))
    scenes = {os.path.basename(d) for d in dirs}
    assert scenes == {f"scene{s}" for s in range(4)}, scenes
    for d in dirs:
        assert g.glob(os.path.join(d, "*.png")), f"no pngs in {d}"

    # the per-slot (Fig.5 per-time-index) tables are cross-process
    # MERGED: both workers print identical tables, equal to a
    # single-process run's (reference main.py:1098-1105)
    def slot_avgs(out):
        got = {}
        for tag, pat in (("final", r"PSNR_(\d): [-0-9.e+]+ "
                                   r"\(avg:([-0-9.e+]+)\)"),
                         ("prime", r"PSNR_(\d)_prime: [-0-9.e+]+ "
                                   r"\(avg:([-0-9.e+]+)\)")):
            for i, v in re.findall(pat, out):
                got[(tag, int(i))] = float(v)
        return got

    t0, t1 = slot_avgs(outs[0]), slot_avgs(outs[1])
    assert t0 and t0 == t1, (t0, t1)

    port2 = str(_free_port())
    single = subprocess.run(
        [sys.executable, str(worker), "0", "1", port2, REPO, str(data)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=2400)
    assert single.returncode == 0, single.stdout[-4000:]
    ts = slot_avgs(single.stdout)
    assert set(ts) == set(t0)
    for k in ts:
        assert abs(ts[k] - t0[k]) < 1e-6 * max(1.0, abs(ts[k])), (
            k, ts[k], t0[k])


@pytest.mark.slow
def test_two_process_run_train_end_to_end(tmp_path):
    """The FULL run_train path under 2 processes: sharded prefetch,
    process-0 debug sheets from the host-side batch tap, gated
    validation + final evaluate, checkpoint save — the round-2 advisor
    flagged this path as untested (save_debug on globally-sharded
    arrays crashed). Then a second --auto_resume run exercises the
    resume-decision/state broadcast."""
    import cv2
    rng = np.random.RandomState(0)
    data = tmp_path / "ds"
    for s in range(4):
        for kind, names in (("train", range(1, 41)),
                            ("train_blur", range(8, 33, 8)),
                            ("test", range(60)),
                            ("test_blur", range(17, 57, 8))):
            d = data / kind / f"scene{s}"
            d.mkdir(parents=True, exist_ok=True)
            for i in names:
                cv2.imwrite(str(d / f"{str(i).zfill(5)}.png"),
                            rng.randint(0, 255, (48, 64, 3), np.uint8))

    worker = tmp_path / "mh_train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run(resume):
        port = str(_free_port())
        e = dict(env, MH_RESUME="1") if resume else env
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(p), "2", port, REPO,
             str(data)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=e) for p in range(2)]
        outs = [p.communicate(timeout=2400)[0] for p in procs]
        for out, p in zip(outs, procs):
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
            assert f"MHTRAIN_DONE" in out
        return outs

    run(resume=False)
    # debug sheets written by process 0 from the host-side batch tap
    import glob as g
    sheets = g.glob(str(data / "imgs" / "*" / "while_training" / "*Bx20.png"))
    assert sheets, "no debug sheets written in multi-process training"
    # second run resumes past epoch 0 (broadcast decision + state)
    outs = run(resume=True)
    assert any("Training has been ended" in o for o in outs)


def test_hybrid_mesh_dcn_layout():
    """The multi-slice layout (parallel/distributed.py::_mesh_device_array,
    create_hybrid_device_mesh branch): with 2 slices x 4 devices and a
    4x2 (data, spatial) mesh, 'spatial' must stay intra-slice (ICI) and
    the slice boundary (DCN) must be crossed only by the outermost
    stride of the 'data' axis. Fabricated device objects carry
    slice_index — this is the one piece of make_global_mesh CI devices
    (all slice_index 0) can never reach."""
    from demfi_tpu.parallel.distributed import _mesh_device_array

    class FakeDev:
        platform = "cpu"
        device_kind = "fake_cpu"

        def __init__(self, i, slice_index):
            self.id = i
            self.process_index = slice_index
            self.slice_index = slice_index

        def __repr__(self):
            return f"d{self.id}@s{self.slice_index}"

    devs = [FakeDev(i, i // 4) for i in range(8)]
    arr = _mesh_device_array(devs, data=4, spatial=2)
    assert arr.shape == (4, 2)
    assert sorted(d.id for d in arr.flat) == list(range(8))
    # spatial groups never straddle a slice
    for i in range(4):
        assert len({d.slice_index for d in arr[i, :]}) == 1, arr
    # data axis = [DCN, per-slice] collapsed: contiguous half per slice
    col_slices = [arr[i, 0].slice_index for i in range(4)]
    assert col_slices == sorted(col_slices), col_slices
    assert col_slices in ([0, 0, 1, 1],), col_slices

    # single-slice fallback: plain row-major (process boundary outermost)
    devs0 = [FakeDev(i, 0) for i in range(8)]
    arr0 = _mesh_device_array(devs0, data=4, spatial=2)
    assert [d.id for d in arr0.flat] == list(range(8))

    # non-divisible hybrid (data % n_slices != 0) falls back to row-major
    arr_nd = _mesh_device_array(devs[:6] + devs[6:], data=8, spatial=1)
    assert arr_nd.shape == (8, 1)
