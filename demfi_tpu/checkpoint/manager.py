"""Experiment + checkpoint management.

TPU-native equivalent of the reference's ``save_manager``
(/root/reference/utils.py:21-110): experiment directory layout
(``<net_type>_exp<N>``), args snapshot to ``text_dir/<model>.txt``, and
latest / best_PSNR / per-epoch checkpoints — stored as msgpack'd Flax
pytrees with a JSON metadata sidecar instead of pickled torch files.
Also imports reference ``.pt`` checkpoints transparently.
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax

from demfi_tpu.config import DeMFIConfig
from demfi_tpu.checkpoint.convert import load_pt_checkpoint


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class ExperimentManager:
    """Manages one experiment's directories, logs, and checkpoints."""

    def __init__(self, cfg: DeMFIConfig):
        self.cfg = cfg
        self.model_dir = cfg.model_dir
        self.checkpoint_dir = os.path.join(cfg.checkpoint_dir, self.model_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        os.makedirs(cfg.text_dir, exist_ok=True)
        os.makedirs(cfg.log_dir, exist_ok=True)
        os.makedirs(cfg.test_img_dir, exist_ok=True)
        self.text_path = os.path.join(cfg.text_dir, self.model_dir + ".txt")
        with open(self.text_path, "a") as f:
            f.write("----- Model parameters -----\n")
            for field in dataclasses.fields(cfg):
                f.write(f"{field.name} : {getattr(cfg, field.name)}\n")

    def write_info(self, text: str) -> None:
        with open(self.text_path, "a") as f:
            f.write(text)

    # ---------------------------------------------------------- save
    def _ckpt_path(self, tag: str) -> str:
        return os.path.join(self.checkpoint_dir, f"{self.model_dir}_{tag}")

    def _save_sync(self, tag: str, params: Any, opt_state: Any = None,
                   meta: Optional[Dict[str, Any]] = None,
                   best_psnr_flag: bool = False) -> str:
        base = self._ckpt_path(tag)
        params = jax.device_get(params)
        _atomic_write(base + ".msgpack", flax.serialization.to_bytes(params))
        if opt_state is not None:
            _atomic_write(base + ".opt.msgpack",
                          flax.serialization.to_bytes(jax.device_get(opt_state)))
        meta = dict(meta or {})
        meta.setdefault("net_type", self.cfg.net_type)
        _atomic_write(base + ".json",
                      json.dumps(meta, default=float, indent=1).encode())
        if best_psnr_flag:
            for ext in (".msgpack", ".opt.msgpack", ".json"):
                if os.path.exists(base + ext):
                    shutil.copyfile(base + ext,
                                    self._ckpt_path("best_PSNR") + ext)
        return base

    def save(self, tag: str, params: Any, opt_state: Any = None,
             meta: Optional[Dict[str, Any]] = None) -> str:
        return self._save_sync(tag, params, opt_state, meta)

    def save_latest(self, params, opt_state=None, meta=None,
                    best_psnr_flag: bool = False) -> None:
        """Reference save_best_model semantics (utils.py:73-81): always
        write latest; copy to best_PSNR on improvement."""
        self._save_sync("latest", params, opt_state, meta, best_psnr_flag)

    def save_epoch(self, epoch: int, params, opt_state=None, meta=None) -> None:
        self.save(f"epc{epoch}", params, opt_state, meta)

    # ---------------------------------------------------------- load
    def load(self, tag: str, params_template: Any,
             opt_state_template: Any = None
             ) -> Tuple[Any, Optional[Any], Dict[str, Any]]:
        base = self._ckpt_path(tag)
        pt_path = base + ".pt"
        if not os.path.exists(base + ".msgpack") and os.path.exists(pt_path):
            # transparent import of a reference torch checkpoint
            variables, meta = load_pt_checkpoint(pt_path)
            return variables, None, meta
        with open(base + ".msgpack", "rb") as f:
            params = flax.serialization.from_bytes(params_template, f.read())
        opt_state = None
        if opt_state_template is not None and os.path.exists(base + ".opt.msgpack"):
            with open(base + ".opt.msgpack", "rb") as f:
                opt_state = flax.serialization.from_bytes(
                    opt_state_template, f.read())
        meta = {}
        if os.path.exists(base + ".json"):
            with open(base + ".json") as f:
                meta = json.load(f)
        return params, opt_state, meta

    def load_latest(self, params_template, opt_state_template=None):
        return self.load("latest", params_template, opt_state_template)

    def load_best_psnr(self, params_template, opt_state_template=None):
        return self.load("best_PSNR", params_template, opt_state_template)

    def load_epoch(self, epoch: int, params_template, opt_state_template=None):
        # reference load_epc_model loads epoch-1 (utils.py:88-93)
        return self.load(f"epc{epoch - 1}", params_template, opt_state_template)

    def has(self, tag: str) -> bool:
        base = self._ckpt_path(tag)
        return os.path.exists(base + ".msgpack") or os.path.exists(base + ".pt")


class AsyncExperimentManager(ExperimentManager):
    """ExperimentManager with non-blocking saves: serialization and disk
    writes run on a background thread so the train loop never stalls on
    checkpoint IO (the TPU-native answer to the reference's synchronous
    torch.save at every epoch end, main.py:254-276)."""

    def __init__(self, cfg: DeMFIConfig):
        super().__init__(cfg)
        import concurrent.futures
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._pending = None

    def save(self, tag, params, opt_state=None, meta=None) -> str:
        # snapshot to host synchronously (cheap), write asynchronously
        params = jax.device_get(params)
        opt_state = jax.device_get(opt_state) if opt_state is not None else None
        self.wait()
        self._pending = self._pool.submit(
            self._save_sync, tag, params, opt_state, meta)
        return self._ckpt_path(tag)

    def save_latest(self, params, opt_state=None, meta=None,
                    best_psnr_flag: bool = False) -> None:
        params = jax.device_get(params)
        opt_state = jax.device_get(opt_state) if opt_state is not None else None
        self.wait()
        self._pending = self._pool.submit(
            self._save_sync, "latest", params, opt_state, meta,
            best_psnr_flag)

    def load(self, tag, params_template, opt_state_template=None):
        self.wait()  # read-after-write consistency
        return super().load(tag, params_template, opt_state_template)

    def wait(self) -> None:
        """Block until the in-flight save (if any) has committed."""
        if self._pending is not None:
            self._pending.result()
            self._pending = None


class OrbaxExperimentManager(ExperimentManager):
    """Orbax-backed checkpoint storage (StandardCheckpointer with async
    commit): the same latest/best_PSNR/epoch tags become orbax checkpoint
    directories ``<model_dir>_<tag>.orbax``. Sharded arrays round-trip
    natively, which matters once params/opt state are mesh-sharded."""

    def __init__(self, cfg: DeMFIConfig):
        super().__init__(cfg)
        import orbax.checkpoint as ocp
        self._ckptr = ocp.StandardCheckpointer()

    def _orbax_dir(self, tag: str) -> str:
        return os.path.abspath(self._ckpt_path(tag) + ".orbax")

    def _save_sync(self, tag, params, opt_state=None, meta=None,
                   best_psnr_flag=False) -> str:
        tree = {"params": jax.device_get(params)}
        if opt_state is not None:
            tree["opt_state"] = jax.device_get(opt_state)
        path = self._orbax_dir(tag)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        meta = dict(meta or {})
        meta.setdefault("net_type", self.cfg.net_type)
        _atomic_write(self._ckpt_path(tag) + ".json",
                      json.dumps(meta, default=float, indent=1).encode())
        if best_psnr_flag:
            self._ckptr.wait_until_finished()
            best = self._orbax_dir("best_PSNR")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            shutil.copyfile(self._ckpt_path(tag) + ".json",
                            self._ckpt_path("best_PSNR") + ".json")
        return path

    def load(self, tag, params_template, opt_state_template=None):
        path = self._orbax_dir(tag)
        if not os.path.exists(path):
            return super().load(tag, params_template, opt_state_template)
        self._ckptr.wait_until_finished()
        template = {"params": params_template}
        if opt_state_template is not None:
            template["opt_state"] = opt_state_template
        tree = self._ckptr.restore(path, template)
        meta = {}
        jpath = self._ckpt_path(tag) + ".json"
        if os.path.exists(jpath):
            with open(jpath) as f:
                meta = json.load(f)
        return tree["params"], tree.get("opt_state"), meta

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
