"""Training: losses (Eq. 9/10), optimizer, and the (sharded) train step.

Loss parity with the reference driver (/root/reference/main.py:404-440):
  D1 = lambda_D1 * mean(L1(S0', GT0), L1(S1', GT1), L1(St', GTt))
  D2 = lambda_D2 * sum over boosting iterations i=1..N of
       mean(L1(S0_i, GT0), L1(S1_i, GT1), L1(St_i, GTt))
  total = D1 + D2

Optimizer parity (main.py:179-186): Adam(lr=1e-4, betas=(0.9, 0.999),
weight_decay=0) with MultiStepLR stair decay — lr is a function of *epoch*
(x0.5 at each milestone), injected per epoch rather than per step.

TPU-native parts: the step jits over a ``jax.sharding.Mesh`` with the batch
sharded over the 'data' axis (and optionally H over 'spatial'); gradient
all-reduce is inserted by XLA over ICI. Params are replicated — at 7.41M
params there is nothing to shard.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from demfi_tpu.config import DeMFIConfig
from demfi_tpu.models.demfi import DeMFINet, DeMFIOutputs


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32, drives the stair-decay lr


def _rec_loss(cfg_loss_type: str):
    if cfg_loss_type == "MSE":
        return lambda a, b: jnp.mean((a - b) ** 2)
    if cfg_loss_type == "L1_Charbonnier_loss":
        eps = 1e-3
        return lambda a, b: jnp.mean(jnp.sqrt((a - b) ** 2 + eps ** 2))
    return lambda a, b: jnp.mean(jnp.abs(a - b))


def make_optimizer(cfg: DeMFIConfig) -> optax.GradientTransformation:
    """Adam with an epoch-indexed stair-decay schedule. The schedule is
    applied via inject_hyperparams so lr updates per epoch exactly like
    MultiStepLR (main.py:186, 510-511).

    Weight decay is L2-coupled exactly like torch.optim.Adam
    (main.py:179-184): grad += wd * param BEFORE the moment updates —
    not AdamW's decoupled decay (divergent for any nonzero wd)."""
    def adam_l2(learning_rate, weight_decay):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )

    return optax.inject_hyperparams(adam_l2)(
        learning_rate=cfg.init_lr, weight_decay=cfg.weight_decay)


def demfi_loss(cfg: DeMFIConfig, out: DeMFIOutputs, gt0, gt1, gtt,
               loss_fn=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Eq. 9 + Eq. 10 (main.py:404-440)."""
    rec = loss_fn or _rec_loss(cfg.loss_type)
    d1 = cfg.rec_D1_lambda * (rec(gt0, out.s0_prime) + rec(gt1, out.s1_prime)
                              + rec(gtt, out.st_prime)) / 3.0
    n = out.s0_final.shape[0]
    d2 = jnp.zeros(())
    for i in range(n):
        d2 = d2 + cfg.rec_D2_lambda * (
            rec(gt0, out.s0_final[i]) + rec(gt1, out.s1_final[i])
            + rec(gtt, out.st_final[i])) / 3.0
    total = d1 + d2
    return total, {"total_loss": total, "rec_D1": d1, "rec_D2": d2}


def create_train_state(cfg: DeMFIConfig, model: DeMFINet,
                       rng: jax.Array, sample_shape=(1, 4, 64, 64, 3)
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(rng, jnp.zeros(sample_shape, jnp.float32),
                           jnp.zeros((sample_shape[0], 1), jnp.float32),
                           num_update=1)
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables)
    return TrainState(params=variables, opt_state=opt_state,
                      epoch=jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg: DeMFIConfig, model: DeMFINet,
                    tx: optax.GradientTransformation,
                    mesh: Optional[jax.sharding.Mesh] = None) -> Callable:
    """Build the jitted train step.

    Batch layout: frames [B, 9, H, W, 3] (B0,B1,B-1,B2,St,S0,S1,S-1,S2 —
    the loader's window, utils.py:334-362), t [B, 1]. With a mesh, the
    batch is sharded over 'data' (x 'spatial' over H if the mesh has a
    spatial axis) and params are replicated; XLA inserts the gradient
    all-reduce over ICI.
    """
    milestones = jnp.asarray(list(cfg.lr_milestones), jnp.int32)

    def lr_for_epoch(epoch):
        if cfg.lr_type == "no_decay":
            return jnp.float32(cfg.init_lr)
        if cfg.lr_type == "linear_decay":
            e = epoch.astype(jnp.float32)
            ramp = cfg.init_lr * (cfg.epochs - e) / max(
                cfg.epochs - cfg.lr_dec_start, 1)
            return jnp.where(e < cfg.lr_dec_start,
                             jnp.float32(cfg.init_lr), ramp)
        n = jnp.sum((milestones <= epoch).astype(jnp.float32))
        return cfg.init_lr * (cfg.lr_dec_fac ** n)

    def step(state: TrainState, frames, t_value):
        inputs = frames[:, :4]
        gtt = frames[:, 4]
        gt0 = frames[:, 5]
        gt1 = frames[:, 6]

        def loss_fn(params):
            out = model.apply(params, inputs, t_value,
                              num_update=cfg.N_trn)
            return demfi_loss(cfg, out, gt0, gt1, gtt)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr_for_epoch(state.epoch)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = opt_state.hyperparams["learning_rate"]
        return TrainState(params=params, opt_state=opt_state,
                          epoch=state.epoch), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P
    frames_spec, t_spec = train_batch_specs(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, NamedSharding(mesh, frames_spec),
                      NamedSharding(mesh, t_spec)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def train_batch_specs(mesh):
    """(frames, t) PartitionSpecs the train step expects — loaders must
    commit batches with exactly these (multi-process jit rejects any
    mismatch between a committed arg sharding and in_shardings)."""
    from jax.sharding import PartitionSpec as P
    axes = [a for a in ("data", "spatial") if a in mesh.axis_names]
    data_axes = tuple(axes[:1]) or None
    spatial = "spatial" if "spatial" in mesh.axis_names else None
    return (P(data_axes, None, spatial, None, None), P(data_axes, None))
