"""Diffusion-prior training: one jitted step, on-device batch sampling.

Counterpart of the reference trainer
(reference: mpd/trainer/trainer.py:116-335 + mpd/losses/gaussian_diffusion_loss.py)
redesigned TPU-first:

- The entire dataset (~10 MB) lives on device; each step draws batch indices
  with `jax.random.randint` and gathers — there is no host dataloader, no
  host<->device traffic in the hot loop (the reference's no-shuffle DataLoader
  quirk, train_loaders.py:90-92, is deliberately NOT replicated: we sample
  uniformly with replacement).
- loss -> grad -> global-norm clip (1.0) -> Adam -> EMA all inside one jit;
  EMA follows the reference's rule (beta=0.995, update every
  `ema_update_every`=10 steps, hard copy before `step_start_ema`=1000;
  trainer.py:67-85,294-300) but is evaluated branch-free with `where` masks.
- bf16 option: model compute can run in bfloat16 (the AMP analogue,
  trainer.py:146,182) while params/optimizer stay f32.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpd_tpu.diffusion.gaussian_diffusion import diffusion_loss
from mpd_tpu.diffusion.schedules import DiffusionSchedule
from mpd_tpu.parallel.mesh import constrain_batch


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Knobs mirroring the reference training defaults
    (scripts/train_diffusion/train.py:19-51, launch_train_01.py:71-118)."""

    batch_size: int = 128
    lr: float = 3e-4
    num_train_steps: int = 500_000
    clip_grad_norm: float = 1.0
    use_ema: bool = True
    ema_decay: float = 0.995
    ema_update_every: int = 10
    step_start_ema: int = 1000
    loss_type: str = "l2"
    predict_epsilon: bool = True
    steps_til_summary: int = 20_000
    steps_til_checkpoint: int = 50_000
    use_bf16: bool = False
    # stop when val loss hasn't improved for this many validation checks
    # (ref EarlyStopper, trainer.py:45-64; -1 disables, the ref default)
    early_stopper_patience: int = -1
    early_stopper_min_delta: float = 0.0


class TrainState(NamedTuple):
    params: FrozenDict
    ema_params: FrozenDict
    # optax.OptState is a lazy alias whose forward refs (chex.ArrayTree)
    # don't resolve under typing.get_type_hints; Any keeps dataclass/
    # serializer tooling working
    opt_state: Any
    step: jnp.ndarray  # scalar int32


class Trainer:
    def __init__(
        self,
        net,  # flax Module: net.apply(params, x, t) -> eps_hat
        schedule: DiffusionSchedule,
        trajs_normalized: jnp.ndarray,  # [N, H, D] full dataset on device
        config: TrainConfig = TrainConfig(),
        val_fraction: float = 0.05,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
        contexts: Optional[jnp.ndarray] = None,
    ):
        """`mesh` turns the scan-fused step data-parallel: params/opt state
        replicated, the gathered batch sharded on axis 0 of the mesh's
        'data' axis — XLA inserts the gradient psum over ICI. Single-device
        semantics are bit-preserved (same batch indices, same loss math);
        only the layout changes.

        `contexts` ([N, C], aligned row-for-row with `trajs_normalized`)
        trains a CONDITIONED eps-model: the per-trajectory context vector
        is gathered with the same batch indices and passed as the net's
        third argument — the counterpart of the reference's build_context
        flowing into the loss (ref mpd/models/diffusion_models/
        diffusion_model_base.py:30-43 + losses/gaussian_diffusion_loss.py:13-22)
        for the 'default'/'attention'/'concatenate' conditioning modes of
        TemporalUnet. Inference binds the query's context in the eps_fn
        closure (see scripts/train_conditioned_toy.py)."""
        self.net = net
        self.schedule = schedule
        self.config = config
        self.mesh = mesh

        n = trajs_normalized.shape[0]
        n_val = max(1, int(round(n * val_fraction)))
        # deterministic split (the reference random_splits 95/5 and saves the
        # indices for reproducibility; train_loaders.py:90-97)
        perm = np.random.RandomState(seed).permutation(n)
        self.train_data = jnp.asarray(trajs_normalized[perm[n_val:]])
        self.val_data = jnp.asarray(trajs_normalized[perm[:n_val]])
        if contexts is not None:
            assert contexts.shape[0] == n, "contexts must align with trajs"
            contexts = jnp.asarray(contexts)
            self.train_ctx = contexts[perm[n_val:]]
            self.val_ctx = contexts[perm[:n_val]]
        else:
            self.train_ctx = self.val_ctx = None

        _, H, D = trajs_normalized.shape
        self.H, self.D = H, D

        key = jax.random.PRNGKey(seed)
        init_args = (jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
        if contexts is not None:
            init_args += (jnp.zeros((2, contexts.shape[-1]), contexts.dtype),)
        params = net.init(key, *init_args)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.adam(config.lr),
        )
        self.state = TrainState(
            params=params,
            # distinct buffers: the donated train step may not receive the
            # same buffer twice (params is EMA's init value)
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=self.tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            self.state = jax.device_put(self.state, repl)
            # dataset replicated on every device; the per-step gather then
            # needs no communication, and the batch constraint inside the
            # step re-lays the gathered rows out across the 'data' axis
            self.train_data = jax.device_put(self.train_data, repl)
            self.val_data = jax.device_put(self.val_data, repl)
            if self.train_ctx is not None:
                self.train_ctx = jax.device_put(self.train_ctx, repl)
                self.val_ctx = jax.device_put(self.val_ctx, repl)

        # unjitted step for lax.scan fusion (fit / bench scan this directly
        # — scanning the jitted version would nest jits and drop donation);
        # the jitted single-step donates the input state so params/opt/EMA
        # (~64 MB for the flagship U-Net) update in place instead of
        # allocating fresh buffers per call
        self.step_fn = self._make_train_step()
        self._train_step = jax.jit(self.step_fn, donate_argnums=(0,))
        self._val_loss = jax.jit(self._make_val_loss())

    # ------------------------------------------------------------------
    def _eps_fn(self, params, ctx=None):
        """ctx (traced [B, C] batch context) is bound into the closure so
        diffusion_loss's eps_fn(x, t) contract is unchanged."""
        net = (
            self.net.clone(dtype=jnp.bfloat16)
            if self.config.use_bf16
            else self.net
        )
        if ctx is None:
            return lambda x, t: net.apply(params, x, t)
        return lambda x, t: net.apply(params, x, t, ctx)

    def _batch_loss(self, params, batch, key, ctx=None):
        hard_conds = {0: batch[:, 0, :], self.H - 1: batch[:, -1, :]}
        return diffusion_loss(
            self.schedule,
            self._eps_fn(params, ctx),
            key,
            batch,
            hard_conds,
            predict_epsilon=self.config.predict_epsilon,
            loss_type=self.config.loss_type,
        )

    def _make_train_step(self):
        cfg = self.config
        data = self.train_data
        ctx_data = self.train_ctx
        n = data.shape[0]

        def step_fn(state: TrainState, key: jax.Array):
            key_idx, key_loss = jax.random.split(key)
            idx = jax.random.randint(key_idx, (cfg.batch_size,), 0, n)
            batch = constrain_batch(self.mesh, data[idx])
            ctx = (
                constrain_batch(self.mesh, ctx_data[idx])
                if ctx_data is not None
                else None
            )

            loss, grads = jax.value_and_grad(self._batch_loss)(
                state.params, batch, key_loss, ctx
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            step = state.step + 1
            # EMA (branch-free): hard copy until step_start_ema, then decay
            # update every ema_update_every steps
            do_copy = step < cfg.step_start_ema
            do_update = (step % cfg.ema_update_every) == 0
            beta = jnp.where(
                do_copy, 0.0, jnp.where(do_update, cfg.ema_decay, 1.0)
            )
            ema_params = jax.tree.map(
                lambda e, p: beta * e + (1.0 - beta) * p, state.ema_params, params
            )
            return TrainState(params, ema_params, opt_state, step), loss

        return step_fn

    def _make_val_loss(self):
        def val_fn(params, key):
            batch = constrain_batch(self.mesh, self.val_data)
            ctx = (
                constrain_batch(self.mesh, self.val_ctx)
                if self.val_ctx is not None
                else None
            )
            return self._batch_loss(params, batch, key, ctx)

        return val_fn

    # ------------------------------------------------------------------
    def fit(
        self,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        log_every: int = 1000,
        callback: Optional[Callable[[int, Dict], None]] = None,
        steps_per_call: int = 100,
        summary_fn: Optional[Callable[[int], Dict]] = None,
        logger=None,
        step_offset: int = 0,
    ) -> Dict:
        """Run the training loop. `steps_per_call` steps are fused into one
        device call via lax.scan to amortize dispatch.

        Every `config.steps_til_summary` steps (counted from `step_offset`,
        so resumed runs keep the cadence) the in-training evaluation fires:
        `summary_fn(step)` — typically `train.summary.RolloutSummary` bound
        to the dataset and called on the EMA params — returns a metrics dict
        merged with the train/val losses and sent to `logger.log`
        (ExperimentLogger, or anything with .log(dict, step=)). This is the
        counterpart of the reference's periodic validation + 25-sample EMA
        rollout + wandb logging (ref mpd/trainer/trainer.py:194-265,
        mpd/summaries/summary_trajectory_generation.py:16-96).
        """
        cfg = self.config
        num_steps = num_steps or cfg.num_train_steps
        key = key if key is not None else jax.random.PRNGKey(42)

        scan_step = self.step_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi_step(state, key):
            keys = jax.random.split(key, steps_per_call)
            state, losses = jax.lax.scan(scan_step, state, keys)
            return state, losses.mean()

        history = {"step": [], "train_loss": [], "val_loss": []}
        best_val = float("inf")
        stall = 0
        t0 = time.perf_counter()
        done = 0
        while done < num_steps:
            chunk = min(steps_per_call, num_steps - done)
            if chunk == steps_per_call:
                key, sub = jax.random.split(key)
                self.state, loss = multi_step(self.state, sub)
            else:
                for _ in range(chunk):
                    key, sub = jax.random.split(key)
                    self.state, loss = self._train_step(self.state, sub)
            done += chunk

            # window test uses the ACTUAL chunk size: a partial tail chunk
            # right after a cadence boundary must not re-fire the slot
            do_log = done % log_every < chunk
            do_summary = (step_offset + done) % cfg.steps_til_summary < chunk and (
                summary_fn is not None or logger is not None
            )
            if do_log or do_summary:
                key, vkey = jax.random.split(key)
                val_loss = float(self._val_loss(self.state.params, vkey))
            if do_summary:
                metrics = {"train_loss": float(loss), "val_loss": val_loss}
                if summary_fn is not None:
                    metrics.update(summary_fn(step_offset + done))
                if logger is not None:
                    logger.log(metrics, step=step_offset + done)
            if do_log:
                history["step"].append(step_offset + done)
                history["train_loss"].append(float(loss))
                history["val_loss"].append(val_loss)
                if callback is not None:
                    callback(done, {"train_loss": float(loss), "val_loss": val_loss})
                if cfg.early_stopper_patience >= 0:
                    if val_loss < best_val - cfg.early_stopper_min_delta:
                        best_val = val_loss
                        stall = 0
                    else:
                        stall += 1
                        if stall > cfg.early_stopper_patience:
                            history["early_stopped"] = True
                            break
        history["elapsed_s"] = time.perf_counter() - t0
        return history

    def eps_fn_ema(self):
        """Inference eps_fn bound to EMA params (the reference serves
        inference from the EMA model; inference.py:145-148)."""
        params = self.state.ema_params if self.config.use_ema else self.state.params
        return lambda x, t: self.net.apply(params, x, t)


def train(
    net,
    schedule: DiffusionSchedule,
    trajs_normalized: jnp.ndarray,
    config: TrainConfig = TrainConfig(),
    **fit_kwargs,
):
    """One-call train loop (counterpart of mpd.trainer.train)."""
    trainer = Trainer(net, schedule, trajs_normalized, config)
    history = trainer.fit(**fit_kwargs)
    return trainer, history
