"""Trainer: the reference's Model.fit/evaluate/save/load/swa runtime
(reference models/model.py:43-726) rebuilt as a functional TPU program.

Key mappings (SURVEY.md §2.4, §5):
  * DDP + NCCL + SyncBatchNorm + GradScaler  ->  one jit train step over a
    data-axis Mesh; gradients/batch-stats reduce over ICI automatically; bf16
    needs no loss scaling.
  * grad accumulation  ->  lax.scan over stacked microbatches inside the step
    (identical math to reference model.py:244-260).
  * per-step VN-noise resampling with rank-0 broadcast  ->  a fresh 'vn' PRNG
    key folded from the step counter, identical on every shard by construction.
  * checkpoint dict (model/optimizer/step, reference model.py:346-384)  ->
    orbax-style pytree checkpoints (params, batch_stats, opt_state, step);
    tokenizer stored by path, not pickled.
  * SWA (model.py:492-568)  ->  checkpoint-pytree averaging + BN re-estimation
    pass.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from efficientconformer_tpu.config import Config
from efficientconformer_tpu.models import factory
from efficientconformer_tpu.parallel import mesh as mesh_lib
from efficientconformer_tpu.training import optimizers


class TrainerState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def train_rng(seed: int):
    """Base key for the per-step training rngs (dropout / SpecAugment / VN).

    On TPU this is an 'rbg' typed key (XLA RngBitGenerator, Philox): the
    default threefry2x32 lowers to long scalar-vector integer chains on the
    VPU, and with ~100 dropout sites in a CTC Large step the mask generation
    measured 33 ms of the 110 ms b16 train step — swapping the impl took the
    step to 77.3 ms (-30%) with no other change (scripts/train_attrib.py,
    v5e, 2026-08-20). The consumers only need a deterministic i.i.d. stream,
    not a specific one; parameter INIT stays threefry (init_state) so
    checkpoints and torch-parity baselines are unchanged. CPU — the CI
    platform — keeps threefry so test numerics are identical.
    ECF_PRNG_IMPL=threefry|rbg overrides for A/B."""
    impl = os.environ.get("ECF_PRNG_IMPL")
    if impl is None:
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "threefry":
        impl = "threefry2x32"  # jax's registered name
    return jax.random.key(seed, impl=impl)


@dataclass
class Trainer:
    config: Config
    mesh: Any = None
    seed: int = 0

    def __post_init__(self):
        if self.mesh is None:
            # training_params["model_parallel"] > 1 adds a Megatron-style
            # tensor-parallel mesh axis (see parallel/mesh.shard_params);
            # "seq_parallel" > 1 adds a "seq" axis sharding encoder
            # activations along time (sequence parallelism, encoders.py)
            self.mesh = mesh_lib.make_mesh(
                model_parallel=self.config.training_params.get(
                    "model_parallel", 1
                ),
                seq_parallel=self.config.training_params.get(
                    "seq_parallel", 1
                ),
            )
        seq_mesh = self.mesh if "seq" in self.mesh.axis_names else None
        self.model, self.loss_fn = factory.create_model(
            self.config, seq_mesh=seq_mesh
        )
        self.tx = optimizers.from_training_params(self.config.training_params)
        self.vn_start_step = self.config.training_params.get("vn_start_step")
        self.encoder_frozen_steps = self.config.training_params.get(
            "encoder_frozen_steps"
        )
        self._train_step = None

    # ------------------------------------------------------------------ init

    def init_state(self, example_microbatch) -> TrainerState:
        """Initialise from one *microbatch* (no accumulation axis)."""
        rng = jax.random.PRNGKey(self.seed)
        batch = jax.tree.map(jnp.asarray, example_microbatch)
        variables = factory_init(self.model, rng, batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainerState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- train step

    def train_step_fn(self, use_vn: bool = False, freeze_encoder: bool = False) -> Callable:
        """Build the jit train step: (state, batch, rng) -> (state, metrics).

        batch is a dict of arrays stacked (A, B, ...) where A is the number of
        accumulated microbatches (A=1 for no accumulation). ``use_vn`` and
        ``freeze_encoder`` are compile-time flags; ``fit`` switches step
        functions when the step counter crosses vn_start_step /
        encoder_frozen_steps (reference model.py:200-202, 232-236, 262-265).
        """
        model, loss_fn, tx = self.model, self.loss_fn, self.tx

        def microbatch_loss(params, batch_stats, mb, rng, step):
            rngs = {"dropout": jax.random.fold_in(rng, 0),
                    "augment": jax.random.fold_in(rng, 1)}
            if use_vn:
                # VN key depends only on the step-folded rng so every
                # accumulation microbatch and every shard sees the same noise
                # (reference layers.py:48-55 rank-0 broadcast semantics).
                rngs["vn"] = jax.random.fold_in(rng, 2)
            variables = {"params": params, "batch_stats": batch_stats}
            (outputs, mutated) = factory.apply_model(
                model, variables, mb, True, rngs=rngs
            )
            loss = loss_fn(outputs, mb)
            return loss, mutated.get("batch_stats", batch_stats)

        def step_fn(state: TrainerState, batch, rng):
            accum = next(iter(batch.values())).shape[0]
            rng = jax.random.fold_in(rng, state.step)

            def scan_body(carry, mb):
                grads_acc, loss_acc, bs = carry
                (loss, new_bs), grads = jax.value_and_grad(
                    microbatch_loss, has_aux=True
                )(state.params, bs, mb, rng, state.step)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, new_bs), None

            if accum == 1 and os.environ.get("ECF_ACCUM_SCAN") != "1":
                # no accumulation: skip the scan. A straight-line program
                # avoids the forward saves being kept live across the
                # while-loop body boundary as explicit HBM copies.
                # ECF_ACCUM_SCAN=1 forces the scan path for A/B measurement
                # (round-5 attribution: the on-chip A/B at CTC Large b16
                # measured the two paths equal — see BENCH_DETAILS.md).
                mb = jax.tree.map(lambda x: x[0], batch)
                (loss, batch_stats), grads = jax.value_and_grad(
                    microbatch_loss, has_aux=True
                )(state.params, state.batch_stats, mb, rng, state.step)
            else:
                zero_grads = jax.tree.map(jnp.zeros_like, state.params)
                (grads, loss_sum, batch_stats), _ = jax.lax.scan(
                    scan_body, (zero_grads, 0.0, state.batch_stats), batch
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss_sum / accum

            if freeze_encoder and "encoder" in grads:
                grads = dict(grads)
                grads["encoder"] = jax.tree.map(
                    jnp.zeros_like, grads["encoder"]
                )

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            if freeze_encoder and "encoder" in updates:
                # zeroed grads alone are not enough: decoupled-from-grad terms
                # (L2 weight decay) would still move the encoder; torch's
                # requires_grad_(False) skips the parameter entirely
                updates = dict(updates)
                updates["encoder"] = jax.tree.map(
                    jnp.zeros_like, updates["encoder"]
                )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                step=state.step + 1,
            )
            metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    # -------------------------------------------------------------- eval step

    def eval_loss_fn(self) -> Callable:
        model, loss_fn = self.model, self.loss_fn

        def fn(state: TrainerState, batch):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            outputs, _ = factory.apply_model(model, variables, batch, False)
            return loss_fn(outputs, batch)

        return jax.jit(fn)

    # ------------------------------------------------------------ fit / eval

    def fit(
        self,
        state: TrainerState,
        train_batches: Iterable,
        *,
        epochs: int,
        steps_per_epoch: Optional[int] = None,
        initial_epoch: int = 0,
        callback_path: Optional[str] = None,
        val_fn: Optional[Callable] = None,
        saving_period: int = 1,
        val_period: int = 1,
        log_writer=None,
        verbose: bool = True,
    ) -> TrainerState:
        """Epoch loop (reference model.py:173-344). ``val_fn(state) -> dict``
        is called every val_period epochs; returned scalars are logged."""
        from efficientconformer_tpu.training import schedules

        lr_fn = schedules.from_training_params(self.config.training_params)
        step_fns: dict = {}
        seen_audio_lens: set = set()
        rng = train_rng(self.seed + 1)
        py_step = int(state.step)  # host-side mirror; avoids per-step syncs
        # multi-host: promote host-local state to global replicated arrays
        state = mesh_lib.globalize(self.mesh, state)
        # tensor parallelism: place params by the Megatron rules; GSPMD
        # propagates the shardings through the step and inserts the
        # per-layer all-reduces over the model axis
        if "model" in self.mesh.axis_names:
            state = state.replace(
                params=mesh_lib.shard_params(self.mesh, state.params)
            )
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                losses = []
                it = train_batches
                bar = None
                if verbose:
                    try:
                        from tqdm import tqdm

                        print(f"Epoch {epoch + 1}/{epochs}")
                        bar = tqdm(train_batches, total=steps_per_epoch)
                        it = bar
                    except ImportError:
                        pass
                for i, batch in enumerate(it):
                    use_vn = (
                        self.vn_start_step is not None
                        and py_step >= self.vn_start_step
                    )
                    freeze = (
                        self.encoder_frozen_steps is not None
                        and py_step <= self.encoder_frozen_steps
                    )
                    key = (use_vn, freeze)
                    if key not in step_fns:
                        step_fns[key] = self.train_step_fn(use_vn, freeze)
                    step_fn = step_fns[key]
                    # loud warning when SP would silently degrade to DP for
                    # this (static) batch length — once per distinct length
                    if "seq" in self.mesh.axis_names and "audio" in batch:
                        t_a = int(batch["audio"].shape[-1])
                        if t_a not in seen_audio_lens:
                            seen_audio_lens.add(t_a)
                            enc = getattr(self.config, "encoder_params", None)
                            if enc:
                                mesh_lib.sp_coverage_warn(enc, self.mesh, t_a)
                    batch = mesh_lib.shard_batch(self.mesh, batch, batch_axis=1)
                    state, metrics = step_fn(state, batch, rng)
                    py_step += 1
                    losses.append(metrics["loss"])
                    if bar is not None:
                        # live stats every few steps (reference model.py:269);
                        # float() syncs, so do not pay it every step
                        if (i + 1) % 10 == 0 or i == 0:
                            loss_mini = float(metrics["loss"])
                            mean = float(jnp.mean(jnp.stack(losses)))
                            bar.set_description(
                                "model step: {} - mean loss {:.4f} - batch "
                                "loss: {:.4f} - learning rate: {:.6f}".format(
                                    py_step, mean, loss_mini,
                                    float(lr_fn(py_step - 1)),
                                )
                            )
                    if log_writer is not None and (i + 1) % 10 == 0:
                        log_writer.add_scalar(
                            "Training/Loss", float(metrics["loss"]), py_step
                        )
                        log_writer.add_scalar(
                            "Training/LearningRate", float(lr_fn(py_step - 1)),
                            py_step,
                        )
                    if steps_per_epoch and i + 1 >= steps_per_epoch:
                        break
                if bar is not None:
                    bar.close()
                mean_loss = (
                    float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
                )
                if verbose:
                    print(
                        f"epoch {epoch + 1}/{epochs} loss {mean_loss:.4f} "
                        f"({time.time() - t0:.1f}s)"
                    )
                if log_writer is not None:
                    log_writer.add_scalar("Training/MeanLoss", mean_loss, epoch + 1)
                if val_fn is not None and (epoch + 1) % val_period == 0:
                    metrics = val_fn(state)
                    # "_text" carries the example-prediction string
                    # (reference model.py:326-328 add_text)
                    text = metrics.pop("_text", None)
                    if verbose:
                        print("  val:", {k: round(float(v), 4)
                                         for k, v in metrics.items()})
                    if log_writer is not None:
                        for k, v in metrics.items():
                            log_writer.add_scalar(
                                f"Validation/{k}", float(v), epoch + 1
                            )
                        if text:
                            log_writer.add_text(
                                "Validation/Predictions", text, epoch + 1
                            )
                if callback_path and (epoch + 1) % saving_period == 0:
                    self.save(
                        state,
                        os.path.join(callback_path, f"checkpoints_{epoch + 1}.ckpt"),
                    )
        except Exception as e:
            # exception text to TensorBoard before re-raising
            # (reference model.py:336-344)
            if log_writer is not None:
                log_writer.add_text("Exceptions", str(e))
            raise
        finally:
            # join any in-flight async checkpoint writers (ECF_ASYNC_CKPT)
            from efficientconformer_tpu.training import checkpoint

            checkpoint.wait_for_saves()
        return state

    # ------------------------------------------------------------ checkpoints

    def save(self, state: TrainerState, path: str, save_optimizer: bool = True):
        from efficientconformer_tpu.training import checkpoint

        checkpoint.save(path, state, save_optimizer=save_optimizer)

    def load(self, path: str, state: Optional[TrainerState] = None) -> TrainerState:
        from efficientconformer_tpu.training import checkpoint

        template = state
        if template is None:
            raise ValueError("pass a template state (from init_state) to load into")
        return checkpoint.load(path, template)


def factory_init(model, rng, batch):
    rngs = {"params": rng, "dropout": rng, "augment": rng}
    from efficientconformer_tpu.models.model_ctc import ModelCTC
    from efficientconformer_tpu.models.transducer import Transducer

    if isinstance(model, Transducer):
        return model.init(
            rngs, batch["audio"], batch["labels"],
            batch["audio_len"], batch["label_len"], False
        )
    if isinstance(model, ModelCTC):
        return model.init(rngs, batch["audio"], batch["audio_len"], False)
    return model.init(rngs, batch["tokens"], batch["token_len"], False)
