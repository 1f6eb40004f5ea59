"""pjit training loop for retriever encoders.

Replaces the reference's ~1000-line forked HF Trainer
(reference scaling_retriever/tasks/sparse_trainer.py:338-1025,
dense_trainer.py:324-1002 — forked solely to thread per-task losses through
logging and to save LoRA under FSDP) with a compact explicit loop:

  * one jitted train step over a (data, model) mesh; DP + FSDP are partition
    specs (parallel/partitioning.py), not wrapper classes;
  * loss combination per reference training_step (sparse_trainer.py:380-390):
    ``total = Σ_nonreg w_k·loss_k + Σ_reg λ_t·loss_k`` with the quadratic
    λ ramp evaluated inside the step (losses.reg_weight_at_step) —
    λ advances once per micro step, matching the reference's per-call
    ``scheduler.step()``;
  * gradient accumulation via optax.MultiSteps; global-norm clipping and
    AdamW with HF-default linear warmup+decay;
  * per-task loss metrics returned from the step and logged host-side
    (the whole reason the reference forked the Trainer);
  * checkpoints: peft-compatible LoRA adapter (models/lora.save_adapter) or
    full HF checkpoint + orbax state for resume (reference
    sparse_trainer.py:984-1025, :582-591).

``loss_scale`` reproduces the reference's DDP gradient scale: its detached
all_gather + local-grad trick makes the DDP-averaged gradient equal
1/world_size of the global-batch-loss gradient (SURVEY.md §2.2); set
``loss_scale = 1/n_data_shards`` for strict hyperparameter parity.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from scaling_retriever_tpu.models import losses as losses_lib
from scaling_retriever_tpu.parallel.mesh import make_mesh, shard_batch
from scaling_retriever_tpu.utils.profiling import profile_span
from scaling_retriever_tpu.parallel.partitioning import (
    apply_shardings, fsdp_shardings, replicated_shardings,
)


@dataclasses.dataclass
class LLM2RetrieverTrainingArgs:
    """Mirror of the reference args surface (sparse_trainer.py:270-335 +
    the HF TrainingArguments fields actually used by the scripts)."""

    model_name_or_path: str = ""
    output_dir: str = "out"
    model_type: str = "llama"
    loss_type: str = "nce"           # nce | margin_mse | kldiv | nce_kldiv
    # tasks: non-"reg" names are weighted directly; "*_reg" names get the
    # quadratic ramp with lambda = task weight (train_sparse.py:168-174)
    task_names: Sequence[str] = ("rank", "query_reg", "doc_reg")
    task_weights: Sequence[float] = (1.0, 0.01, 0.008)
    reg_T: Optional[int] = None      # ramp horizon; default max_steps // 3
    # lora
    lora: bool = True
    lora_r: int = 16
    lora_alpha: int = 32
    lora_dropout: float = 0.1   # reference sparse_trainer.py:311
    lora_modules_to_save: Optional[Sequence[str]] = None
    # optimization
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.0
    warmup_steps: int = 0
    max_steps: int = 1000            # optimizer steps (HF semantics); <=0 → epochs
    num_train_epochs: float = 3.0    # used only when max_steps <= 0
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    # data
    n_negs: int = 1
    query_max_length: int = 64
    doc_max_length: int = 128
    T: float = 0.01                   # dense temperature
    # runtime
    bf16: bool = False
    fsdp: bool = False
    n_data_shards: Optional[int] = None
    loss_scale: float = 1.0
    logging_steps: int = 50
    eval_steps: Optional[int] = None   # run eval_fn every N optimizer steps
    save_steps: Optional[int] = None
    save_total_limit: int = 1
    seed: int = 42
    resume_from_checkpoint: Optional[str] = None   # path or "auto"
    wandb_project_name: Optional[str] = None       # reference train_sparse.py:185-190
    run_name: Optional[str] = None

    @property
    def ln_to_weight(self) -> dict:
        return dict(zip(self.task_names, self.task_weights))

    @property
    def reg_horizon(self) -> int:
        return self.reg_T if self.reg_T else max(1, self.max_steps // 3)


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    """Latest checkpoint-N dir, or None (reference run_mntp.py:529-547
    auto-detects the last checkpoint for resumption)."""
    if not os.path.isdir(output_dir):
        return None
    ckpts = [d for d in os.listdir(output_dir)
             if d.startswith("checkpoint-")
             and os.path.isdir(os.path.join(output_dir, d))]
    if not ckpts:
        return None
    latest = max(ckpts, key=lambda d: int(d.split("-")[1]))
    return os.path.join(output_dir, latest)


def linear_warmup_decay(lr: float, warmup: int, total: int):
    """HF 'linear' scheduler: 0→lr over warmup, lr→0 over the rest."""
    warmup = max(warmup, 0)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, max(warmup, 1)),
         optax.linear_schedule(lr, 0.0, max(total - warmup, 1))],
        boundaries=[warmup])


class Trainer:
    """Explicit training loop; ``encoder`` is any LLM2Retriever instance."""

    def __init__(self, encoder, args: LLM2RetrieverTrainingArgs,
                 train_loader, mesh=None, eval_fn=None):
        self.encoder = encoder
        self.args = args
        self.train_loader = train_loader
        # eval_fn(trainable, step) -> metrics dict, called every
        # args.eval_steps optimizer steps and after training (HF
        # evaluation_strategy="steps" analog, reference mntp configs)
        self.eval_fn = eval_fn
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.step = 0        # optimizer (global) steps completed, HF semantics
        self.micro_step = 0  # loader batches consumed (= scheduler.step calls)
        self.epoch = 0
        self._epoch_start_micro = 0   # micro_step value when this epoch began
        self._resume_skip_batches = 0  # batches to drop to restore position
        self._log_path = os.path.join(args.output_dir, "trainer_log.jsonl")

        warmup = args.warmup_steps or int(args.warmup_ratio * args.max_steps)
        schedule = linear_warmup_decay(args.learning_rate, warmup, args.max_steps)
        tx = optax.chain(
            optax.clip_by_global_norm(args.max_grad_norm),
            optax.adamw(schedule, b1=args.adam_beta1, b2=args.adam_beta2,
                        eps=args.adam_epsilon, weight_decay=args.weight_decay),
        )
        if args.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
        self.tx = tx

        # placement: base params replicated, FSDP-sharded over 'data', and/or
        # tensor-parallel over 'model'; trainable params (LoRA factors, or the
        # full tree when lora=False) follow the same rule
        self.use_lora = encoder.lora is not None
        n_model = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get(
            "model", 1)
        if n_model > 1:
            from scaling_retriever_tpu.parallel.partitioning import (
                model_parallel_shardings,
            )

            self.param_shardings = model_parallel_shardings(
                encoder.params, self.mesh, fsdp=args.fsdp)
        elif args.fsdp and self.mesh.shape["data"] > 1:
            self.param_shardings = fsdp_shardings(encoder.params, self.mesh)
        else:
            self.param_shardings = replicated_shardings(encoder.params, self.mesh)
        # abstract mode: params made of ShapeDtypeStructs (jax.eval_shape)
        # enable AOT lowering/compile of the exact production step without
        # materializing a single weight — the 3B/8B shard proof
        # (scripts/shard_proof.py) compiles the full-width FSDP step this
        # way and reads per-device HBM from compiled.memory_analysis()
        self.abstract = any(
            isinstance(x, jax.ShapeDtypeStruct)
            for x in jax.tree_util.tree_leaves(encoder.params))

        def _place(tree, shardings):
            if self.abstract:
                return jax.tree_util.tree_map(
                    lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                      sharding=s),
                    tree, shardings)
            return apply_shardings(tree, shardings)

        self.params = _place(encoder.params, self.param_shardings)
        trainable = encoder.lora if self.use_lora else self.params
        self.trainable_shardings = (replicated_shardings(trainable, self.mesh)
                                    if self.use_lora else self.param_shardings)
        self.trainable = _place(trainable, self.trainable_shardings)
        if not self.use_lora:
            # non-LoRA: the full tree IS the trainable. device_put with an
            # identical sharding returns the SAME buffers, so self.params
            # would alias the donated arg-1 tree — step 1's donation would
            # invalidate it, and any use of params inside the non-LoRA trace
            # would crash with "donate a buffer which is also used by the
            # same call to Execute()". An empty tree makes misuse loud
            # (KeyError at trace time) instead of donation-dependent.
            self.params = {}
        self.opt_state = (jax.eval_shape(self.tx.init, self.trainable)
                          if self.abstract else self.tx.init(self.trainable))

        # the frozen base params enter the step as a jit ARGUMENT: closing
        # over them embeds the full multi-GB tree as constants in the
        # lowered program (JAX warns at 2.47 GB for the 1B recipe), which
        # this environment must ship to the remote compile service —
        # measured 20+ min of "compiling" vs seconds with an argument
        # donation measured free on this backend (bt_probe2/3: ~1070 ms/step
        # donated or not, once the executable is warm — see the
        # executable-warm-up note in PERFORMANCE.md)
        self._jit_train_step = jax.jit(self._train_step,
                                       donate_argnums=(1, 2))

    def _jit_step(self, trainable, opt_state, batch, step):
        """Compiled train step; base params passed explicitly (see above)."""
        return self._jit_train_step(self.params, trainable, opt_state,
                                    batch, step)

    # ------------------------------------------------------------------

    def _combined_loss(self, trainable, params, batch, step):
        dropout_rng = None
        if self.use_lora and getattr(self.args, "lora_dropout", 0.0) > 0.0:
            dropout_rng = jax.random.fold_in(
                jax.random.PRNGKey(self.args.seed), step)
        if self.use_lora:
            task_losses = self.encoder.loss_forward(params, trainable,
                                                    batch, dropout_rng)
        else:
            task_losses = self.encoder.loss_forward(trainable, None, batch)
        args = self.args
        total = 0.0
        weighted = {}
        for name, value in task_losses.items():
            if "reg" in name:
                lam = losses_lib.reg_weight_at_step(
                    args.ln_to_weight.get(name, 0.0), args.reg_horizon, step)
                total = total + value * lam
                weighted[name] = value * lam
            elif name in args.ln_to_weight:
                w = args.ln_to_weight[name]
                total = total + value * w
                weighted[name] = value * w
            else:
                weighted[name] = value  # metric-only (e.g. nce/kldiv splits)
        return total * args.loss_scale, weighted

    def _train_step(self, params, trainable, opt_state, batch, step):
        (loss, weighted), grads = jax.value_and_grad(
            self._combined_loss, has_aux=True)(trainable, params, batch, step)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **weighted}
        return trainable, opt_state, metrics

    # ------------------------------------------------------------------

    def train(self) -> dict:
        args = self.args
        os.makedirs(args.output_dir, exist_ok=True)
        if args.resume_from_checkpoint == "auto":
            last = get_last_checkpoint(args.output_dir)
            if last:
                print(f"resuming from {last}", flush=True)
                self.load_state(last)
        elif args.resume_from_checkpoint:
            self.load_state(args.resume_from_checkpoint)
        self._wandb = None
        if args.wandb_project_name:
            try:
                import wandb

                self._wandb = wandb.init(project=args.wandb_project_name,
                                         name=args.run_name, resume="allow")
            except ImportError:
                print("wandb not installed; logging to jsonl only", flush=True)

        accum: dict[str, float] = {}
        n_acc = 0
        t0 = time.time()
        gas = max(args.gradient_accumulation_steps, 1)
        # micro steps already consumed within the current (partial) epoch,
        # to fast-forward the loader on resume (reference
        # sparse_trainer.py:673-689 skips consumed batches)
        skip_in_epoch = self._resume_skip_batches
        self._resume_skip_batches = 0
        done = self._stop(args)
        while not done:
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch)
            # on resume, the restored micro_step already includes the batches
            # about to be skipped, so the epoch began skip_in_epoch ago
            self._epoch_start_micro = self.micro_step - skip_in_epoch
            epoch_had_batches = False
            for batch in self.train_loader:
                epoch_had_batches = True
                if skip_in_epoch > 0:
                    # counters were restored from the checkpoint; just drop
                    # the already-consumed batch to restore loader position
                    skip_in_epoch -= 1
                    continue
                batch = shard_batch(batch, self.mesh)
                # λ ramp advances once per micro step, like the reference's
                # per-training_step scheduler.step() (sparse_trainer.py:385)
                self.micro_step += 1
                with profile_span("train_step"):
                    self.trainable, self.opt_state, metrics = self._jit_step(
                        self.trainable, self.opt_state, batch,
                        jnp.asarray(self.micro_step, jnp.int32))
                for k, v in metrics.items():
                    accum[k] = accum.get(k, 0.0) + float(v)
                n_acc += 1
                if self.micro_step % gas == 0:
                    # optimizer-step boundary: MultiSteps applied the update
                    self.step += 1
                    if self.step % args.logging_steps == 0:
                        self._log({k: v / n_acc for k, v in accum.items()},
                                  time.time() - t0)
                        accum, n_acc = {}, 0
                    if args.save_steps and self.step % args.save_steps == 0:
                        self.save_checkpoint()
                    if (self.eval_fn is not None and args.eval_steps
                            and self.step % args.eval_steps == 0):
                        self._log(dict(self.eval_fn(self.trainable, self.step)),
                                  time.time() - t0)
                if self._stop(args):
                    done = True
                    break
            if not done:
                self.epoch += 1
                if not epoch_had_batches or self._stop(args):
                    break
        if n_acc:
            self._log({k: v / n_acc for k, v in accum.items()}, time.time() - t0)
        return {"train_steps": self.step, "micro_steps": self.micro_step}

    def _stop(self, args) -> bool:
        """max_steps counts OPTIMIZER steps (HF semantics); when max_steps<=0,
        run num_train_epochs epochs instead."""
        if args.max_steps and args.max_steps > 0:
            return self.step >= args.max_steps
        return self.epoch >= args.num_train_epochs

    def _log(self, metrics: dict, elapsed: float) -> None:
        entry = {"step": self.step, "elapsed_sec": round(elapsed, 2), **metrics}
        print(json.dumps(entry), flush=True)
        with open(self._log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        if getattr(self, "_wandb", None) is not None:
            self._wandb.log(metrics, step=self.step)

    # -- checkpointing -------------------------------------------------------

    def save_model(self, out_dir: Optional[str] = None) -> None:
        """Final artifact: peft-compatible adapter, or full HF checkpoint
        (reference sparse_trainer.py:984-1025); format dispatch lives with
        the encoder (T5 writes its own adapter layout)."""
        out_dir = out_dir or self.args.output_dir
        self.encoder.save_trained(jax.device_get(self.trainable), out_dir,
                                  use_lora=self.use_lora)

    def save_checkpoint(self) -> str:
        """Resumable state: step + trainable + optimizer (orbax)."""
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.join(os.path.abspath(self.args.output_dir),
                                f"checkpoint-{self.step}")
        # optimizer state is stored as flat leaves; the (NamedTuple-heavy)
        # structure is rebuilt from a fresh tx.init at restore time
        opt_leaves = [jax.device_get(x)
                      for x in jax.tree_util.tree_leaves(self.opt_state)]
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, {
                "step": self.step,
                "micro_step": self.micro_step,
                "epoch": self.epoch,
                "micro_in_epoch": self.micro_step - self._epoch_start_micro,
                "trainable": jax.device_get(self.trainable),
                "opt_leaves": opt_leaves,
            })
        self._prune_checkpoints()
        return ckpt_dir

    def _prune_checkpoints(self) -> None:
        """save_total_limit pruning (reference sparse_trainer.py:917-921)."""
        limit = self.args.save_total_limit
        if not limit:
            return
        root = self.args.output_dir
        ckpts = sorted(
            (d for d in os.listdir(root) if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[1]))
        for d in ckpts[:-limit]:
            import shutil

            shutil.rmtree(os.path.join(root, d))

    def load_state(self, ckpt_dir: str) -> None:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ckpt_dir))
        self.step = int(restored["step"])
        gas = max(self.args.gradient_accumulation_steps, 1)
        self.micro_step = int(restored.get("micro_step", self.step * gas))
        self.epoch = int(restored.get("epoch", 0))
        # data-order fidelity: re-seek the loader to the checkpointed
        # position within the epoch (reference sparse_trainer.py:673-689);
        # dropout RNG needs no restore — it is fold_in(seed, micro_step)
        self._resume_skip_batches = int(
            restored.get("micro_in_epoch", 0))
        self.trainable = jax.tree_util.tree_map(
            jnp.asarray, restored["trainable"])
        treedef = jax.tree_util.tree_structure(self.tx.init(self.trainable))
        leaves = [jnp.asarray(restored["opt_leaves"][i])
                  for i in range(len(restored["opt_leaves"]))]
        self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)


SparseTrainer = Trainer
DenseTrainer = Trainer
DenseTrainerForNCE_KLdiv = Trainer
