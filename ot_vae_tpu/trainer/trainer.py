"""The training loop (replaces pytorch_lightning.Trainer for this framework).

Design (SURVEY §7): explicit state + jitted pure step functions + a small
host-side loop with the Lightning-shaped callback protocol. Data parallelism
is GSPMD: batches are sharded over the mesh's ``data`` axis, parameters
replicated, and XLA inserts the gradient/statistic collectives — no
hand-written psum in the hot path (reference equivalent: Lightning ddp +
NCCL, configs/ddp.yaml:1-5).

Reference feature map:
* train/val/test/predict loops + metric lifecycle — model/base.py:122-220
* EMA weights (store/copy_to on eval)            — model/base.py:153-190
* ReduceLROnPlateau on the monitored metric      — model/vae.py:148-156
* inference-transform capture from the datamodule — model/base.py:222-241
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ot_vae_tpu.data.transforms import Identity
from ot_vae_tpu.parallel.mesh import put_replicated, shard_batch
from ot_vae_tpu.trainer.callbacks import Callback
from ot_vae_tpu.trainer.state import TrainState

__all__ = ["Trainer"]


from ot_vae_tpu.trainer.loggers import PrintLogger as _PrintLogger  # noqa: E402


def _set_lr(opt_state, lr: float):
    """Update the injected learning rate inside an inject_hyperparams state."""
    def walk(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and not hasattr(node, "hyperparams"):
            children = tuple(walk(c) for c in node)
            # namedtuple states rebuild by fields; optax.chain states are
            # PLAIN tuples (tuple(*children) would be a TypeError)
            return type(node)(*children) if hasattr(node, "_fields") else children
        return node

    return walk(opt_state)


def _find_lr(opt_state):
    """Read the injected learning rate back out of an optimizer state."""
    found = []

    def walk(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            found.append(node.hyperparams["learning_rate"])
        elif isinstance(node, tuple) and not hasattr(node, "hyperparams"):
            for c in node:
                walk(c)

    walk(opt_state)
    return found[0] if found else None


class Trainer:
    def __init__(
        self,
        max_epochs: int = 100,
        callbacks: Optional[List[Callback]] = None,
        logger=None,
        seed: int = 42,
        mesh=None,
        log_every_n_steps: int = 50,
        lr_plateau: bool = True,
        lr_factor: float = 0.75,
        lr_patience: int = 8,
        lr_threshold: float = 1e-1,
        min_lr: float = 1e-6,
        limit_batches: Optional[int] = None,
        enable_progress_bar: bool = False,
        profile_dir: Optional[str] = None,
        metric_comm=None,
        accumulate_grad_batches: int = 1,
        check_val_every_n_epoch: int = 1,
    ):
        self.max_epochs = max_epochs
        self.callbacks = list(callbacks or [])
        self.logger = logger or _PrintLogger()
        self.seed = seed
        self.mesh = mesh
        self.log_every_n_steps = log_every_n_steps
        self.lr_plateau = lr_plateau
        self.lr_factor = lr_factor
        self.lr_patience = lr_patience
        self.lr_threshold = lr_threshold
        self.min_lr = min_lr
        self.limit_batches = limit_batches
        self.enable_progress_bar = enable_progress_bar
        self.profile_dir = profile_dir
        # Lightning Trainer(accumulate_grad_batches=N): mean of N micro-batch
        # gradients per optimizer step; global_step counts OPTIMIZER steps;
        # mutable collections (batch_stats, prior_stats) update every
        # micro-batch. The big-model bench shows per-chip throughput falling
        # past batch 32 — accumulation is how a reference user scales the
        # effective batch without crossing that cliff.
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches))
        # Lightning Trainer(check_val_every_n_epoch=N): validate (and hence
        # feed the LR plateau / EarlyStopping / checkpoint monitors) every
        # N-th epoch; the final epoch always validates so fit() ends with
        # fresh logged_metrics.
        self.check_val_every_n_epoch = max(1, int(check_val_every_n_epoch))
        # cross-process metric-state reduction seam (reference: torchmetrics
        # dist_reduce_fx="sum" + sync_dist=True, model/base.py:215-220).
        # Single-process GSPMD evaluates on global arrays so the identity comm
        # is correct; multi-host trainers inject a process-level comm here.
        from ot_vae_tpu.parallel.comm import NO_COMM

        self.metric_comm = metric_comm if metric_comm is not None else NO_COMM

        self.state: Optional[TrainState] = None
        self.current_epoch = 0
        self.global_step = 0
        self.should_stop = False
        self.logged_metrics: Dict[str, float] = {}
        self.first_val_batch = None
        self.monitor = None
        self.datamodule = None
        self._opt = None
        self._train_step = None
        self._eval_step_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------ utilities

    def print(self, *args):
        if jax.process_index() == 0:
            print(*args, flush=True)

    def _hook(self, name: str, *args):
        for cb in self.callbacks:
            getattr(cb, name)(self, *args)

    def _key(self, *salts) -> jax.Array:
        key = jax.random.PRNGKey(self.seed)
        for s in salts:
            key = jax.random.fold_in(key, int(s) & 0x7FFFFFFF)
        return key

    def _put(self, batch):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = shard_batch(self.mesh, batch)
        return batch

    def _prefetch(self, iterator, size: int = 2):
        """Device-put batches ahead of consumption so host input overlaps
        device compute (replaces the reference's DataLoader worker pool,
        data/base.py:88-99 — on TPU the win is keeping transfers in flight,
        not parallel decode)."""
        import collections

        queue = collections.deque()
        for batch in iterator:
            queue.append(self._put(batch))
            if len(queue) >= size:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    # ------------------------------------------------------------ step builders

    def _build_train_step(self, model):
        opt = self._opt
        self._built_transform_version = getattr(model, "_transform_version", 0)

        def train_step(state: TrainState, batch, key):
            k_pre, k_prior, k_drop = jax.random.split(key, 3)
            pbatch = model.batch_preprocess(batch, k_pre, train=True)
            rngs = {"prior": k_prior, "dropout": k_drop}

            def lf(params):
                variables = {"params": params, **state.mutable}
                return model.loss_fn(variables, pbatch, state.step, rngs)

            (loss, (logs, outputs, mutated)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema is not None:
                d = model.ema_decay
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p * (1.0 - d), ema, params
                )
            new_state = state.replace(
                step=state.step + 1, params=params,
                mutable={**state.mutable, **mutated},
                opt_state=new_opt, ema_params=ema,
            )
            return new_state, logs, outputs

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_accum_steps(self, model):
        """Two jitted halves of an accumulated step: per-micro-batch gradient
        accumulation (running mean) and the optimizer/EMA application."""
        opt = self._opt
        n_acc = self.accumulate_grad_batches

        def grad_step(state: TrainState, accum, batch, key):
            k_pre, k_prior, k_drop = jax.random.split(key, 3)
            pbatch = model.batch_preprocess(batch, k_pre, train=True)
            rngs = {"prior": k_prior, "dropout": k_drop}

            def lf(params):
                variables = {"params": params, **state.mutable}
                return model.loss_fn(variables, pbatch, state.step, rngs)

            (loss, (logs, outputs, mutated)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g / n_acc, accum, grads
            )
            new_state = state.replace(mutable={**state.mutable, **mutated})
            return new_state, accum, logs, outputs

        def apply_step(state: TrainState, accum):
            updates, new_opt = opt.update(accum, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema is not None:
                d = model.ema_decay
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p * (1.0 - d), ema, params
                )
            new_state = state.replace(
                step=state.step + 1, params=params,
                opt_state=new_opt, ema_params=ema,
            )
            # zeroed accumulator for the NEXT window, reusing the donated
            # accum buffers on-device (an eager zeros_like per window would
            # be a host round trip on the tunneled backend)
            return new_state, jax.tree_util.tree_map(jnp.zeros_like, accum)

        return (jax.jit(grad_step, donate_argnums=(0, 1)),
                jax.jit(apply_step, donate_argnums=(0, 1)))

    def _build_eval_step(self, model, metrics, use_ema: bool, with_generated: bool):
        def eval_step(state: TrainState, batch, metric_states, key):
            variables = state.ema_variables if use_ema else state.variables
            k_pre, k_fwd, k_gen, k_enc = jax.random.split(key, 4)
            pbatch = model.batch_preprocess(batch, k_pre, train=False)
            preds = model.eval_forward(variables, pbatch, k_fwd)
            out = {**pbatch, "preds": preds}
            if hasattr(model, "encode_fn"):
                out["latents"] = model.encode_fn(
                    variables, pbatch["samples"], k_enc, **pbatch["kwargs"]
                )
            if with_generated and hasattr(model, "sample_fn"):
                out["generated"] = model.sample_fn(
                    variables, k_gen, pbatch["samples"].shape[0], pbatch["kwargs"]
                )
            if metric_states is not None:
                metric_states = metrics.update(metric_states, **out)
            return metric_states, out

        return jax.jit(eval_step)

    def _eval_step(self, model, metrics, use_ema, with_generated):
        cache_key = (id(model), id(metrics), use_ema, with_generated)
        if cache_key not in self._eval_step_cache:
            self._eval_step_cache[cache_key] = self._build_eval_step(
                model, metrics, use_ema, with_generated
            )
        return self._eval_step_cache[cache_key]

    # ------------------------------------------------------------ init

    def _init_fit(self, model, datamodule):
        self.datamodule = datamodule
        self.monitor = "val/metrics/" + model.monitor
        # a min-mode monitor (e.g. FID) must drive the plateau downwards
        # (reference: the model declares the mode, model/base.py:86-88)
        self._monitor_mode = model.mode
        # inference transforms from the datamodule (reference: model/base.py:222-229)
        if isinstance(model.inference_preprocess, Identity):
            model.inference_preprocess = datamodule.inference_preprocess
        if isinstance(model.inference_postprocess, Identity):
            model.inference_postprocess = datamodule.inference_postprocess

        first = next(iter(datamodule.train_batches()))
        first = jax.tree_util.tree_map(jnp.asarray, first)
        if model.variables is None:
            model.variables = model.init_variables(self._key(0), first)
        model.setup()  # partial checkpoints (reference: model/base.py:192-195)

        self._opt = model.optimizer()
        self.state = TrainState.create(model.variables, self._opt, model.ema_decay)
        if self.mesh is not None:
            self.state = put_replicated(self.mesh, self.state)
        self._train_step = self._build_train_step(model)
        if self.accumulate_grad_batches > 1:
            self._grad_step, self._apply_step = self._build_accum_steps(model)
        self._lr = float(model.learning_rate)
        self._plateau_best = None
        self._plateau_count = 0

    def _restore_fit_state(self, model, path) -> int:
        """Restore a TrainState saved by ``save_checkpoint`` into the freshly
        initialised fit; returns the epoch to resume FROM (saved epoch + 1)."""
        import orbax.checkpoint as ocp
        from pathlib import Path
        import json

        path = Path(path).absolute()
        # the fresh state is the restore template, so optax namedtuple
        # structure (incl. injected hyperparams) round-trips exactly
        template = {
            "step": self.state.step,
            "params": self.state.params,
            "mutable": self.state.mutable,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema_params,
        }
        tree = ocp.PyTreeCheckpointer().restore(path, item=template)
        self.state = self.state.replace(
            step=jnp.asarray(tree["step"]),
            params=tree["params"],
            mutable=tree["mutable"],
            opt_state=tree["opt_state"],
            ema_params=tree["ema_params"],
        )
        if self.mesh is not None:
            self.state = put_replicated(self.mesh, self.state)
        model.variables = self.state.variables
        self.global_step = int(self.state.step)
        restored_lr = _find_lr(self.state.opt_state)
        if restored_lr is not None:
            self._lr = float(restored_lr)
        side = {}
        sidecar = path / "sidecar.json"
        if sidecar.exists():
            with open(sidecar) as f:
                side = json.load(f)
        return int(side.get("epoch", -1)) + 1

    # ------------------------------------------------------------ fit

    def fit(self, model, datamodule, resume_from=None):
        """Train; pass ``resume_from=<checkpoint dir>`` to continue an
        interrupted fit — restores step, params, mutable collections,
        opt_state, EMA and the epoch counter (the reference gets this from
        Lightning's ckpt_path resume, SURVEY §5)."""
        self._init_fit(model, datamodule)
        start_epoch = 0
        if resume_from is not None:
            start_epoch = self._restore_fit_state(model, resume_from)
        self._hook("on_fit_start", model)
        for epoch in range(start_epoch, self.max_epochs):
            if self.should_stop:
                break
            self.current_epoch = epoch
            model.inference = False
            self._hook("on_train_epoch_start", model)
            self._run_train_epoch(model, datamodule, epoch)
            self._hook("on_train_epoch_end", model)
            if ((epoch + 1) % self.check_val_every_n_epoch == 0
                    or epoch == self.max_epochs - 1):
                self._run_validation(model, datamodule)
                self._maybe_reduce_lr()
        model.variables = jax.device_get(self.state.variables)
        self._hook("on_fit_end", model)
        return self

    def _run_train_epoch(self, model, datamodule, epoch):
        # progressive transforms change static params → rebuild the jitted step
        # (reference rebind semantics: data/progressive_callback.py:82-97)
        if getattr(model, "_transform_version", 0) != getattr(
            self, "_built_transform_version", 0
        ):
            self._train_step = self._build_train_step(model)
            if self.accumulate_grad_batches > 1:
                self._grad_step, self._apply_step = self._build_accum_steps(model)
        # native profiling (SURVEY §5: jax.profiler replaces the reference's
        # disabled torch profiler hooks, demo.py:22-23) — profile epoch 1 only
        # (epoch 0 is dominated by compilation)
        profiling = self.profile_dir is not None and epoch == 1
        if profiling:
            jax.profiler.start_trace(self.profile_dir)
        t0 = time.time()
        n = 0
        n_acc = self.accumulate_grad_batches
        accum, micro = None, 0
        for batch_idx, dev_batch in enumerate(
            self._prefetch(datamodule.train_batches(epoch))
        ):
            if self.limit_batches is not None and batch_idx >= self.limit_batches:
                break
            key = self._key(1, epoch, batch_idx)
            with jax.profiler.StepTraceAnnotation("train_step", step_num=self.global_step):
                if n_acc == 1:
                    self.state, logs, outputs = self._train_step(
                        self.state, dev_batch, key)
                    # host-side step counter: int(self.state.step) here would
                    # be a device→host fetch PER BATCH (~67 ms RTT on the
                    # tunneled backend) serializing the async dispatch queue;
                    # the periodic log fetch below is the sync point
                    self.global_step += 1
                else:
                    if accum is None:
                        accum = jax.tree_util.tree_map(
                            jnp.zeros_like, self.state.params)
                    self.state, accum, logs, outputs = self._grad_step(
                        self.state, accum, dev_batch, key)
                    micro += 1
                    if micro == n_acc:
                        self.state, accum = self._apply_step(self.state, accum)
                        micro = 0
                        self.global_step += 1
            n += 1
            if batch_idx % self.log_every_n_steps == 0:
                self.logger.log_metrics(
                    {k: float(v) for k, v in logs.items()}, self.global_step
                )
            self._hook("on_train_batch_end", model, outputs, dev_batch, batch_idx)
            if self.enable_progress_bar and jax.process_index() == 0:
                total = datamodule.steps_per_epoch("train")
                print(f"\repoch {epoch + 1}/{self.max_epochs} "
                      f"step {batch_idx + 1}/{total} "
                      f"loss={float(logs.get('train/loss/total', float('nan'))):.4f}",
                      end="", flush=True)
        if micro:  # trailing partial window: step on what we have
            # (Lightning also steps on the epoch's last batch; the mean was
            # pre-divided by n_acc, so a partial window takes a micro/n_acc-
            # scaled step rather than re-normalizing — documented behavior)
            self.state, _ = self._apply_step(self.state, accum)
            self.global_step += 1
        if self.enable_progress_bar and n and jax.process_index() == 0:
            print()  # newline after the in-place progress line
        if profiling:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), self.state.params
            )
            jax.profiler.stop_trace()
        dt = time.time() - t0
        if n:
            self.print(
                f"epoch {epoch}: {n} steps in {dt:.1f}s"
                f" ({n * datamodule.train_batch_size / dt:.1f} img/s)"
            )

    # ------------------------------------------------------------ evaluation

    def _run_eval_loop(self, model, batches, metrics, mode: str, use_ema: bool):
        """Shared val/test loop (reference: model/base.py:131-142, 205-220)."""
        model.variables = self.state.variables  # callbacks may call model API
        prev_inference = model.inference
        model.inference = True
        metric_states = metrics.init() if metrics is not None else None
        if metric_states is not None:
            # one-time metric preparation (reference: model/base.py:197-203)
            metric_states = metrics.prepare(metric_states, model, self)
        step = self._eval_step(model, metrics, use_ema, with_generated=True)
        self._hook(f"on_{mode}_epoch_start" if mode == "test" else
                   "on_validation_epoch_start", model)
        first_batch = None
        for batch_idx, batch in enumerate(batches):
            if self.limit_batches is not None and batch_idx >= self.limit_batches:
                break
            if first_batch is None:
                first_batch = batch
            dev_batch = self._put(batch)
            key = self._key(2 if mode == "val" else 3, self.current_epoch, batch_idx)
            metric_states, outputs = step(self.state, dev_batch, metric_states, key)
            self._hook(
                "on_validation_batch_end" if mode == "val" else "on_test_batch_end",
                model, outputs, dev_batch, batch_idx,
            )
        if mode == "val":
            self.first_val_batch = first_batch
        results = {}
        if metric_states is not None:
            # cross-process state reduction before compute (reference:
            # sync_dist=True at epoch end, model/base.py:219)
            metric_states = metrics.reduce(metric_states, self.metric_comm)
            results = {
                k: float(v) for k, v in metrics.compute(metric_states).items()
            }
            self.logged_metrics.update(results)
            self.logger.log_metrics(results, self.global_step)
        self._hook(
            "on_validation_epoch_end" if mode == "val" else "on_test_epoch_end", model
        )
        model.inference = prev_inference
        return results

    def _run_validation(self, model, datamodule):
        if model.val_metrics is None and not self.callbacks:
            return {}
        use_ema = model.ema_decay is not None
        return self._run_eval_loop(
            model, datamodule.val_batches(), model.val_metrics, "val", use_ema
        )

    def validate(self, model, datamodule):
        if self.state is None:
            self._adopt_model_state(model)
        self.datamodule = datamodule
        return self._run_validation(model, datamodule)

    def test(self, model, datamodule):
        """(reference: Trainer.test usage in tests/test_mnist_cnn_vae.py:95)"""
        if self.state is None:
            self._adopt_model_state(model)
        self.datamodule = datamodule
        use_ema = model.ema_decay is not None and self.state.ema_params is not None
        return self._run_eval_loop(
            model, datamodule.test_batches(), model.test_metrics, "test", use_ema
        )

    def predict(self, model, datamodule):
        """(reference: model/base.py:137-142)"""
        if self.state is None:
            self._adopt_model_state(model)
        model.variables = self.state.variables
        prev_inference = model.inference
        model.inference = True
        outs = []
        for batch in datamodule.predict_batches():
            pbatch = model.batch_preprocess(
                jax.tree_util.tree_map(jnp.asarray, batch), train=False
            )
            # model.__call__ applies the inference pre/post transforms itself
            outs.append(model(pbatch["samples"], **pbatch["kwargs"]))
        model.inference = prev_inference
        return outs

    def _adopt_model_state(self, model):
        """Build a TrainState around a model restored from checkpoint."""
        if model.variables is None:
            raise RuntimeError("model has no variables; fit() or load a checkpoint")
        self._opt = model.optimizer()
        self.state = TrainState.create(model.variables, self._opt, None)
        if self.monitor is None:
            self.monitor = "val/metrics/" + model.monitor

    # ------------------------------------------------------------ LR plateau

    def _maybe_reduce_lr(self):
        """ReduceLROnPlateau(factor, patience, threshold) on the monitor
        (reference: model/vae.py:151-156)."""
        if not self.lr_plateau or self.monitor not in self.logged_metrics:
            return
        value = self.logged_metrics[self.monitor]
        mode = getattr(self, "_monitor_mode", "max")
        sign = 1.0 if mode == "max" else -1.0
        if self._plateau_best is None or sign * (value - self._plateau_best) > self.lr_threshold:
            self._plateau_best = value
            self._plateau_count = 0
            return
        self._plateau_count += 1
        if self._plateau_count > self.lr_patience and self._lr > self.min_lr:
            self._lr = max(self._lr * self.lr_factor, self.min_lr)
            self.state = self.state.replace(opt_state=_set_lr(self.state.opt_state, self._lr))
            self._plateau_count = 0
            self.print(f"ReduceLROnPlateau: lr -> {self._lr:.2e}")
