"""Shared runner machinery: config → loaders/model/optimizer/jitted steps.

The reference implements this per-runner (python_scripts/training/
run_strong.py:29-120, 679-770); here it is one base class.  TPU specifics:
the train step is jitted once over a data-parallel mesh (batch sharded
``P("data")``, params replicated, XLA inserts the gradient all-reduce), and
batches are padded/bucketed host-side so recompilation stays bounded.
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from texttoaudiogrounding_tpu.parallel.kernel_shard import wrap_calls
from texttoaudiogrounding_tpu.parallel.mesh import (
    batch_sharding,
    device_feed,
    get_mesh,
    mesh_from_config,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
    tree_shardings,
)
from texttoaudiogrounding_tpu.training.optim import (
    MetricImprover,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from texttoaudiogrounding_tpu.training.train_state import (
    TrainState,
    load_checkpoint,
    save_checkpoint,
)
from texttoaudiogrounding_tpu.utils.config import (
    dump_config,
    parse_config_or_kwargs,
)
from texttoaudiogrounding_tpu.utils.registry import instantiate

log = logging.getLogger(__name__)


def init_logger(filename: Path, level: str = "INFO") -> logging.Logger:
    """File+stdout logger (reference utils/train_util.py:91-101)."""
    logger = logging.getLogger(f"ttg.{filename}")
    logger.setLevel(getattr(logging, level))
    logger.handlers.clear()
    formatter = logging.Formatter(
        "[ %(levelname)s : %(asctime)s ] - %(message)s")
    for handler in (logging.FileHandler(filename),
                    logging.StreamHandler(sys.stdout)):
        handler.setFormatter(formatter)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


def array_batch(batch: dict) -> dict:
    """Keep jit-compatible leaves and normalize dtypes (reference forward
    casting, run_strong.py:92-99: text → long, everything else → float).

    float16 leaves (the f16 waveform wire format, datasets._as_wire) are
    passed through — the jitted steps upcast on device (``upcast_wire``),
    halving host→device bytes with bit-identical results."""
    out = {}
    for key, value in batch.items():
        if not isinstance(value, np.ndarray) or value.dtype == object:
            continue
        if value.dtype in (np.int64, np.int32, np.bool_):
            out[key] = value.astype(np.int32)
        elif value.dtype == np.float16:
            out[key] = value
        elif np.issubdtype(value.dtype, np.floating):
            out[key] = value.astype(np.float32)
        else:
            out[key] = value
    return out


def upcast_wire(batch: dict) -> dict:
    """Upcast f16 wire-format leaves to f32; inside jit this is on-device
    and fused into the first consumer by XLA.  Works on NumPy batches too
    (used before ``model.init``)."""
    return {k: (v.astype(jnp.float32)
                if getattr(v, "dtype", None) in (jnp.float16, np.float16)
                else v)
            for k, v in batch.items()}


class BaseRunner:
    """Config-driven training/evaluation driver."""

    #: save only trainable params (+ batch_stats) in checkpoints when the
    #: model freezes something — the reference's weak runner does this
    #: (run_weak_phrase.py:332-353) while run_strong saves the full model
    save_trainable_only = False

    def __init__(self):
        self.config: dict = {}
        self.mesh = None
        self.logger = log
        self._freeze_mask = None

    # ------------------------------------------------------------- builders
    def build_dataloader(self, cfg: dict, shuffle: bool):
        dataset = instantiate(cfg["dataset"])
        collate_fn = instantiate(cfg["collate_fn"]) \
            if "collate_fn" in cfg else None
        kwargs = dict(cfg.get("dataloader_args", {}))
        kwargs.setdefault("shuffle", shuffle)
        if kwargs.pop("drop_last", shuffle):
            kwargs["drop_last"] = True
        from texttoaudiogrounding_tpu.data.loader import DataLoader
        return DataLoader(dataset, collate_fn=collate_fn,
                          seed=self.config.get("seed", 1), **kwargs)

    def build_model(self):
        return instantiate(self.config["model"])

    def build_loss(self):
        return instantiate(self.config["loss"])

    def init_state(self, model, sample_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.config.get("seed", 1))
        variables = model.init({"params": rng},
                               upcast_wire(array_batch(sample_batch)),
                               train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        trainer = self.config.get("trainer", {})
        self.tx = build_optimizer(
            self.config.get("optimizer", {"type": "Adam",
                                          "args": {"lr": 1e-3}}),
            params=params, model=model,
            max_grad_norm=trainer.get("max_grad_norm"))
        opt_state = self.tx.init(params)
        from texttoaudiogrounding_tpu.training.optim import \
            freeze_mask_from_model
        self._freeze_mask = freeze_mask_from_model(model, params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=0)

    def _ckpt_mask(self):
        """Freeze mask for checkpoint pruning, or None for full saves."""
        save_trainable = self.config.get("trainer", {}).get(
            "save_trainable_only", self.save_trainable_only)
        return self._freeze_mask if save_trainable else None

    # ---------------------------------------------------------------- steps
    def post_grad_hook(self, loss, grads):
        """Hook between grad computation and the optimizer update.

        Default: identity.  The weak runners override this with the
        NaN-loss guard (reference run_weak_phrase.py:88-93)."""
        return grads

    def make_train_step(self, model, loss_fn,
                        output_transform: Callable,
                        loss_rng: bool = False):
        mesh = self.mesh
        rep = replicate(mesh)
        data = batch_sharding(mesh)

        def train_step(state: TrainState, batch: dict, rng):
            batch = upcast_wire(batch)
            step_rng = jax.random.fold_in(rng, state.step)
            rngs = {"dropout": step_rng,
                    "specaug": jax.random.fold_in(step_rng, 1)}

            def wrapped(params):
                variables = {"params": params}
                mutable = []
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]

                def apply_model(variables, batch, rngs):
                    inputs = dict(batch)
                    inputs.update(getattr(self, "_static_train_inputs",
                                          {}))
                    return model.apply(variables, inputs, train=True,
                                       rngs=rngs, mutable=mutable)

                if self.config.get("trainer", {}).get("remat"):
                    # rematerialize the forward in the backward pass:
                    # trades ~1/3 extra FLOPs for activation memory
                    apply_model = jax.checkpoint(apply_model)
                result = apply_model(variables, batch, rngs)
                output, mutated = result if mutable else (result, {})
                output = output_transform(output, batch)
                kw = {"rng": jax.random.fold_in(step_rng, 2)} \
                    if loss_rng else {}
                return loss_fn(output, **kw), mutated

            (loss, mutated), grads = jax.value_and_grad(
                wrapped, has_aux=True)(state.params)
            grads = self.post_grad_hook(loss, grads)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                opt_state=opt_state, step=state.step + 1)
            return new_state, loss

        # state sharded per ``parallel.rules`` (replicated by default);
        # the batch keeps the sharding shard_batch gave it (P("data")
        # for divisible leaves, replicated for ragged ones), so it is
        # left unconstrained here.  GSPMD inserts the gradient
        # all-reduce over the data axis and the tensor-parallel
        # collectives implied by the rule shardings.
        del data
        state_sh = getattr(self, "_state_sh", None)
        if state_sh is None:
            state_sh = rep
        return wrap_calls(
            jax.jit(train_step, donate_argnums=(0,),
                    in_shardings=(state_sh, None, rep),
                    out_shardings=(state_sh, rep)), mesh)

    def make_val_step(self, model, loss_fn, output_transform: Callable):
        mesh = self.mesh
        rep = replicate(mesh)
        data = batch_sharding(mesh)

        def val_step(state: TrainState, batch: dict):
            batch = upcast_wire(batch)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            output = model.apply(variables, batch, train=False)
            output = output_transform(output, batch)
            return loss_fn(output)

        del data
        state_sh = getattr(self, "_state_sh", None)
        if state_sh is None:
            state_sh = rep
        return wrap_calls(
            jax.jit(val_step, in_shardings=(state_sh, None),
                    out_shardings=rep), mesh)

    def make_forward(self, model):
        mesh = self.mesh
        rep = replicate(mesh)
        data = batch_sharding(mesh)

        def forward(state: TrainState, batch: dict):
            batch = upcast_wire(batch)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return model.apply(variables, batch, train=False)

        del data
        # same state shardings as the train/val steps: under
        # parallel.rules a replicated in_sharding here would re-gather
        # the tensor-sharded params on every eval forward
        state_sh = getattr(self, "_state_sh", None)
        if state_sh is None:
            state_sh = rep
        return wrap_calls(jax.jit(forward, in_shardings=(state_sh, None)),
                          mesh)

    # ------------------------------------------------------------ main loop
    def setup(self, config, overrides=None, **kwargs):
        if isinstance(config, dict):
            self.config = config
        else:
            self.config = parse_config_or_kwargs(config, overrides or [],
                                                 **kwargs)
        self.config.setdefault("seed", 1)
        np.random.seed(self.config["seed"])
        # dropout/specaug mask generation is pure VPU work under
        # threefry (~4.6 ms/step at B=128); the hardware RNG (rbg)
        # measures 141.8 -> 137.2 ms/step bf16 with statistically
        # equivalent masks (scripts/probe_train_r4.py).  Streams are
        # seed-reproducible per impl, just not across impls.
        impl = self.config.setdefault(
            "prng_impl",
            "rbg" if jax.default_backend() == "tpu" else "threefry2x32")
        # NOTE: this is a process-global switch — anything built after
        # this runner (a predictor, a second runner) inherits it, and
        # RNG streams are NOT reproducible across impls (a run seeded
        # under rbg will not replay under threefry).  Logged loudly so
        # mixed-impl sessions are diagnosable; set ``prng_impl`` in the
        # config to pin it explicitly.
        prev = jax.config.jax_default_prng_impl
        if prev != impl:
            logging.getLogger(__name__).info(
                "setting process-global jax_default_prng_impl: %s -> %s "
                "(seed streams are impl-specific)", prev, impl)
            jax.config.update("jax_default_prng_impl", impl)
        # config-reachable dp x tp: ``parallel: {mesh: {data: N,
        # model: M}, rules: [{match: [...], spec: [...]}]}`` — absent,
        # the default 1-D data mesh keeps every recipe single-device
        # compatible
        self.mesh = mesh_from_config(self.config.get("parallel"))
        return self.config

    def state_shardings(self, state: TrainState):
        """TrainState-shaped shardings: params and optimizer state
        follow ``parallel.rules`` (optax's mu/nu mirror the param tree,
        so the same path rules shard them identically); batch_stats and
        step stay replicated."""
        rules = self.config.get("parallel", {}).get("rules")
        rep = replicate(self.mesh)
        if not rules:
            return jax.tree.map(lambda _: rep, state)
        return TrainState(
            params=tree_shardings(state.params, self.mesh, rules),
            batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
            opt_state=tree_shardings(state.opt_state, self.mesh, rules),
            step=rep)

    def prepare_experiment(self) -> Path:
        exp_dir = Path(self.config["experiment_path"])
        exp_dir.mkdir(parents=True, exist_ok=True)
        dump_config(self.config, exp_dir / "config.yaml")
        self.logger = init_logger(exp_dir / "train.log")
        self.logger.info(yaml.safe_dump(self.config, sort_keys=False))
        return exp_dir

    def fit(self, model, loss_fn, train_loader, val_loader,
            output_transform: Callable, exp_dir: Path,
            loss_rng: bool = False) -> TrainState:
        """Epoch loop with plateau LR, early stop, best/last checkpoints.

        Reference: run_strong.py:712-810.
        """
        trainer = self.config.get("trainer", {})
        epochs = trainer.get("epochs", 10)
        epoch_length = trainer.get("epoch_length")
        early_stop = trainer.get("early_stop", epochs)
        save_interval = trainer.get("save_interval", 1)
        include_optim = trainer.get("include_optim_in_ckpt", True)
        monitor = trainer.get("metric_monitor",
                              {"mode": "min", "name": "loss"})
        metric_improver = MetricImprover(monitor["mode"])

        n_dev = self.mesh.devices.size
        sample_batch = None
        for b in train_loader:
            sample_batch = b
            break
        if sample_batch is None:
            raise ValueError("empty train loader")
        sample_batch = array_batch(sample_batch)
        state = self.init_state(model, sample_batch)
        num_params = sum(int(np.prod(x.shape))
                         for x in jax.tree.leaves(state.params))
        self.logger.info(f"{num_params} parameters in total; "
                         f"mesh={self.mesh}")

        # resume (reference run_strong.py:693-709, 762-765): ``finetune``
        # restores weights only; otherwise optimizer/epoch/monitor state too
        start_epoch = 1
        resume_meta: dict = {}
        if self.config.get("resume"):
            finetune = self.config.get("finetune",
                                       trainer.get("finetune", False))
            state, resume_meta = self._resume(state, self.config["resume"],
                                              finetune=finetune)
            if not finetune:
                start_epoch = resume_meta.get("epoch", 0) + 1
                metric_improver.load_state_dict(
                    resume_meta.get("metric_monitor",
                                    metric_improver.state_dict()))
        self._state_sh = self.state_shardings(state) \
            if self.config.get("parallel", {}).get("rules") else None
        state = jax.device_put(
            state, self._state_sh if self._state_sh is not None
            else replicate(self.mesh))

        if self.config.get("trainer", {}).get("debug_nans"):
            jax.config.update("jax_debug_nans", True)

        if "lr_scheduler" in self.config:
            scheduler = instantiate(self.config["lr_scheduler"])
        else:
            from texttoaudiogrounding_tpu.training.optim import \
                ReduceLROnPlateau
            scheduler = ReduceLROnPlateau(mode=monitor["mode"])
        lr_update_interval = trainer.get("lr_update_interval", "epoch")

        train_step = self.make_train_step(model, loss_fn, output_transform,
                                          loss_rng=loss_rng)
        val_step = self.make_val_step(model, loss_fn, output_transform)
        rng = jax.device_put(
            jax.random.PRNGKey(self.config["seed"]), replicate(self.mesh))

        from texttoaudiogrounding_tpu.training.profiling import (
            StepProfiler,
            ThroughputMeter,
        )
        profiler = StepProfiler(trainer.get("profile"), exp_dir)
        meter = ThroughputMeter()

        not_improve_cnt = resume_meta.get("not_improve_cnt", 0)
        iteration = 0
        epoch = start_epoch - 1
        train_iter = iter(train_loader)
        for epoch in range(start_epoch, epochs + 1):
            train_loader.set_epoch(epoch)
            losses = []
            t0 = time.time()
            meter.reset()
            steps = epoch_length or len(train_loader)

            def epoch_batches():
                nonlocal train_iter
                for _ in range(steps):
                    try:
                        yield next(train_iter)
                    except StopIteration:
                        train_iter = iter(train_loader)
                        yield next(train_iter)

            # async H2D pipeline: the device-put of batch j+1 overlaps
            # the train step of batch j (device_feed docstring)
            for batch, _, real_bs in device_feed(
                    epoch_batches(), self.mesh, n_dev,
                    prepare=array_batch):
                if lr_update_interval == "iteration" and callable(scheduler):
                    state = state.replace(opt_state=set_learning_rate(
                        state.opt_state, scheduler(iteration)))
                profiler.step(iteration)
                state, loss = train_step(state, batch, rng)
                losses.append(loss)
                meter.update(real_bs)
                iteration += 1
            profiler.close()
            train_loss = float(np.mean([np.asarray(l) for l in losses]))
            throughput = meter.summary()

            val_losses = []
            for batch, _, _ in device_feed(iter(val_loader), self.mesh,
                                           n_dev, prepare=array_batch):
                val_losses.append(np.asarray(val_step(state, batch)))
            val_loss = float(np.mean(val_losses))

            lr = get_learning_rate(state.opt_state)
            if lr_update_interval == "epoch":
                if hasattr(scheduler, "step"):
                    new_lr = scheduler.step(val_loss, lr)
                    if new_lr != lr:
                        state = state.replace(opt_state=set_learning_rate(
                            state.opt_state, new_lr))
                        lr = new_lr
            self.logger.info(
                f"epoch: {epoch}  train_loss: {train_loss:.4g}  "
                f"val_loss: {val_loss:.4g}  lr: {lr:.2g}  "
                f"({time.time() - t0:.1f}s, {throughput})")

            ckpt_mask = self._ckpt_mask()
            if metric_improver(val_loss):
                not_improve_cnt = 0
                save_checkpoint(exp_dir / "best", state, epoch,
                                metric_improver.state_dict(),
                                not_improve_cnt, include_optim,
                                trainable_mask=ckpt_mask)
            else:
                not_improve_cnt += 1
            if epoch % save_interval == 0:
                save_checkpoint(exp_dir / "last", state, epoch,
                                metric_improver.state_dict(),
                                not_improve_cnt, include_optim,
                                trainable_mask=ckpt_mask)
            if not_improve_cnt == early_stop:
                break
        save_checkpoint(exp_dir / "last", state, epoch,
                        metric_improver.state_dict(), not_improve_cnt,
                        include_optim, trainable_mask=self._ckpt_mask())
        return state

    def restore_state(self, model, exp_dir: Path, sample_batch: dict,
                      which: str = "best") -> TrainState:
        """Weights-only restore for evaluation/finetune (reference
        resume_checkpoint(finetune=True), run_strong.py:693-709).

        Trainable-only checkpoints are merged over a fresh model init
        (the frozen towers come from the model's own pretrained loading,
        as in the reference's ``load_pretrained_base`` merge)."""
        payload, meta = load_checkpoint(exp_dir / which)
        params = payload["params"]
        batch_stats = payload.get("batch_stats", {})
        if meta.get("trainables_only"):
            from texttoaudiogrounding_tpu.training.train_state import \
                merge_matched_params
            rng = jax.random.PRNGKey(self.config.get("seed", 1))
            # upcast the f16 wire format before init, like init_state
            init_batch = upcast_wire(array_batch(sample_batch))
            # MultiText models expect a phrase axis (same unsqueeze as
            # eval_inference; reference run_weak_phrase.py:48-50)
            for key in getattr(model, "text_forward_keys", ()):
                if key in init_batch and init_batch[key].ndim in (1, 2):
                    init_batch[key] = init_batch[key][:, None]
            variables = model.init({"params": rng}, init_batch, train=False)
            params = merge_matched_params(variables["params"], params,
                                          log_fn=self.logger.info)
            if not batch_stats:
                batch_stats = variables.get("batch_stats", {})
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=None, step=0)
        # under parallel.rules the restored arrays carry the SAVED mesh's
        # shardings (or none, cross-process); publish the eval-time
        # shardings so make_forward/make_val_step jit against them, and
        # re-shard onto the CURRENT mesh — which may have a different
        # shape than the one the checkpoint was written under (pod
        # elasticity; tests/test_multichip.py pins the train-side analog)
        if self.config.get("parallel", {}).get("rules"):
            self._state_sh = self.state_shardings(state)
            state = jax.device_put(state, self._state_sh)
        else:
            # no rules: the eval forward jits against replicated state,
            # so a checkpoint written under a sharded mesh must be
            # re-gathered (its arrays arrive carrying the saved mesh)
            state = jax.device_put(state, replicate(self.mesh))
        return state

    def _resume(self, state: TrainState, ckpt_path,
                finetune: bool = False) -> tuple[TrainState, dict]:
        """Restore a training checkpoint into a freshly-initialized state.

        Full resume restores the optimizer state with the live opt-state
        pytree as the orbax template (so NamedTuple structure and dtypes
        match); ``.pth`` paths route through the torch importer.
        """
        ckpt_path = str(ckpt_path)
        if ckpt_path.endswith((".pth", ".pt")):
            from texttoaudiogrounding_tpu.training.torch_import import (
                import_biencoder,
                load_torch_state_dict,
                merge_into_variables,
            )
            sd = load_torch_state_dict(ckpt_path)
            imported = import_biencoder(sd)
            variables = merge_into_variables(
                {"params": state.params, "batch_stats": state.batch_stats},
                imported, log_fn=self.logger.info)
            return state.replace(params=variables["params"],
                                 batch_stats=variables["batch_stats"]), {}

        import json as _json
        from pathlib import Path as _Path
        meta_path = (_Path(ckpt_path).parent
                     / f"{_Path(ckpt_path).name}.meta.json")
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = _json.load(f)
        trainables_only = meta.get("trainables_only", False)
        if finetune:
            # weights only — template-free restore tolerates checkpoints
            # with or without optimizer state
            payload, _ = load_checkpoint(ckpt_path)
        else:
            params_template = state.params
            if trainables_only:
                from texttoaudiogrounding_tpu.training.train_state import \
                    prune_tree_by_mask
                if self._freeze_mask is None:
                    raise ValueError(
                        f"{ckpt_path} is a trainable-only checkpoint but "
                        "the current model freezes nothing — cannot "
                        "reconstruct the saved tree")
                params_template = prune_tree_by_mask(state.params,
                                                     self._freeze_mask)
            template = {"params": params_template,
                        "batch_stats": state.batch_stats}
            if meta.get("include_optim"):
                template["opt_state"] = state.opt_state
            payload, _ = load_checkpoint(ckpt_path, template)
        loaded_params = payload["params"]
        if trainables_only:
            from texttoaudiogrounding_tpu.training.train_state import \
                merge_matched_params
            loaded_params = merge_matched_params(state.params, loaded_params,
                                                 log_fn=self.logger.info)
        state = state.replace(params=loaded_params,
                              batch_stats=payload.get("batch_stats",
                                                      state.batch_stats))
        if not finetune and "opt_state" in payload:
            state = state.replace(opt_state=payload["opt_state"],
                                  step=meta.get("step", 0))
        self.logger.info(f"resumed from {ckpt_path} "
                         f"(finetune={finetune}, epoch={meta.get('epoch')})")
        return state, ({} if finetune else meta)
