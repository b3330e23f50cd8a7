"""Training engine: one jitted, data-parallel train step + host-side loop.

Re-architecture of the reference's ignite-based engine
(/root/reference/deepclr/engine/{trainer.py,engines.py}): same observable
behavior — gradient accumulation, running-average metrics, periodic
log/summary/checkpoint/validation events, interrupt/exception checkpoints —
but with the entire compute (forward, loss, metrics, grad accumulation,
optimizer incl. lookahead, metric EMAs) inside a single jit-compiled function
over a data-parallel device mesh.
"""
from __future__ import annotations

import math
import os
import os.path as osp
import signal
import threading
import time
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation import Evaluator
from ..losses import make_loss_fn, make_metric_fns
from ..models import build_model, init_params
from ..parallel import (
    allgather_host, allgather_host_f64, allgather_host_strings, is_primary,
    make_mesh_for_batch,
    process_count, process_index, put_replicated, replicate_sharding,
    shard_batch,
)
from ..solver import make_optimizer, make_schedule
from ..utils.logging import create_logger, create_summary_writer
from .checkpoint import Checkpointer, restore_checkpoint

__all__ = ["TrainState", "make_train_step", "make_eval_step", "train", "run_trainer",
           "shutdown_in_progress", "install_sigint_handler"]

# Interrupt-checkpoint contract (reference trainer.py:222-231, hardened):
# once the loop has exited — completed, interrupted, or crashed — the
# resumable state is being (or has been) persisted, and a late SIGINT must
# not flip the process exit status.  The event is set the moment the run
# enters its shutdown path; the SIGINT handler installed by run_trainer
# (and by scripts/training.py) downgrades the signal to a log line from
# then on, closing the window between "Training completed" and process
# exit that the raw KeyboardInterrupt contract leaves open.
_shutdown = threading.Event()

# Donation-window interrupt deferral: the jitted step donates the previous
# TrainState, so its buffers are DELETED the moment the call dispatches.  A
# KeyboardInterrupt raised between that dispatch and the rebinding
# ``state = train_step(...)`` leaves the name ``state`` pointing at deleted
# arrays, and the interrupt checkpoint then dies with "Array has been
# deleted".  While _defer_depth > 0 the SIGINT handler records the signal
# instead of raising; _defer_interrupt re-raises it at the context exit,
# where ``state`` is a coherent pytree again.  Signal handlers run at main-
# thread bytecode boundaries, so plain ints are race-free here.
_defer_depth = 0
_interrupt_pending = False


@contextmanager
def _defer_interrupt():
    global _defer_depth, _interrupt_pending
    _defer_depth += 1
    try:
        yield
    finally:
        _defer_depth -= 1
        if _interrupt_pending and _defer_depth == 0:
            _interrupt_pending = False
            raise KeyboardInterrupt


def shutdown_in_progress() -> bool:
    return _shutdown.is_set()


def _sigint_handler(signum, frame):
    """Module-level singleton so installs are idempotent: when the entry
    script pre-installs it, run_trainer sees itself as the previous
    handler and never restores the default one — there is NO instant at
    which a raw SIGINT can kill the process between loop exit and
    interpreter exit (a race reproduced under CPU load: the default
    handler restored by run_trainer's finally fired before the script's
    own finally could install SIG_IGN)."""
    global _interrupt_pending
    if _shutdown.is_set():
        print("SIGINT ignored: training state already persisted / "
              "shutdown in progress", flush=True)
        return
    if _defer_depth > 0:
        _interrupt_pending = True
        return
    raise KeyboardInterrupt


def install_sigint_handler():
    """Install the shutdown-aware SIGINT handler (raise KeyboardInterrupt
    until shutdown starts, ignore after).  Entry scripts call this once at
    process start.

    Returns the previous handler, or None when not on the main thread
    (signal.signal is main-thread-only; worker-thread callers keep the
    process handler untouched).
    """
    try:
        return signal.signal(signal.SIGINT, _sigint_handler)
    except ValueError:  # not the main thread
        return None


@flax.struct.dataclass
class TrainState:
    """Everything the jitted step mutates, as one donated pytree."""

    step: jnp.ndarray          # micro-iteration counter (int32)
    params: Any
    batch_stats: Any           # {} when the model has no BatchNorm
    opt_state: Any
    grad_acc: Any              # accumulated grads (zeros between updates)
    metrics_ema: Dict[str, jnp.ndarray]
    rng: jax.Array
    # Polyak weight average (optimizer.weight_ema_decay > 0); () when off.
    # No reference analog — an opt-in stabilizer for the noisy-final-weights
    # long-horizon odometry sensitivity (docs/kitti_synth.md).
    param_ema: Any = ()


_BATCH_KEYS = (
    "template", "source", "template_mask", "source_mask",
    "aug_template", "aug_source", "y",
)


def _device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: batch[k] for k in _BATCH_KEYS if k in batch}


def create_train_state(model, variables, optimizer, metric_names,
                       seed: int = 0, weight_ema: bool = False) -> TrainState:
    # Copy leaves: the state is donated into the jitted step, so it must not
    # alias the caller's buffers.
    params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), variables["params"]
    )
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        grad_acc=jax.tree_util.tree_map(jnp.zeros_like, params),
        metrics_ema={n: jnp.zeros([], jnp.float32) for n in metric_names},
        rng=jax.random.PRNGKey(seed),
        # seeding the average at the initial params needs no bias correction
        param_ema=(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                          variables["params"])
                   if weight_ema else ()),
    )


def make_train_step(model, optimizer, loss_fn, metric_fns,
                    accumulation_steps: int = 1, ema_alpha: float = 0.5,
                    use_model_loss: bool = False,
                    weight_ema_decay: float = 0.0) -> Callable:
    """Build the jitted train step: (state, batch, lr) -> (state, metrics).

    ``weight_ema_decay`` > 0 maintains a Polyak average of the params in
    ``state.param_ema`` (updated only on real optimizer updates, i.e. every
    ``accumulation_steps`` micro-steps); the state must then be created with
    ``create_train_state(..., weight_ema=True)``.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], lr):
        rng = jax.random.fold_in(state.rng, state.step)
        has_bn = bool(state.batch_stats)

        def compute(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            kwargs = dict(
                y=batch["y"], train=True, rngs={"dropout": rng},
            )
            if has_bn:
                kwargs["mutable"] = ["batch_stats"]
            out = model.apply(
                variables,
                batch["template"], batch["source"],
                batch.get("template_mask"), batch.get("source_mask"),
                batch.get("aug_template"), batch.get("aug_source"),
                **kwargs,
            )
            if has_bn:
                (y_pred, model_loss), updated = out
            else:
                (y_pred, model_loss), updated = out, {}
            loss = model_loss if use_model_loss else loss_fn(y_pred, batch["y"])
            return loss, (y_pred, updated)

        (loss, (y_pred, updated)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)

        # grad accumulation (reference: loss / accumulation_steps then step
        # every k iterations, engines.py:72-77)
        grads = jax.tree_util.tree_map(
            lambda g: g / accumulation_steps, grads
        )
        grad_acc = jax.tree_util.tree_map(
            lambda a, g: a + g, state.grad_acc, grads
        )
        step = state.step + 1
        do_update = (step % accumulation_steps) == 0

        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams,
                             "learning_rate": jnp.asarray(lr, jnp.float32)}
            )

        # static: the state's pytree structure fixes whether EMA is on
        has_ema = bool(jax.tree_util.tree_leaves(state.param_ema))
        if has_ema and not weight_ema_decay > 0.0:
            raise ValueError(
                "state carries param_ema but weight_ema_decay is 0"
            )

        def apply_update(args):
            params, opt_state, acc, ema = args
            updates, new_opt = optimizer.update(acc, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
            if has_ema:
                d = jnp.float32(weight_ema_decay)
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype),
                    ema, new_params,
                )
            return new_params, new_opt, zeros, ema

        params, opt_state, grad_acc, param_ema = jax.lax.cond(
            do_update, apply_update, lambda args: args,
            (state.params, opt_state, grad_acc, state.param_ema),
        )

        # step metrics + running averages (ignite RunningAverage semantics)
        step_metrics = {"loss": loss / accumulation_steps, "loss_fn": loss}
        for name, fn in metric_fns.items():
            step_metrics[name] = fn(y_pred, batch["y"])
        is_first = state.step == 0
        ema = {
            k: jnp.where(
                is_first, v, state.metrics_ema[k] * ema_alpha + (1 - ema_alpha) * v
            )
            for k, v in step_metrics.items()
        }

        new_state = TrainState(
            step=step,
            params=params,
            batch_stats=updated.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            grad_acc=grad_acc,
            metrics_ema=ema,
            rng=state.rng,
            param_ema=param_ema,
        )
        return new_state, ema

    return jax.jit(train_step, donate_argnums=0)


def make_eval_step(model, metric_fns, mesh=None) -> Callable:
    """Jitted validation step: (state, batch) -> (y_pred, metrics).

    With ``mesh`` given, ``y_pred`` is constrained fully replicated: on a
    multi-host mesh XLA all-gathers the DP-sharded predictions over ICI so
    every host holds the full (global-batch, label_dim) array — this is
    what keeps the trajectory/segment-error validation export alive on
    pods (reference validation observability:
    /root/reference/deepclr/engine/trainer.py:270-290).  Free single-host
    (the constraint is a no-op on an already-addressable array).
    """

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        y_pred, _ = model.apply(
            variables,
            batch["template"], batch["source"],
            batch.get("template_mask"), batch.get("source_mask"),
            batch.get("aug_template"), batch.get("aug_source"),
            train=False,
        )
        metrics = {name: fn(y_pred, batch["y"]) for name, fn in metric_fns.items()}
        if mesh is not None:
            y_pred = jax.lax.with_sharding_constraint(
                y_pred, replicate_sharding(mesh)
            )
        return y_pred, metrics

    return jax.jit(eval_step)


def store_models_code(path: str) -> None:
    """Snapshot the model source next to the checkpoints (reference
    store_models_code, models/build.py:32-41)."""
    import shutil

    src = osp.join(osp.dirname(osp.dirname(osp.realpath(__file__))), "models")
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".py"):
            shutil.copy(osp.join(src, f), osp.join(path, f))


def train(cfg) -> None:
    """Full training entry point (reference engine/trainer.py:25-89)."""
    model = build_model(cfg.model)
    num_points = cfg.data_loader.num_points or 2048
    variables = init_params(
        model, jax.random.PRNGKey(cfg.seed), num_points=num_points,
        batch_size=1,
    )
    optimizer = make_optimizer(cfg)
    schedule = make_schedule(cfg)

    loss_fn = make_loss_fn(cfg.metrics.loss, cfg.model.label_type)
    metric_fns = make_metric_fns(
        cfg.metrics.loss, cfg.metrics.other, cfg.model.label_type
    )

    from ..data import make_data_loader

    # multi-host: each process consumes a disjoint sample slice and feeds
    # its local devices (per-host input pipelines, SURVEY §2.4); global
    # batch = batch_size × process_count, assembled in shard_batch
    shard = dict(shard_index=process_index(), num_shards=process_count())
    train_loader = make_data_loader(cfg, is_train=True, **shard)
    val_loader = make_data_loader(cfg, is_train=False, **shard)

    run_trainer(cfg, model, variables, train_loader, val_loader, optimizer,
                schedule, loss_fn, metric_fns)


def run_trainer(cfg, model, variables, train_loader, val_loader, optimizer,
                schedule, loss_fn, metric_fns,
                mesh=None) -> TrainState:
    """The training loop; returns the final state (for tests)."""
    # multi-host: experiment artifacts, file logs, tensorboard and
    # checkpoints are written by the primary process only — secondaries
    # would double-write the same paths (reference vestige:
    # deepclr/utils/logging.py:10 distributed_rank)
    primary = is_primary()
    if cfg.output_dir and primary:
        # experiment artifacts: config snapshots + model source code copy
        # (reference trainer.py:32-36)
        os.makedirs(cfg.output_dir, exist_ok=True)
        cfg.write_file(osp.join(cfg.output_dir, "config.yaml"))
        cfg.model.write_file(osp.join(cfg.output_dir, "model_config.yaml"))
        store_models_code(osp.join(cfg.output_dir, "models"))

    logger = create_logger(name="train", save_dir=cfg.output_dir,
                           distributed_rank=process_index())
    writer = (create_summary_writer(cfg.output_dir)
              if cfg.output_dir and primary else None)

    log_period = cfg.logging.log_period
    summary_period = cfg.logging.summary_period
    checkpoint_period = cfg.logging.checkpoint_period
    validation_period = cfg.logging.validation_period
    accumulation_steps = cfg.optimizer.accumulation_steps
    alpha = cfg.metrics.running_average_alpha
    label_type = cfg.model.label_type
    batch_size = cfg.data_loader.batch_size

    # epochs (reference trainer.py:119-127)
    loader_len = len(train_loader)
    max_iterations = cfg.optimizer.max_iterations
    if max_iterations is not None:
        iteration_epochs = int(math.ceil(max_iterations / loader_len))
        if cfg.optimizer.max_epochs is not None:
            epochs = min(cfg.optimizer.max_epochs, iteration_epochs)
        else:
            epochs = iteration_epochs
    else:
        epochs = cfg.optimizer.max_epochs
        max_iterations = epochs * loader_len

    if mesh is None:
        # cfg batch_size is per-host; the mesh spans all hosts' devices and
        # consumes the global batch
        mesh = make_mesh_for_batch(batch_size * process_count())
    use_model_loss = model.loss_module is not None
    weight_ema_decay = float(
        getattr(cfg.optimizer, "weight_ema_decay", 0.0) or 0.0
    )

    train_step = make_train_step(
        model, optimizer, loss_fn, metric_fns,
        accumulation_steps=accumulation_steps, ema_alpha=alpha,
        use_model_loss=use_model_loss,
        weight_ema_decay=weight_ema_decay,
    )
    eval_step = make_eval_step(model, {**metric_fns, "loss_fn": loss_fn},
                               mesh=mesh)

    state = create_train_state(
        model, variables, optimizer,
        metric_names=["loss", "loss_fn", *metric_fns.keys()],
        seed=cfg.seed,
        weight_ema=weight_ema_decay > 0.0,
    )

    start_epoch = 0
    iteration = 0
    if cfg.checkpoint is not None:
        restored = restore_checkpoint(cfg.checkpoint, state)
        state = restored["state"]
        start_epoch = restored["epoch"]
        iteration = restored["iteration"]
        logger.info(f"Restored checkpoint at epoch {start_epoch}, "
                    f"iteration {iteration}")

    state = put_replicated(state, mesh)

    checkpointer = None
    if cfg.output_dir and primary:
        checkpointer = Checkpointer(
            cfg.output_dir, n_saved=cfg.logging.checkpoint_n_saved
        )

    logger.info(f"Start training for {epochs} epochs "
                f"({max_iterations} iterations, mesh={mesh.shape})")

    validation_count = 0

    def scheduler_count() -> int:
        if cfg.scheduler.on_iteration:
            return iteration
        if cfg.scheduler.on_validation:
            return validation_count
        return epoch  # on_epoch

    def run_validation(state) -> None:
        nonlocal validation_count
        if val_loader is None:
            return
        # Multi-host: eval_step's metric means are computed over the global
        # sharded batch and come back replicated, so the scalar validation
        # is globally correct on every host.  For the trajectory/segment-
        # error export (reference validation observability,
        # /root/reference/deepclr/engine/trainer.py:270-290) the eval step
        # replicates y_pred over ICI and the host-side per-sample metadata
        # (gt label, name, stamp) is allgathered in the same process-major
        # order; the primary host then runs the full export exactly as in
        # the single-host path.
        multihost = process_count() > 1
        eval_export = Evaluator()
        sums: Dict[str, float] = {}
        count = 0
        for vbatch in val_loader:
            dev = shard_batch(_device_batch(vbatch), mesh)
            y_pred, metrics = eval_step(state, dev)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            y_gt_h = np.asarray(vbatch["y"])
            names = list(vbatch.get("d", ["val"] * y_gt_h.shape[0]))
            stamps = np.asarray(
                [np.ravel(s)[-1] for s in
                 vbatch.get("t", np.zeros(y_gt_h.shape[0]))],
                dtype=np.float64,
            )
            if multihost:
                y_gt_h = allgather_host(y_gt_h)
                names = allgather_host_strings(names)
                stamps = allgather_host_f64(stamps)
            if multihost and not primary:
                continue
            y_pred_h = np.asarray(y_pred)  # replicated: full global batch
            m_pred = np.asarray(label_type.to_matrix(y_pred_h))
            m_gt = np.asarray(label_type.to_matrix(y_gt_h))
            for i in range(y_gt_h.shape[0]):
                eval_export.add_transforms(
                    str(names[i]), float(stamps[i]), m_pred[i], m_gt[i],
                )
        if count == 0:
            return
        means = {k: v / count for k, v in sums.items()}
        logger.info(
            f"Validation Results - Epoch[{epoch}] Iteration[{iteration}] "
            f"Avg Loss: {means.get('loss_fn', float('nan')):.6f}"
        )
        validation_count += 1
        if writer is None:
            return
        for k, v in means.items():
            writer.add_scalar(f"val/{k}", v, iteration)
        total_step = eval_export.get_total_step_errors()
        writer.add_scalar("val/step_t_err", total_step.mean.translation.kitti, iteration)
        writer.add_scalar("val/step_r_err", total_step.mean.rotation.kitti, iteration)
        if cfg.data.sequential:
            for name, fig in eval_export.plot_sequences().items():
                writer.add_figure(f"val/{name}", fig, iteration)
            writer.add_figure("val/kitti_errors", eval_export.plot_total_kitti_errors(), iteration)
            writer.add_figure("val/segment_errors", eval_export.plot_segment_error_bars(), iteration)
            total_seg = eval_export.get_total_segment_errors()
            writer.add_scalar("val/kitti_t_err", total_seg.mean.translation.kitti, iteration)
            writer.add_scalar("val/kitti_r_err", total_seg.mean.rotation.kitti, iteration)

    def save_ckpt(special: Optional[str] = None) -> None:
        if checkpointer is None:
            return
        host_state = jax.device_get(state)
        # weights artifact = a flax variables dict, loadable by
        # models.load_weights for inference
        variables_out = {"params": host_state.params}
        if host_state.batch_stats:
            variables_out["batch_stats"] = host_state.batch_stats
        ema_out = None
        if jax.tree_util.tree_leaves(host_state.param_ema):
            ema_out = dict(variables_out, params=host_state.param_ema)
        if special is not None:
            checkpointer.save_special_checkpoint(
                special, epoch, iteration, host_state, variables_out,
                ema_params=ema_out,
            )
        else:
            checkpointer.save_checkpoint(
                epoch, iteration, host_state, variables_out,
                ema_params=ema_out,
            )

    epoch = start_epoch
    t_epoch = time.monotonic()
    n_batches_epoch = 0
    _shutdown.clear()
    global _interrupt_pending
    _interrupt_pending = False
    prev_sigint = install_sigint_handler()
    try:
        done = False
        for epoch in range(start_epoch, epochs):
            t_epoch = time.monotonic()
            n_batches_epoch = 0
            metrics = None
            for batch in train_loader:
                lr = schedule(scheduler_count())
                dev = shard_batch(_device_batch(batch), mesh)
                # the step donates ``state``; an interrupt inside this
                # window would strand the name on deleted buffers
                with _defer_interrupt():
                    state, metrics = train_step(state, dev, np.float32(lr))
                iteration += 1
                n_batches_epoch += 1

                if iteration % log_period == 0:
                    loss_val = float(metrics["loss"])
                    if not np.isfinite(loss_val):
                        raise ValueError(f"Invalid loss: {loss_val}")
                    it_e = (iteration - 1) % loader_len + 1
                    logger.info(
                        f"Epoch[{epoch + 1}] Iteration[{it_e}/{loader_len}] "
                        f"Loss: {loss_val:.6f}"
                    )
                if writer is not None and iteration % summary_period == 0:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", float(v), iteration)
                    writer.add_scalar("params/lr", lr, iteration)
                    loss_params = jax.device_get(state.params).get("loss_module")
                    if loss_params:
                        for k, v in loss_params.items():
                            writer.add_scalar(
                                f"params/{k}", float(np.ravel(v)[0]), iteration
                            )
                if iteration % checkpoint_period == 0:
                    save_ckpt()
                if iteration % validation_period == 0:
                    run_validation(state)
                if iteration >= max_iterations:
                    done = True
                    break

            dt = time.monotonic() - t_epoch
            if n_batches_epoch and metrics is not None:
                tpb = dt / n_batches_epoch
                logger.info(
                    f"Epoch {epoch + 1} done. Avg Loss: {float(metrics['loss']):.6f} "
                    f"Time per batch: {tpb:.3f}[s] "
                    f"Speed: {batch_size / tpb:.1f}[samples/s]"
                )
            if done:
                break

        _shutdown.set()  # loop done: late SIGINT must not kill the flush
        logger.info("Training completed")
        save_ckpt("final")
        run_validation(state)

    except KeyboardInterrupt:
        _shutdown.set()
        logger.info("KeyboardInterrupt. Stopping training.")
        save_ckpt("interrupt")
    except Exception as e:
        _shutdown.set()
        logger.info(f"{type(e).__name__} raised:")
        logger.info(str(e))
        save_ckpt("exception")
        raise

    finally:
        if writer is not None:
            writer.flush()
            writer.close()
        # restore only a FOREIGN previous handler: when the entry script
        # pre-installed _sigint_handler, restoring would swap in the
        # default handler and reopen the late-SIGINT kill window
        if prev_sigint is not None and prev_sigint is not _sigint_handler:
            signal.signal(signal.SIGINT, prev_sigint)

    return state
