r"""Generic training loop (optax) with checkpoint/resume.

Rebuild of the reference's ``articulate/utils/torch/train.py``: Adam by
default, gradient clipping, validation every N iterations, best-checkpoint
selection, resume of weights/optimizer/train-info, early stopping, and
ReduceLROnPlateau (train.py:15-167). Logging goes to stdout and an optional
JSONL metrics file (the reference's wandb/tensorboard role — dependency-free
here, greppable, and easy to plot).

The step itself is a jitted ``value_and_grad`` + optax update with donated
state; batches stream from ``padded_batches``.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Callable, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data import SeqDataset, padded_batches

__all__ = ["train", "save_pytree", "load_pytree", "batch_inference",
           "save_checkpoint_orbax", "load_checkpoint_orbax"]


def batch_inference(params, forward_fn, dataset, batch_size: int = 64):
    r"""Run a trained module over a dataset, returning per-sequence outputs
    (the reference's ``articulate/utils/torch/test.py:12-25`` helper)."""
    import numpy as np

    from .data import padded_batches

    fn = jax.jit(lambda p, xs, lengths, init:
                 forward_fn(p, xs, lengths, init, None))
    outs = []
    for xs, _, lengths, init in padded_batches(dataset, batch_size,
                                               shuffle=False):
        ys = np.asarray(fn(params, jnp.asarray(xs), jnp.asarray(lengths),
                           None if init is None else jnp.asarray(init)))
        for b, L in enumerate(np.asarray(lengths)):
            outs.append(ys[:L, b])
    return outs


def save_pytree(tree, path):
    tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        pickle.dump(tree, f)


def load_pytree(path):
    with open(path, "rb") as f:
        tree = pickle.load(f)
    return jax.tree.map(jnp.asarray, tree)


def save_checkpoint_orbax(tree, path):
    r"""Orbax-backed checkpoint (atomic, sharding-aware) — optional
    alternative to the pickle format for multi-host runs."""
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), jax.tree.map(np.asarray, tree),
              force=True)
    ckpt.wait_until_finished()


def load_checkpoint_orbax(path, like=None):
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    return jax.tree.map(jnp.asarray, restored)


def _log_jsonl(path, record):
    if path is None:
        return
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def train(params, forward_fn: Callable, loss_fn: Callable,
          train_dataset: SeqDataset, valid_dataset: Optional[SeqDataset],
          save_dir: str, *, eval_fn: Optional[Callable] = None,
          optimizer=None, learning_rate: float = 1e-3, num_epoch: int = 5000,
          batch_size: int = 256, valid_batch_size: int = 64,
          num_iter_between_vald: int = -1, early_stop_threshold: int = -1,
          clip_grad_norm: float = 0.0, load_last_states: bool = True,
          lr_scheduler_patience: Optional[int] = None,
          lr_scheduler_factor: float = 0.1, seed: int = 0,
          log_metrics: bool = True, mesh=None,
          epoch_hook: Optional[Callable] = None):
    r"""Train one RNN module.

    ``forward_fn(params, xs, lengths, init, rng) -> ys`` and
    ``loss_fn(ys, labels, lengths) -> scalar`` keep the loop generic over
    the per-RNN feature/loss engineering (sig_mp trainers).
    Checkpoints: ``weights.pkl`` / ``best_weights.pkl`` /
    ``optimizer_states.pkl`` / ``train_info.json`` in ``save_dir``
    (train.py:71-104 naming, pickle instead of torch format).
    Returns the best params.
    """
    os.makedirs(save_dir, exist_ok=True)
    eval_fn = eval_fn or loss_fn
    metrics_path = os.path.join(save_dir, "metrics.jsonl") if log_metrics else None

    opt_base = optimizer or optax.adam
    lr_scale = 1.0

    tx = opt_base(learning_rate)
    if clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    opt_state = tx.init(params)
    train_info = {"epoch": 0, "it": 0, "total_it": 0, "min_vald_loss": 1e9,
                  "lr_scale": 1.0}

    w_file = os.path.join(save_dir, "weights.pkl")
    best_file = os.path.join(save_dir, "best_weights.pkl")
    opt_file = os.path.join(save_dir, "optimizer_states.pkl")
    info_file = os.path.join(save_dir, "train_info.json")

    if load_last_states and os.path.exists(info_file):
        with open(info_file) as f:
            train_info = json.load(f)
        if os.path.exists(w_file):
            params = load_pytree(w_file)
        lr_scale = train_info.get("lr_scale", 1.0)
        if os.path.exists(opt_file):
            loaded = load_pytree(opt_file)
            # only adopt a saved optimizer state whose structure matches the
            # current optimizer (resuming with changed hyperparameters falls
            # back to a fresh state)
            if (jax.tree.structure(loaded)
                    == jax.tree.structure(opt_state)):
                opt_state = loaded
            else:
                print("optimizer config changed; reinitializing opt state")
        print("resumed: epoch %d it %d total_it %d" %
              (train_info["epoch"], train_info["it"], train_info["total_it"]))

    if mesh is not None:
        # data-parallel: params replicated, batch sharded, grad all-reduce
        # inserted by XLA (SURVEY.md §2.3 disposition)
        from ..parallel.mesh import make_dp_train_step
        train_step = make_dp_train_step(forward_fn, loss_fn, tx, mesh)
    else:
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, xs, ys, lengths, init, rng, scale):
            def compute(p):
                out = forward_fn(p, xs, lengths, init, rng)
                return loss_fn(out, ys, lengths)

            loss, grads = jax.value_and_grad(compute)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            # ReduceLROnPlateau folded in as a post-hoc update scale
            updates = jax.tree.map(lambda u: u * scale, updates)
            return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def eval_step(params, xs, ys, lengths, init):
        out = forward_fn(params, xs, lengths, init, None)
        return eval_fn(out, ys, lengths)

    vald_max_len = (max(len(d) for d in valid_dataset.data)
                    if valid_dataset is not None else 0)

    def run_validation(params):
        if valid_dataset is None:
            return None
        tot, nb = 0.0, 0
        for xs, ys, lengths, init in padded_batches(
                valid_dataset, valid_batch_size, shuffle=False,
                pad_to=vald_max_len):
            tot += float(eval_step(params, jnp.asarray(xs), jnp.asarray(ys),
                                   jnp.asarray(lengths),
                                   None if init is None else jnp.asarray(init)))
            nb += 1
        return tot / max(nb, 1)

    rng_np = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    esn = early_stop_threshold if early_stop_threshold > 0 else float("inf")
    min_vald = train_info.get("min_vald_loss", 1e9)
    plateau_best = min_vald
    total_it = train_info["total_it"]
    plateau_count = 0

    for epoch in range(train_info["epoch"], num_epoch):
        if epoch_hook is not None:
            # per-epoch dataset refresh (e.g. a fresh AMASS random-camera
            # draw per chunk, mirroring the reference's per-__getitem__
            # synthesis, sig_mp.py:520-552) before batches materialize
            epoch_hook(epoch)
        train_loss, n_step = 0.0, 0
        batches = list(padded_batches(train_dataset, batch_size, rng_np,
                                      drop_last=mesh is not None))
        n_between = (num_iter_between_vald if num_iter_between_vald > 0
                     else len(batches))
        for i, (xs, ys, lengths, init) in enumerate(batches):
            if epoch == train_info["epoch"] and i < train_info["it"]:
                continue
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(xs), jnp.asarray(ys),
                jnp.asarray(lengths),
                None if init is None else jnp.asarray(init), sub,
                jnp.asarray(lr_scale, jnp.float32))
            train_loss += float(loss)
            n_step += 1
            total_it += 1

            if (i + 1) % n_between == 0 or i == len(batches) - 1:
                vald = run_validation(params)
                tl = train_loss / max(n_step, 1)
                vl = vald if vald is not None else tl
                print("epoch %4d/%d  it %4d/%d  total %6d  "
                      "train %.6f  vald %.6f" %
                      (epoch, num_epoch, i + 1, len(batches), total_it, tl, vl))
                _log_jsonl(metrics_path,
                           {"epoch": epoch, "it": i + 1, "total_it": total_it,
                            "train_loss": tl, "vald_loss": vl})
                save_pytree(params, w_file)
                save_pytree(opt_state, opt_file)
                with open(info_file, "w") as f:
                    json.dump({"epoch": epoch, "it": i + 1,
                               "total_it": total_it,
                               "min_vald_loss": min_vald,
                               "lr_scale": lr_scale}, f)
                if vl < min_vald:
                    min_vald = vl
                    save_pytree(params, best_file)
                    esn = (early_stop_threshold if early_stop_threshold > 0
                           else float("inf"))
                else:
                    esn -= 1
                    if esn == 0:
                        print("early stop")
                        return load_pytree(best_file)
                # ReduceLROnPlateau stepped per validation like the
                # reference's scheduler.step(vald_loss) (train.py:160-161;
                # torch rel-threshold 1e-4, patience in validations)
                if lr_scheduler_patience is not None:
                    if vl < plateau_best * (1.0 - 1e-4):
                        plateau_best = vl
                        plateau_count = 0
                    else:
                        plateau_count += 1
                        if plateau_count > lr_scheduler_patience:
                            lr_scale *= lr_scheduler_factor
                            plateau_count = 0
                            print(f"plateau: lr scale -> {lr_scale}")
                train_loss, n_step = 0.0, 0
        train_info["it"] = 0
        train_info["epoch"] = epoch

    return load_pytree(best_file) if os.path.exists(best_file) else params
