r"""Per-RNN trainers for the SigMP fusion network.

Rebuild of ``train_rnn{2,3,4,6,7,8}`` + the final weight merge
(net/sig_mp.py:301-857). Each trainer builds its feature dataset (AIST++
and/or AMASS schema dicts), instantiates the reference's hyperparameters
(split_size=200 chunking, batch 256, Adam, grad-clip 1, per-RNN dropout and
augmentation noise), and runs the generic ``train`` loop. The AMASS
rnn4/rnn6 camera synthesis runs as a jittable per-batch augmentation.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import paths
from ..models.sig_mp import RNN_SPECS
from ..nn.rnn import init_net_apply, rnn_forward_padded
from ..smpl.model import ParametricModel, default_body_model
from . import features as F
from .data import SeqDataset
from .loop import load_pytree, save_pytree, train
from .losses import (make_fk_pose_loss, masked_bce_pos_weight,
                     masked_distance, masked_mse, velocity_horizon_loss)

__all__ = ["train_rnn2", "train_rnn3", "train_rnn4", "train_rnn6",
           "train_rnn7", "train_rnn8", "train_all", "merge_weights",
           "make_forward_fn"]


def make_forward_fn(dropout: float, with_init: bool = False):
    r"""Padded-batch forward for one RNN module (dropout placement matches
    rnn.py:111-130; RNNWithInit seeds (h0, c0) from the first label,
    rnn.py:207-219)."""

    def forward(params, xs, lengths, init, rng):
        state0 = None
        if with_init and init is not None:
            h, c = init_net_apply(params, init)
            state0 = (h, c)
        ys, _ = rnn_forward_padded(params, xs, lengths, state0,
                                   dropout=dropout if rng is not None else 0.0,
                                   rng=rng)
        return ys

    return forward


def _noise_tail(sigma, tail):
    def aug(rng, x):
        out = x.copy()
        out[:, -tail:] = out[:, -tail:] + rng.normal(0, sigma,
                                                     out[:, -tail:].shape)
        return out.astype(np.float32)
    return aug


def _noise_all(sigma):
    def aug(rng, x):
        return (x + rng.normal(0, sigma, x.shape)).astype(np.float32)
    return aug


def _init_module(name, seed=0):
    i, o, h, _, with_init = RNN_SPECS[name]
    from ..nn.rnn import init_rnn_params
    return init_rnn_params(jax.random.PRNGKey(seed), i, o, h, 2, with_init)


def _concat(a, b):
    return ([*a[0], *b[0]], [*a[1], *b[1]])


def train_rnn2(aist_train: Dict, aist_val: Dict, amass_train: Dict = None,
               amass_val: Dict = None, save_dir: Optional[str] = None,
               num_epoch: int = 150, **kw):
    r"""Inertial pose branch (sig_mp.py:301-357): RNNWithInit, MSE loss,
    distance eval."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn2")
    d, l = F.rnn2_features(aist_train)
    if amass_train is not None:
        d, l = _concat((d, l), F.rnn2_features(amass_train))
    dv, lv = F.rnn2_features(aist_val)
    if amass_val is not None:
        dv, lv = _concat((dv, lv), F.rnn2_features(amass_val))
    return train(
        _init_module("rnn2"), make_forward_fn(0.4, with_init=True),
        masked_mse,
        SeqDataset(d, l, split_size=200, with_init=True),
        SeqDataset(dv, lv, with_init=True), save_dir,
        eval_fn=masked_distance, num_epoch=num_epoch,
        num_iter_between_vald=20, clip_grad_norm=1.0, **kw)


def train_rnn3(aist_train: Dict, aist_val: Dict, amass_train: Dict = None,
               amass_val: Dict = None, save_dir: Optional[str] = None,
               num_epoch: int = 200, **kw):
    r"""Inertial velocity branch (sig_mp.py:359-434): multi-horizon loss,
    sigma=0.04 joint noise."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn3")
    d, l = F.rnn3_features(aist_train)
    if amass_train is not None:
        d, l = _concat((d, l), F.rnn3_features(amass_train))
    dv, lv = F.rnn3_features(aist_val)
    if amass_val is not None:
        dv, lv = _concat((dv, lv), F.rnn3_features(amass_val))
    return train(
        _init_module("rnn3"), make_forward_fn(0.4), velocity_horizon_loss,
        SeqDataset(d, l, split_size=200, augment_fn=_noise_tail(0.04, 69)),
        SeqDataset(dv, lv), save_dir, num_epoch=num_epoch,
        num_iter_between_vald=20, clip_grad_norm=1.0, **kw)


class _AmassCameraDataset(SeqDataset):
    r"""AMASS world-frame base + per-draw random camera synthesis
    (sig_mp.py:488-552). The camera augmentation runs jitted on device."""

    def __init__(self, base, split_size, conf_pool, target, yaw, seed=0):
        super().__init__(base[0], base[1], split_size=split_size)
        self.conf_pool = jnp.asarray(conf_pool)
        self.target = target
        self.yaw = yaw
        self._key = jax.random.PRNGKey(seed)
        self._aug = jax.jit(partial(F.amass_camera_augment, target=target,
                                    yaw=yaw))
        # materialize per-chunk synthesized camera views lazily at access
        orig_data, orig_label = self.data, self.label
        self._base = (orig_data, orig_label)

    def resample(self):
        r"""Draw a fresh camera for every chunk (call once per epoch)."""
        data, label = [], []
        for d, l in zip(*self._base):
            self._key, sub = jax.random.split(self._key)
            dd, ll = self._aug(sub, jnp.asarray(d), jnp.asarray(l),
                               self.conf_pool)
            data.append(np.asarray(dd))
            label.append(np.asarray(ll))
        self.data, self.label = data, label


def _load_conf_pool():
    r"""Empirical keypoint-confidence pool (data/dataset_work/syn_c.pt,
    sig_mp.py:497); synthetic beta-like fallback when absent."""
    if os.path.exists(paths.syn_conf_file):
        import torch
        return np.asarray(torch.load(paths.syn_conf_file), np.float32)
    rng = np.random.RandomState(0)
    return np.clip(rng.beta(5, 1, 4096), 0, 1).astype(np.float32)


def train_rnn4(aist_train: Dict, aist_val: Dict, amass_train: Dict = None,
               amass_val: Dict = None, save_dir: Optional[str] = None,
               num_epoch: int = 200, **kw):
    r"""Visual-inertial pose branch (sig_mp.py:436-574): lr 1e-4, occluded
    keypoint variants included, AMASS random-camera synthesis."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn4")
    d, l = F.rnn4_features_aist(aist_train)
    dv, lv = F.rnn4_features_aist(aist_val, include_occ=False)
    datasets = [SeqDataset(d, l, split_size=200)]
    hook = None
    if amass_train is not None:
        am = _AmassCameraDataset(F.amass_mp_base(amass_train), 200,
                                 _load_conf_pool(), "rnn4", (-180.0, 180.0))
        am.resample()
        datasets.append(am)
    merged = SeqDataset([*datasets[0].data,
                         *(datasets[1].data if len(datasets) > 1 else [])],
                        [*datasets[0].label,
                         *(datasets[1].label if len(datasets) > 1 else [])])
    if amass_train is not None:
        n_aist = len(datasets[0].data)

        def hook(_epoch, am=am, merged=merged, n_aist=n_aist):
            # fresh camera/translation/confidence draw per chunk per epoch
            # (the reference redraws per __getitem__, sig_mp.py:520-552)
            am.resample()
            merged.data[n_aist:] = am.data
            merged.label[n_aist:] = am.label

    return train(
        _init_module("rnn4"), make_forward_fn(0.4), masked_mse,
        merged, SeqDataset(dv, lv), save_dir, eval_fn=masked_distance,
        learning_rate=1e-4, num_epoch=num_epoch, num_iter_between_vald=60,
        clip_grad_norm=1.0, epoch_hook=hook, **kw)


def train_rnn6(aist_train: Dict, aist_val: Dict, amass_train: Dict = None,
               amass_val: Dict = None, save_dir: Optional[str] = None,
               num_epoch: int = 100, **kw):
    r"""Visual translation branch (sig_mp.py:576-697): sigma=0.03 joint
    noise, ReduceLROnPlateau patience 5."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn6")
    d, l = F.rnn6_features_aist(aist_train)
    dv, lv = F.rnn6_features_aist(aist_val)
    hook = None
    if amass_train is not None:
        am = _AmassCameraDataset(F.amass_mp_base(amass_train), 200,
                                 _load_conf_pool(), "rnn6", (-90.0, 90.0))
        am.resample()
        d, l = [*d, *am.data], [*l, *am.label]
    ds = SeqDataset(d, l, split_size=200, augment_fn=_noise_tail(0.03, 69))
    if amass_train is not None:
        n_amass = len(am.data)

        def hook(_epoch, am=am, ds=ds, n_amass=n_amass):
            # amass chunks are already <= split_size, so the dataset tail
            # maps 1:1 onto am.data after re-splitting
            am.resample()
            ds.data[-n_amass:] = am.data
            ds.label[-n_amass:] = am.label

    return train(
        _init_module("rnn6"), make_forward_fn(0.4), masked_mse,
        ds, SeqDataset(dv, lv), save_dir, num_epoch=num_epoch,
        num_iter_between_vald=60, clip_grad_norm=1.0,
        lr_scheduler_patience=5, epoch_hook=hook, **kw)


def train_rnn7(aist_train: Dict, aist_val: Dict, amass_train: Dict = None,
               amass_val: Dict = None, save_dir: Optional[str] = None,
               num_epoch: int = 120, body_model: ParametricModel = None,
               **kw):
    r"""Global-pose head (sig_mp.py:700-787): FK-weighted r6d loss,
    sigma=0.03 noise on the whole input, plateau patience 5."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn7")
    body_model = body_model or default_body_model()
    d, l = F.rnn7_features(aist_train, body_model)
    if amass_train is not None:
        d, l = _concat((d, l), F.rnn7_features(amass_train, body_model))
    dv, lv = F.rnn7_features(aist_val, body_model)
    loss = make_fk_pose_loss(body_model)
    return train(
        _init_module("rnn7"), make_forward_fn(0.1), loss,
        SeqDataset(d, l, split_size=200, augment_fn=_noise_all(0.03)),
        SeqDataset(dv, lv), save_dir, num_epoch=num_epoch,
        num_iter_between_vald=20, clip_grad_norm=1.0,
        lr_scheduler_patience=5, **kw)


def train_rnn8(amass_train: Dict, amass_val: Dict,
               save_dir: Optional[str] = None, num_epoch: int = 80, **kw):
    r"""Foot-contact head (sig_mp.py:790-839): AMASS only, pos-weighted BCE,
    plateau patience 10."""
    save_dir = save_dir or os.path.join(paths.weight_dir, "sig_mp", "rnn8")
    d, l = F.rnn8_features(amass_train)
    dv, lv = F.rnn8_features(amass_val)
    all_labels = np.concatenate(l)
    pos_weight = ((1 - all_labels).sum(0) /
                  np.maximum(all_labels.sum(0), 1.0))
    loss = masked_bce_pos_weight(pos_weight)
    return train(
        _init_module("rnn8"), make_forward_fn(0.4), loss,
        SeqDataset(d, l, split_size=200, augment_fn=_noise_tail(0.03, 69)),
        SeqDataset(dv, lv), save_dir, num_epoch=num_epoch,
        num_iter_between_vald=20, clip_grad_norm=1.0,
        lr_scheduler_patience=10, **kw)


def merge_weights(weight_dir: Optional[str] = None, out_file: str = None):
    r"""Merge the six best per-RNN checkpoints into one parameter pytree
    (sig_mp.py:850-857)."""
    weight_dir = weight_dir or os.path.join(paths.weight_dir, "sig_mp")
    params = {}
    for name in RNN_SPECS:
        params[name] = load_pytree(
            os.path.join(weight_dir, name, "best_weights.pkl"))
    out_file = out_file or os.path.join(weight_dir, "best_weights.pkl")
    save_pytree(params, out_file)
    return params


def train_all(aist_train, aist_val, amass_train, amass_val, **kw):
    r"""Train all six RNNs then merge (sig_mp.py:842-857)."""
    train_rnn2(aist_train, aist_val, amass_train, amass_val, **kw)
    train_rnn3(aist_train, aist_val, amass_train, amass_val, **kw)
    train_rnn4(aist_train, aist_val, amass_train, amass_val, **kw)
    train_rnn6(aist_train, aist_val, amass_train, amass_val, **kw)
    train_rnn7(aist_train, aist_val, amass_train, amass_val, **kw)
    train_rnn8(amass_train, amass_val, **kw)
    return merge_weights()
