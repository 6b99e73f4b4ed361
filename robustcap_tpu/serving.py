r"""Serving bundles: ahead-of-time exported streaming step artifacts.

The reference deploys by shipping Python + torch and re-tracing the model
on every process start (live_server.py). A TPU-native serving story wants
the compiled program itself to be the artifact: this module serializes the
fused per-frame step (and its first-frame prescan) through ``jax.export``
(StableHLO), together with the weights and the flag configuration, into a
directory that a serving process loads WITHOUT the model code path — no
re-trace, no Python-side model definition, stable across process restarts.

Bundle layout (directory)::

    manifest.json   config flags, dtype note, format version
    step.bin        serialized exported step(params, carry, frame)
    prescan.bin     serialized exported prescan(params, carry, frame)
    weights.pkl     parameter pytree (save_pytree format; int8 records ok)

``export_serving_bundle`` lowers for the current default backend, or an
explicit platform list (e.g. ``("cpu", "tpu")`` for one portable artifact
where both compilers are available in-process); ``ServingBundle.load``
restores a ``forward_online``-compatible stateful wrapper around the
deserialized functions.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from .config import SigMPConfig
from .models import sig_mp
from .smpl.model import ParametricModel

__all__ = ["export_serving_bundle", "ServingBundle"]

_FORMAT_VERSION = 1


def _bundle_prepped(params, cfg: SigMPConfig):
    r"""The serve kernel's repacked operand bank for a bundle's weights —
    deterministic given (params, cfg), so the load-time rebuild produces
    exactly the pytree the exported chunk program was traced with."""
    import jax.numpy as jnp

    from .nn.rnn import is_quantized
    from .ops.pallas_serve import prepare_serve_params

    if cfg.int8_compute:
        return prepare_serve_params(params, int8_gates=True)
    wdtype = (jnp.bfloat16 if is_quantized(params) else
              params["rnn2"]["layers"][0]["w_ih"].dtype)
    return prepare_serve_params(params, dtype=wdtype)


def _make_chunk_fn(params, body_model: ParametricModel, cfg: SigMPConfig,
                   K: int):
    r"""(fn, example_args) for the K-frame chunk program: the whole-step
    weight-resident kernel when ``cfg.pallas_serve``, else the XLA scan of
    the cond step. fn(params_or_arrs, carry, frames) -> (new_carry,
    (poses, trans))."""
    from functools import partial

    frames0 = sig_mp._sequence_frames(
        np.zeros((K, 33, 3), np.float32), np.zeros((K, 6, 3), np.float32),
        np.broadcast_to(np.eye(3, dtype=np.float32), (K, 6, 3, 3)).copy(),
        None, False, None)
    carry = sig_mp.init_carry(params)
    if cfg.pallas_serve:
        from .ops.pallas_serve import serve_scan

        prepped = _bundle_prepped(params, cfg)
        meta = {k: prepped[k] for k in ("H", "dtype", "stream", "int8")}
        arrs = {k: prepped[k] for k in ("ops", "init")}

        def fn(arrs_, carry, frames):
            poses, trans, _, new_carry = serve_scan(
                dict(arrs_, **meta), body_model, cfg, frames, carry)
            return new_carry, (poses, trans)

        return fn, (arrs, carry, frames0)

    step = sig_mp.make_step(body_model, cfg, include_first_frame_step=False,
                            cond_updater=True)

    def fn(params_, carry, frames):
        sp = sig_mp.prepare_scan_params(params_, cfg.int8_compute)
        return jax.lax.scan(partial(step, sp), carry, frames)

    return fn, (params, carry, frames0)


def export_serving_bundle(params, body_model: ParametricModel,
                          cfg: SigMPConfig, path: str,
                          platforms=None, chunk_len: int = 0,
                          extra_chunk_lens=()) -> dict:
    r"""Export the steady streaming step + first-frame prescan to ``path``.

    The exported functions take ``(params, carry, frame)`` as runtime
    arguments (weights are NOT baked into the StableHLO), so the artifact
    stays small and the same program serves re-trained weights of the same
    shapes. Returns the manifest dict.

    ``platforms=None`` lowers for the current default backend (the usual
    case: export where you serve). Pass an explicit tuple like
    ``("cpu", "tpu")`` for a portable multi-platform artifact — note that
    lowering for a platform other than the attached backend requires that
    platform's compiler to be functional in-process (true for cpu
    everywhere; "tpu" lowering does not work through this environment's
    experimental network-tunneled backend).

    ``chunk_len > 0`` additionally exports a K-frame chunk program
    (``chunk.bin``): with ``cfg.pallas_serve`` that is the whole-step
    weight-resident kernel (ops/pallas_serve.py) as a serialized Mosaic
    custom call — platform-specific, so pair it with a single-platform
    export; otherwise the XLA scan of the cond step. The chunk takes
    ``(prepped_or_params, carry, frames)`` at runtime; ``ServingBundle``
    rebuilds the repacked operand bank from ``weights.pkl`` at load time
    (a cheap reshuffle, not a re-trace).

    ``extra_chunk_lens`` exports further chunk programs (``chunk_<K>.bin``)
    of the same mode; ``ServingBundle.forward_chunk`` dispatches on the
    input length. Two lengths let a caller measure the loaded artifact's
    RTT-free per-frame device cost by differencing one K-frame dispatch
    against one 2K-frame dispatch (bench.py ``serving_bundle.device_p50_ms``).
    """
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    # B=1 serving artifact: the scalar-confidence cond form (one tail/frame)
    step = sig_mp.make_step(body_model, cfg, include_first_frame_step=False,
                            cond_updater=True)

    def prescan(params, carry, frame):
        return sig_mp.prescan_first_frame(params, body_model, carry, frame,
                                          int8_compute=cfg.int8_compute)

    carry = sig_mp.init_carry(params)
    frame = sig_mp.make_frame(np.zeros((33, 3), np.float32),
                              np.zeros((6, 3), np.float32),
                              np.broadcast_to(np.eye(3, dtype=np.float32),
                                              (6, 3, 3)).copy())
    args = (params, carry, frame)
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)

    plats = None if platforms is None else list(platforms)
    exp_step = jexport.export(jax.jit(step), platforms=plats)(*shapes)
    exp_pre = jexport.export(jax.jit(prescan), platforms=plats)(*shapes)
    if plats is None:
        plats = list(exp_step.platforms)

    with open(os.path.join(path, "step.bin"), "wb") as f:
        f.write(exp_step.serialize())
    with open(os.path.join(path, "prescan.bin"), "wb") as f:
        f.write(exp_pre.serialize())

    extra_chunk_lens = tuple(int(k) for k in extra_chunk_lens)
    for K in ((chunk_len,) if chunk_len > 0 else ()) + extra_chunk_lens:
        chunk_fn, chunk_args = _make_chunk_fn(params, body_model, cfg, K)
        chunk_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), chunk_args)
        exp_chunk = jexport.export(
            jax.jit(chunk_fn),
            platforms=None if platforms is None else list(platforms)
        )(*chunk_shapes)
        name = "chunk.bin" if K == chunk_len else f"chunk_{K}.bin"
        with open(os.path.join(path, name), "wb") as f:
            f.write(exp_chunk.serialize())

    from .train import save_pytree
    save_pytree(params, os.path.join(path, "weights.pkl"))

    manifest = {
        "format_version": _FORMAT_VERSION,
        "platforms": plats,
        "config": dataclasses.asdict(cfg),
        "jax_version": jax.__version__,
        "chunk_len": int(chunk_len),
        "extra_chunk_lens": list(extra_chunk_lens),
        "chunk_mode": ("pallas_serve" if cfg.pallas_serve else "xla_scan")
                      if (chunk_len > 0 or extra_chunk_lens) else None,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServingBundle:
    r"""A loaded bundle: the reference's ``forward_online`` API over the
    deserialized compiled step — no model code, no re-trace."""

    def __init__(self, step_fn, prescan_fn, params, cfg: SigMPConfig,
                 manifest: dict):
        self._step = step_fn
        self._prescan = prescan_fn
        self._chunk = None
        self._chunks = {}  # length -> deserialized chunk program
        self._chunk_params = None
        self.params = params
        self.cfg = cfg
        self.manifest = manifest
        self.carry = None
        self.reset_states()

    @classmethod
    def load(cls, path: str) -> "ServingBundle":
        from jax import export as jexport

        from .train import load_pytree

        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"bundle format {manifest['format_version']} != "
                f"{_FORMAT_VERSION}")
        with open(os.path.join(path, "step.bin"), "rb") as f:
            step = jexport.deserialize(f.read())
        with open(os.path.join(path, "prescan.bin"), "rb") as f:
            prescan = jexport.deserialize(f.read())
        params = load_pytree(os.path.join(path, "weights.pkl"))
        cfg_dict = dict(manifest["config"])
        # JSON degrades tuples to lists; restore so loaded configs compare
        # (and hash) equal to directly-constructed ones
        cfg_dict["conf_range"] = tuple(cfg_dict["conf_range"])
        cfg = SigMPConfig(**cfg_dict)
        bundle = cls(step.call, prescan.call, params, cfg, manifest)
        chunk_files = {}
        if manifest.get("chunk_len"):
            chunk_files[int(manifest["chunk_len"])] = os.path.join(
                path, "chunk.bin")
        for K in manifest.get("extra_chunk_lens") or ():
            chunk_files[int(K)] = os.path.join(path, f"chunk_{K}.bin")
        for K, chunk_path in chunk_files.items():
            if not os.path.exists(chunk_path):
                continue
            with open(chunk_path, "rb") as f:
                bundle._chunks[K] = jexport.deserialize(f.read()).call
        if manifest.get("chunk_len") in bundle._chunks:
            bundle._chunk = bundle._chunks[manifest["chunk_len"]]
        if bundle._chunks:
            if manifest["chunk_mode"] == "pallas_serve":
                prepped = _bundle_prepped(params, cfg)
                bundle._chunk_params = {k: prepped[k]
                                        for k in ("ops", "init")}
            else:
                bundle._chunk_params = params
        return bundle

    def reset_states(self):
        self.carry = sig_mp.init_carry(self.params)

    def forward_online(self, j2dc, accc, oric, first_tran=None,
                       first_frame=False, gravityc=None):
        frame = sig_mp.make_frame(j2dc, accc, oric, first_tran, first_frame,
                                  gravityc)
        if first_frame:
            self.carry = self._prescan(self.params, self.carry, frame)
        self.carry, (pose, tran) = self._step(self.params, self.carry, frame)
        return pose, tran

    def forward_chunk(self, j2dc, accc, oric, gravityc=None):
        r"""Advance one chunk program's worth of frames in one call: the
        exported program whose length matches the input (the fused
        weight-resident kernel when the bundle was exported with
        ``cfg.pallas_serve``)."""
        if not self._chunks:
            raise ValueError("bundle was exported without a chunk program "
                             "(export_serving_bundle(chunk_len=K))")
        frames = sig_mp._sequence_frames(j2dc, accc, oric, None, False,
                                         gravityc)
        K = int(frames["j2dc"].shape[0])
        if K not in self._chunks:
            raise ValueError(
                f"no chunk program for {K} frames (exported lengths: "
                f"{sorted(self._chunks)})")
        self.carry, out = self._chunks[K](self._chunk_params, self.carry,
                                          frames)
        return out
