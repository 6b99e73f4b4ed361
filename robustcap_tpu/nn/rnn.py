r"""Recurrent building blocks: torch-weight-compatible LSTM stacks in JAX.

TPU-native rebuild of the reference's ``articulate/utils/torch/rnn.py``. The
reference wraps ``torch.nn.LSTM`` behind pack/pad plumbing (rnn.py:121-133);
here the same module family (linear-in -> ReLU -> N-layer LSTM -> linear-out,
plus the ``RNNWithInit`` variant whose initial hidden state is regressed from
the first label, rnn.py:174-219) is expressed as

* a parameter pytree whose arrays use the **exact PyTorch layout** (gate
  order i, f, g, o; ``w_ih [4H, in]``, ``w_hh [4H, H]``, both biases) so the
  reference's released checkpoints convert 1:1,
* a pure single-step cell (``rnn_step``) used by the streaming fusion model,
* a time-major ``lax.scan`` runner with length masking for padded batches
  (replacing pack_padded_sequence; masked steps freeze the carry so final
  states and outputs match per-sequence execution exactly).

All functions are pure and jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_linear", "init_lstm_layer", "init_rnn_params", "init_state",
    "lstm_cell", "rnn_step", "rnn_scan", "rnn_forward_padded",
    "init_net_apply", "rnn_params_from_torch", "cast_params",
    "quantize_tensor", "dequantize_tensor", "quantize_params",
    "dequantize_params", "dequantize_non_gate_params", "is_quantized",
    "quantize_activation", "prepare_scan_params", "rnn_group_step",
    "rnn_pair_step",
    "pure_rnn_params_from_torch", "pure_rnn_forward_padded",
    "cycle_rnn_params_from_torch", "cycle_rnn_forward_padded",
]


def cast_params(params, dtype):
    r"""Cast floating-point parameter leaves (weights) to ``dtype``.

    The offline scan is HBM-bandwidth-bound on re-reading the LSTM weights
    every time step; bfloat16 storage halves the bytes. ``rnn_step`` runs
    its gate math in the weights' dtype and returns float32 outputs, so the
    surrounding geometry stays full precision.

    Quantized parameter trees (see :func:`quantize_params`) are returned
    unchanged — casting their int8 payload would silently dequantize and
    casting the scales would lose the calibration.
    """
    if is_quantized(params):
        return params

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


# ---------------------------------------------------------------------------
# int8 weight quantization (serving)
# ---------------------------------------------------------------------------
#
# Weight-only W8 storage: each 2-D weight matrix is stored as a symmetric
# per-output-channel int8 tensor ``{"q": int8 [out, in], "scale": f32
# [out, 1]}`` and dequantized to bfloat16 at compute time. For the streaming
# single-frame dispatch (one ``rnn_step`` per call — no loop to hoist the
# dequant out of) this reads a quarter of the f32 bytes from HBM per
# dispatch; scan paths instead call ``dequantize_params`` once BEFORE
# ``lax.scan`` (XLA does not reliably hoist the in-loop dequant itself —
# measured 481k vs 653.6k fps), so compiled loops run at bf16 speed and the
# persistent win is the ~4x checkpoint/HBM footprint. Biases and the
# quantization scales stay float32. Inference-only: no gradient path is
# defined through the rounding.

_QUANT_KEYS = ("q", "scale")


def _is_qtensor(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == set(_QUANT_KEYS)


def is_quantized(params) -> bool:
    r"""True if ``params`` (any nesting) holds int8-quantized weights."""
    return any(_is_qtensor(leaf)
               for leaf in jax.tree.leaves(params, is_leaf=_is_qtensor))


def quantize_tensor(w):
    r"""Symmetric per-output-channel (row) int8 quantization of ``w``
    [out, in] -> {"q": int8 [out, in], "scale": f32 [out, 1]}."""
    amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = (jnp.maximum(amax, 1e-12) / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_tensor(w, dtype=jnp.float32):
    r"""Inverse of :func:`quantize_tensor` (up to rounding)."""
    return w["q"].astype(dtype) * w["scale"].astype(dtype)


def quantize_params(params):
    r"""Quantize every 2-D weight matrix of an RNN parameter tree (or a dict
    of trees, e.g. the full sig_mp six-module bank) to int8.

    Weights (``w``, ``w_ih``, ``w_hh``) become ``{"q", "scale"}`` records;
    biases remain float32. The result feeds the same ``rnn_step`` /
    ``rnn_scan`` / ``init_net_apply`` entry points; gate math runs in
    bfloat16.
    """
    def q(x):
        if _is_qtensor(x):
            return x
        if (hasattr(x, "ndim") and x.ndim == 2
                and jnp.issubdtype(x.dtype, jnp.floating)):
            return quantize_tensor(x)
        return x

    return jax.tree.map(q, params, is_leaf=_is_qtensor)


def dequantize_params(params, dtype=jnp.bfloat16):
    r"""Materialize every int8-quantized weight of a parameter tree as a
    dense ``dtype`` array; no-op for unquantized trees.

    Every scan entry point calls this once before ``lax.scan``: inside a
    scan the weights are re-read from HBM every step either way, but
    dequantizing in-loop adds ~50M VPU multiplies per step that XLA does
    not reliably hoist (653.6k vs 481k fps measured). The single-frame
    streaming dispatch (one ``rnn_step`` per call — no loop to hoist out
    of) keeps int8 in-step, halving its per-dispatch weight reads
    (docs/PERFORMANCE.md).
    """
    if not is_quantized(params):
        return params

    def d(x):
        return dequantize_tensor(x, dtype) if _is_qtensor(x) else x

    return jax.tree.map(d, params, is_leaf=_is_qtensor)


def quantize_activation(x):
    r"""Dynamic symmetric per-row int8 quantization of activations
    ``x [..., K] -> (q int8 [..., K], scale f32 [..., 1])``.

    Per-row (per batch element) scales cost one |x| row-max on the VPU and
    keep the quantization error relative to each row's own range — the
    recurrent hidden state h (tanh-bounded) and the linear1 output x (ReLU,
    unbounded) are quantized separately in :func:`lstm_cell` so neither
    crushes the other's resolution.
    """
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _dot_i8(xq, wq):
    r"""``xq [..., K] @ wq [out, K]^T`` on the int8 MXU path, int32 accum."""
    return jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _qmatmul(x, w, out_dtype):
    r"""``x @ w^T`` with dynamic int8 activations against an int8 qtensor
    ``w {"q" [out, K], "scale" [out, 1]}``; result in ``out_dtype``."""
    xq, sx = quantize_activation(x)
    z = _dot_i8(xq, w["q"])
    return (z.astype(jnp.float32) * sx * w["scale"][:, 0]).astype(out_dtype)


def dequantize_non_gate_params(params, dtype=jnp.bfloat16):
    r"""Dequantize every int8 weight EXCEPT the LSTM gate matrices
    (``layers[*].w_ih/w_hh``).

    The int8-MXU compute mode only routes the gate matmuls through
    ``_qmatmul``; the small linear1/linear2/init_net matrices still go
    through ``_wval``'s dense dequant, which inside a ``lax.scan`` would
    re-run every step (the in-loop dequant XLA does not reliably hoist —
    docs/PERFORMANCE.md). Scan drivers call this before the scan when
    ``int8_compute`` is on, so in-loop int8 reads are exactly the gate
    weights the MXU consumes directly."""
    if not is_quantized(params):
        return params

    def walk(node, under_layers=False):
        if _is_qtensor(node):
            return node if under_layers else dequantize_tensor(node, dtype)
        if isinstance(node, dict):
            return {k: walk(v, under_layers or k == "layers")
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, under_layers) for v in node)
        return node

    return walk(params)


def prepare_scan_params(params, int8_compute: bool = False,
                        dtype=jnp.bfloat16):
    r"""The one definition of "ready for a long scan": exact modes
    dequantize every int8 weight up front (in-loop dequant is the pattern
    XLA does not reliably hoist); the int8-MXU mode dequantizes only the
    non-gate leaves, keeping gate weights int8 in-loop for ``_qmatmul``."""
    return (dequantize_non_gate_params(params, dtype) if int8_compute
            else dequantize_params(params, dtype))


def _wval(w, dtype):
    r"""A weight leaf as a dense array in ``dtype`` (dequantizing if int8)."""
    if _is_qtensor(w):
        return dequantize_tensor(w, dtype)
    return w.astype(dtype) if w.dtype != dtype else w


def _wshape(w):
    return w["q"].shape if _is_qtensor(w) else w.shape


def _compute_dtype(params):
    r"""dtype the gate math runs in: the stored weight dtype, or bfloat16
    for int8-quantized weights."""
    w = params["linear1"]["w"]
    if _is_qtensor(w):
        return jnp.bfloat16
    return w.dtype


# ---------------------------------------------------------------------------
# Initialization (matches torch defaults: U(+-1/sqrt(fan)) everywhere)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, in_size: int, out_size: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_size)
    return {"w": _uniform(kw, (out_size, in_size), bound, dtype),
            "b": _uniform(kb, (out_size,), bound, dtype)}


def init_lstm_layer(key, in_size: int, hidden_size: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {"w_ih": _uniform(ks[0], (4 * hidden_size, in_size), bound, dtype),
            "w_hh": _uniform(ks[1], (4 * hidden_size, hidden_size), bound, dtype),
            "b_ih": _uniform(ks[2], (4 * hidden_size,), bound, dtype),
            "b_hh": _uniform(ks[3], (4 * hidden_size,), bound, dtype)}


def init_rnn_params(key, input_size: int, output_size: int, hidden_size: int,
                    num_layers: int = 2, with_init_net: bool = False,
                    dtype=jnp.float32):
    r"""Parameters for one RNN module (reference RNN.__init__, rnn.py:96-119;
    RNNWithInit adds the 3-layer init MLP, rnn.py:195-201)."""
    keys = jax.random.split(key, num_layers + 5)
    params = {
        "linear1": init_linear(keys[0], input_size, hidden_size, dtype),
        "layers": [init_lstm_layer(keys[1 + i], hidden_size, hidden_size, dtype)
                   for i in range(num_layers)],
        "linear2": init_linear(keys[num_layers + 1], hidden_size, output_size,
                               dtype),
    }
    if with_init_net:
        params["init_net"] = [
            init_linear(keys[num_layers + 2], output_size, hidden_size, dtype),
            init_linear(keys[num_layers + 3], hidden_size,
                        hidden_size * num_layers, dtype),
            init_linear(keys[num_layers + 4], hidden_size * num_layers,
                        2 * num_layers * hidden_size, dtype),
        ]
    return params


def init_state(params, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32):
    r"""Zero (h, c) state: each [num_layers, *batch_shape, hidden]."""
    L = len(params["layers"])
    H = _wshape(params["layers"][0]["w_hh"])[1]
    shape = (L,) + tuple(batch_shape) + (H,)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _linear(p, x):
    return x @ _wval(p["w"], x.dtype).T + p["b"].astype(x.dtype)


def lstm_cell(layer, x, h, c, *, int8_compute: bool = False):
    r"""One LSTM cell step, PyTorch gate order (i, f, g, o).

    The input/hidden matmuls are fused into one ``[x | h] @ [W_ih | W_hh]^T``
    contraction; the weight/bias concatenations are loop-invariant, so XLA
    hoists them out of scans — one MXU call per layer per step instead of
    two. int8-quantized weights are dequantized to the activation dtype here
    (per-row scales differ between W_ih and W_hh, so dequant precedes the
    concat).

    ``int8_compute=True`` (requires int8-quantized weights) instead runs the
    two gate matmuls on the int8 MXU path: activations are dynamically
    quantized per row — x and h separately, so the ReLU input's range never
    crushes the tanh-bounded hidden state's resolution — and the int32
    products are rescaled by (activation scale x per-channel weight scale).
    This is the approximate high-throughput serving mode: weights stay int8
    in HBM (4x fewer bytes per scan step than f32) and the MXU runs at its
    int8 rate (~1.6x bf16 measured at these shapes, docs/PERFORMANCE.md).
    """
    if int8_compute and _is_qtensor(layer["w_ih"]):
        b = (layer["b_ih"] + layer["b_hh"]).astype(x.dtype)
        z = (_qmatmul(x, layer["w_ih"], x.dtype)
             + _qmatmul(h, layer["w_hh"], x.dtype) + b)
    else:
        w = jnp.concatenate([_wval(layer["w_ih"], x.dtype),
                             _wval(layer["w_hh"], x.dtype)], axis=1)
        b = (layer["b_ih"] + layer["b_hh"]).astype(x.dtype)
        z = jnp.concatenate([x, h], axis=-1) @ w.T + b
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def rnn_step(params, x, state, *, dropout: float = 0.0,
             rng: Optional[jax.Array] = None, int8_compute: bool = False):
    r"""One frame through linear1 -> ReLU -> LSTM stack -> linear2.

    ``state`` is (h, c), each [L, ..., H]. Inference applies no dropout
    (mirrors forward_online's direct cell use, sig_mp.py:126-129); training
    passes ``dropout``/``rng`` to match the reference's dropout placement
    (after the input linear and between LSTM layers, rnn.py:111-115,130).

    Computation runs in the parameters' dtype (bfloat16 after
    ``cast_params``) and the output is returned in the input's dtype.
    """
    h, c = state
    w_dtype = _compute_dtype(params)
    out_dtype = x.dtype
    if x.dtype != w_dtype:
        x = x.astype(w_dtype)
        h = h.astype(w_dtype)
        c = c.astype(w_dtype)
    y = jax.nn.relu(_linear(params["linear1"], x))
    train = dropout > 0.0 and rng is not None
    if train:
        rngs = jax.random.split(rng, len(params["layers"]))
        keep = 1.0 - dropout
        y = y * jax.random.bernoulli(rngs[0], keep, y.shape) / keep
    new_h, new_c = [], []
    inp = y
    for l, layer in enumerate(params["layers"]):
        hn, cn = lstm_cell(layer, inp, h[l], c[l],
                           int8_compute=int8_compute)
        new_h.append(hn)
        new_c.append(cn)
        inp = hn
        if train and l < len(params["layers"]) - 1:
            inp = inp * jax.random.bernoulli(rngs[l + 1], keep, inp.shape) / keep
    out = _linear(params["linear2"], inp)
    return (out.astype(out_dtype),
            (jnp.stack(new_h).astype(out_dtype),
             jnp.stack(new_c).astype(out_dtype)))


def _same_core_geometry(params_a, params_b) -> bool:
    r"""True when two stacks share linear1/LSTM shapes (so their per-frame
    matmuls can be batched together); linear2 heads may differ."""
    if len(params_a["layers"]) != len(params_b["layers"]):
        return False
    if _wshape(params_a["linear1"]["w"]) != _wshape(params_b["linear1"]["w"]):
        return False
    for la, lb in zip(params_a["layers"], params_b["layers"]):
        if _wshape(la["w_ih"]) != _wshape(lb["w_ih"]):
            return False
    return True


def rnn_group_step(params_seq, x, states, *, int8_compute: bool = False):
    r"""One frame through N same-geometry stacks sharing the SAME input,
    with their linear1 and gate matmuls batched into single MXU calls.

    Motivation: the fused SigMP step contains groups of stacks that consume
    one input vector back to back — rnn7/rnn8 (identical inputs, identical
    [141 -> 512 x 2] geometry, reference sig_mp.py:169-170), and in the
    steady single-eval variant also rnn3 together with the *speculative*
    rnn7/rnn8 evaluation (all three read ``cat(accr, orir, out2)``,
    sig_mp.py:145,169-170 with the occluded-branch ``j3dr = out2``). On TPU
    ops execute serially, so 2N small gate matmuls become two batched ones
    here, shortening the step's serial matmul chain (docs/PERFORMANCE.md:
    the bank is a serial matmul dependency chain at ~50% MXU). The batching
    is a leading stack dimension on weights/state via ``vmap``, so every
    output element remains the same dot product over the same operands —
    results are bit-identical to N ``rnn_step`` calls on CPU and differ only
    by MXU tile scheduling on device. The tiny linear2 heads (different
    output sizes) stay per-stack.

    Falls back to N plain steps when geometries differ (tests use
    heterogeneous small widths). Returns ``(outs, new_states)`` tuples.
    """
    params_seq = tuple(params_seq)
    states = tuple(states)
    if len(params_seq) == 1 or not all(
            _same_core_geometry(params_seq[0], p) for p in params_seq[1:]):
        outs, new_states = [], []
        for p, s in zip(params_seq, states):
            o, ns = rnn_step(p, x, s, int8_compute=int8_compute)
            outs.append(o)
            new_states.append(ns)
        return tuple(outs), tuple(new_states)

    cores = [{"linear1": p["linear1"], "layers": p["layers"]}
             for p in params_seq]
    # jnp.stack of the loop-invariant weight leaves is hoisted out of scans
    # by XLA exactly like lstm_cell's gate concat; qtensor leaves ("q",
    # "scale") stack too and un-map back into valid qtensors under vmap.
    core = jax.tree.map(lambda *ws: jnp.stack(ws), *cores)
    st = jax.tree.map(lambda *ss: jnp.stack(ss), *states)

    w_dtype = _compute_dtype(params_seq[0])
    out_dtype = x.dtype
    if x.dtype != w_dtype:
        x = x.astype(w_dtype)
    st = jax.tree.map(lambda t: t.astype(w_dtype), st)

    def run_core(core_p, s):
        h, c = s
        y = jax.nn.relu(_linear(core_p["linear1"], x))
        new_h, new_c = [], []
        inp = y
        for l, layer in enumerate(core_p["layers"]):
            hn, cn = lstm_cell(layer, inp, h[l], c[l],
                               int8_compute=int8_compute)
            new_h.append(hn)
            new_c.append(cn)
            inp = hn
        return inp, (jnp.stack(new_h), jnp.stack(new_c))

    last, new_st = jax.vmap(run_core, in_axes=(0, 0))(core, st)
    new_st = jax.tree.map(lambda t: t.astype(out_dtype), new_st)
    outs = tuple(
        _linear(p["linear2"], last[i].astype(w_dtype)).astype(out_dtype)
        for i, p in enumerate(params_seq))
    new_states = tuple(jax.tree.map(lambda t: t[i], new_st)
                       for i in range(len(params_seq)))
    return outs, new_states


def rnn_pair_step(params_a, params_b, x, state_a, state_b, *,
                  int8_compute: bool = False):
    r"""Two-stack convenience wrapper over :func:`rnn_group_step` (the
    rnn7/rnn8 head evaluation of the fused SigMP step). Returns
    ``(out_a, out_b, state_a, state_b)``."""
    outs, sts = rnn_group_step((params_a, params_b), x, (state_a, state_b),
                               int8_compute=int8_compute)
    return outs[0], outs[1], sts[0], sts[1]


def rnn_scan(params, xs, state0=None, *, dropout: float = 0.0,
             rng: Optional[jax.Array] = None, int8_compute: bool = False):
    r"""Run a whole sequence: xs [T, ..., in] -> (ys [T, ..., out], state).

    With ``int8_compute`` the in-loop gate weights stay int8 (the point: 4x
    fewer HBM bytes per step + the int8 MXU rate) and the small non-gate
    linears are dequantized once up front; otherwise quantized weights are
    dequantized once, before the scan. ``int8_compute`` is inference-only
    (the activation rounding has no useful gradient) and rejects dropout."""
    if int8_compute and dropout > 0.0 and rng is not None:
        raise ValueError("int8_compute is inference-only; dropout "
                         "training must use the dense path")
    params = prepare_scan_params(params, int8_compute)
    if state0 is None:
        state0 = init_state(params, xs.shape[1:-1], xs.dtype)
    T = xs.shape[0]
    if rng is not None and dropout > 0.0:
        rngs = jax.random.split(rng, T)

        def body(state, inp):
            x, r = inp
            out, state = rnn_step(params, x, state, dropout=dropout, rng=r)
            return state, out

        state, ys = jax.lax.scan(body, state0, (xs, rngs))
    else:
        def body(state, x):
            out, state = rnn_step(params, x, state,
                                  int8_compute=int8_compute)
            return state, out

        state, ys = jax.lax.scan(body, state0, xs)
    return ys, state


def rnn_forward_padded(params, xs, lengths, state0=None, *,
                       dropout: float = 0.0, rng: Optional[jax.Array] = None):
    r"""Padded-batch sequence forward with exact masking.

    xs [T, B, in], lengths [B]. Steps past a sequence's length freeze its
    carry and zero its output, so results equal running each sequence alone —
    the reference gets this from pack_padded_sequence (rnn.py:129-133).
    """
    params = dequantize_params(params)
    if state0 is None:
        state0 = init_state(params, xs.shape[1:-1], xs.dtype)
    T = xs.shape[0]
    t_idx = jnp.arange(T)
    rngs = (jax.random.split(rng, T)
            if (rng is not None and dropout > 0.0) else jnp.zeros((T, 2), jnp.uint32))

    def body(state, inp):
        t, x, r = inp
        valid = (t < lengths)[:, None]                       # [B, 1]
        out, new_state = rnn_step(
            params, x, state,
            dropout=dropout, rng=r if dropout > 0.0 else None)
        h = jnp.where(valid[None], new_state[0], state[0])
        c = jnp.where(valid[None], new_state[1], state[1])
        return (h, c), jnp.where(valid, out, 0.0)

    state, ys = jax.lax.scan(body, state0, (t_idx, xs, rngs))
    return ys, state


def init_net_apply(params, first_label):
    r"""RNNWithInit's (h0, c0) regression from the first label
    (rnn.py:195-218). ``first_label`` [..., out] -> (h, c) each [L, ..., H]."""
    x = first_label
    x = jax.nn.relu(_linear(params["init_net"][0], x))
    x = jax.nn.relu(_linear(params["init_net"][1], x))
    x = _linear(params["init_net"][2], x)
    L = len(params["layers"])
    H = _wshape(params["layers"][0]["w_hh"])[1]
    hc = x.reshape(x.shape[:-1] + (2, L, H))
    # torch layout: view(B, 2, L, H).permute(1, 2, 0, 3) -> (h, c) [L, B, H]
    h = jnp.moveaxis(hc[..., 0, :, :], -2, 0)
    c = jnp.moveaxis(hc[..., 1, :, :], -2, 0)
    return h, c


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------


def rnn_params_from_torch(state_dict, prefix: str = "", dtype=jnp.float32):
    r"""Convert a torch state_dict (numpy values) of one reference RNN module
    into our parameter pytree. Accepts the released checkpoint layout:
    ``{prefix}linear1.weight``, ``{prefix}rnn.weight_ih_l{k}``, ...,
    optionally ``{prefix}init_net.{0,2,4}.weight``."""
    def get(name):
        return jnp.asarray(np.asarray(state_dict[prefix + name]), dtype)

    params = {
        "linear1": {"w": get("linear1.weight"), "b": get("linear1.bias")},
        "linear2": {"w": get("linear2.weight"), "b": get("linear2.bias")},
        "layers": [],
    }
    k = 0
    while (prefix + f"rnn.weight_ih_l{k}") in state_dict:
        params["layers"].append({
            "w_ih": get(f"rnn.weight_ih_l{k}"),
            "w_hh": get(f"rnn.weight_hh_l{k}"),
            "b_ih": get(f"rnn.bias_ih_l{k}"),
            "b_hh": get(f"rnn.bias_hh_l{k}"),
        })
        k += 1
    if (prefix + "init_net.0.weight") in state_dict:
        params["init_net"] = [
            {"w": get(f"init_net.{i}.weight"), "b": get(f"init_net.{i}.bias")}
            for i in (0, 2, 4)
        ]
    return params


# ---------------------------------------------------------------------------
# PureRNN / CycleRNN (reference rnn.py:136-172, 222-279)
# ---------------------------------------------------------------------------
#
# Dead code in the reference's shipped pipeline (no call sites), rebuilt for
# API completeness: PureRNN is a bare torch LSTM with an output projection
# (proj_size), CycleRNN is the autoregressive linear1->LSTM->linear2 stack
# whose input tail is the lerp of the previous prediction with the provided
# (teacher) value. Both keep the torch weight layout so checkpoints convert
# 1:1, and both take/return padded [T, B, .] arrays with a ``lengths`` mask
# (the JAX replacement for the reference's list-of-variable-length-sequences
# convention, like rnn_forward_padded).


def pure_rnn_params_from_torch(state_dict, prefix: str = "",
                               dtype=jnp.float32):
    r"""Convert a torch ``PureRNN`` state_dict (LSTM with ``proj_size``:
    ``rnn.weight_ih_l{k}`` [4H, in], ``rnn.weight_hh_l{k}`` [4H, proj],
    ``rnn.weight_hr_l{k}`` [proj, H])."""
    def get(name):
        return jnp.asarray(np.asarray(state_dict[prefix + name]), dtype)

    layers, k = [], 0
    while (prefix + f"rnn.weight_ih_l{k}") in state_dict:
        layers.append({
            "w_ih": get(f"rnn.weight_ih_l{k}"),
            "w_hh": get(f"rnn.weight_hh_l{k}"),
            "b_ih": get(f"rnn.bias_ih_l{k}"),
            "b_hh": get(f"rnn.bias_hh_l{k}"),
            "w_hr": get(f"rnn.weight_hr_l{k}"),
        })
        k += 1
    return {"layers": layers}


def _proj_lstm_cell(layer, x, h, c):
    r"""torch proj-LSTM cell: standard gates, then h = (o*tanh(c)) @ w_hr^T
    (h carries the projected size, c the full hidden size)."""
    z = (x @ layer["w_ih"].T + h @ layer["w_hh"].T
         + layer["b_ih"] + layer["b_hh"])
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = (jax.nn.sigmoid(o) * jnp.tanh(c_new)) @ layer["w_hr"].T
    return h_new, c_new


def pure_rnn_forward_padded(params, xs, lengths):
    r"""PureRNN.forward (rnn.py:161-172): xs [T, B, in] -> ys [T, B, proj],
    zero-padded past each sequence's length, masked exactly like
    ``rnn_forward_padded`` (pack_padded semantics)."""
    params = dequantize_params(params)
    B = xs.shape[1]
    layers = params["layers"]
    H = layers[0]["w_hh"].shape[0] // 4
    P = layers[0]["w_hr"].shape[0]
    h0 = jnp.zeros((len(layers), B, P), xs.dtype)
    c0 = jnp.zeros((len(layers), B, H), xs.dtype)

    def body(state, inp):
        h, c, t = state
        x = inp
        active = (t < lengths)[:, None]
        new_h, new_c, cur = [], [], x
        for l, layer in enumerate(layers):
            hn, cn = _proj_lstm_cell(layer, cur, h[l], c[l])
            new_h.append(jnp.where(active, hn, h[l]))
            new_c.append(jnp.where(active, cn, c[l]))
            cur = new_h[-1]
        out = jnp.where(active, cur, 0.0)
        return (jnp.stack(new_h), jnp.stack(new_c), t + 1), out

    (_, _, _), ys = jax.lax.scan(body, (h0, c0, jnp.asarray(0)), xs)
    return ys


def cycle_rnn_params_from_torch(state_dict, prefix: str = "",
                                dtype=jnp.float32):
    r"""CycleRNN shares the linear1/rnn/linear2 layout of ``RNN``."""
    return rnn_params_from_torch(state_dict, prefix, dtype)


def cycle_rnn_forward_padded(params, xs, lengths, pred_weight: float = 1.0):
    r"""CycleRNN.forward (rnn.py:259-279): autoregressive — each step's input
    tail (the last ``output_size`` dims) is replaced by
    ``lerp(prev_prediction, provided_tail, 1 - pred_weight)``; the first
    step's "previous prediction" is frame 0's provided tail. Predictions are
    stop_gradient'ed like the reference's ``.detach()``. xs [T, B, in] ->
    ys [T, B, out], zero-padded past ``lengths``."""
    params = dequantize_params(params)
    out_size = params["linear2"]["w"].shape[0]
    B = xs.shape[1]
    h0, c0 = init_state(params, (B,), xs.dtype)
    prev0 = xs[0, :, -out_size:]

    def body(state, x):
        h, c, prev, t = state
        active = (t < lengths)[:, None]
        tail = (jax.lax.stop_gradient(prev) * pred_weight
                + jax.lax.stop_gradient(x[:, -out_size:])
                * (1.0 - pred_weight))
        xi = jnp.concatenate([x[:, :-out_size], tail], axis=-1)
        out, (h_new, c_new) = rnn_step(params, xi, (h, c))
        h_new = jnp.where(active[None], h_new, h)
        c_new = jnp.where(active[None], c_new, c)
        prev_new = jnp.where(active, out, prev)
        return (h_new, c_new, prev_new, t + 1), jnp.where(active, out, 0.0)

    (_, _, _, _), ys = jax.lax.scan(body, (h0, c0, prev0, jnp.asarray(0)),
                                    xs)
    return ys
