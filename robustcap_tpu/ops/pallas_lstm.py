r"""Weight-stationary LSTM-stack scan as a Pallas TPU kernel.

XLA's ``lax.scan`` over an LSTM re-reads every weight matrix from HBM each
time step; at batch 1 (the live streaming path) that is the entire cost.
This kernel keeps a whole 2-layer stack's parameters in VMEM and loops the
time dimension *inside* the kernel, so the weights are loaded once per
sequence chunk instead of once per frame.

Fits the 512-wide stacks (rnn2/3/7/8: ~13.5 MB f32 per stack, VMEM is
~16 MB/core); the 1024/1280-wide stacks stay on the XLA path. Used as an
opt-in fast path (``rnn_scan_pallas``) — bit-compatible with
``nn.rnn.rnn_scan`` for batch-1 inputs (verified in tests, interpret mode on
CPU).

Layout notes (see the Pallas TPU guide): matvecs are issued as [8, K] x
[K, N] dots (the sublane minimum); gates are computed in f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rnn_scan_pallas", "rnn_scan_pallas_chunked",
           "lstm_stack_vmem_bytes"]


def lstm_stack_vmem_bytes(params) -> int:
    r"""Bytes of VMEM the stack's parameters need inside the kernel."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def _kernel(xs_ref, h0_ref, c0_ref, w1_ref, b1_ref, wf1_ref, bf1_ref,
            wf2_ref, bf2_ref, w2_ref, b2_ref, out_ref, hN_ref, cN_ref,
            h_scr, c_scr, *, T, H, in_size, out_size):
    r"""One sequence chunk: linear1 -> relu -> 2 fused-gate LSTM layers ->
    linear2, looping frames with (h, c) in VMEM scratch.

    wf{1,2} are the fused ``[W_ih | W_hh]^T`` matrices [(in+H), 4H];
    biases are the summed b_ih+b_hh. (h0, c0) seed the state; the final
    state is written to (hN, cN) so chunks chain.
    """
    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:]

    def body(t, _):
        x = xs_ref[pl.ds(t * 8, 8), :]                       # [8, in]
        y = jnp.maximum(
            jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[:], 0.0)                                 # [8, H]

        def layer(y, wf_ref, bf_ref, slot):
            h = h_scr[pl.ds(slot * 8, 8), :]
            c = c_scr[pl.ds(slot * 8, 8), :]
            xh = jnp.concatenate([y, h], axis=1)              # [8, in+H]
            z = jnp.dot(xh, wf_ref[:],
                        preferred_element_type=jnp.float32) + bf_ref[:]
            i = jax.nn.sigmoid(z[:, :H])
            f = jax.nn.sigmoid(z[:, H:2 * H])
            g = jnp.tanh(z[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            h_scr[pl.ds(slot * 8, 8), :] = h_new
            c_scr[pl.ds(slot * 8, 8), :] = c_new
            return h_new

        y = layer(y, wf1_ref, bf1_ref, 0)
        y = layer(y, wf2_ref, bf2_ref, 1)
        out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32) \
            + b2_ref[:]
        out_ref[pl.ds(t * 8, 8), :] = out
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    hN_ref[:] = h_scr[:]
    cN_ref[:] = c_scr[:]


def _prep(params):
    r"""Repack torch-layout params into kernel operands (transposed, fused)."""
    l1, l2 = params["layers"]
    w1 = params["linear1"]["w"].T                              # [in, H]
    b1 = params["linear1"]["b"][None]
    wf1 = jnp.concatenate([l1["w_ih"], l1["w_hh"]], axis=1).T  # [in+H, 4H]
    bf1 = (l1["b_ih"] + l1["b_hh"])[None]
    wf2 = jnp.concatenate([l2["w_ih"], l2["w_hh"]], axis=1).T
    bf2 = (l2["b_ih"] + l2["b_hh"])[None]
    w2 = params["linear2"]["w"].T                              # [H, out]
    b2 = params["linear2"]["b"][None]
    return w1, b1, wf1, bf1, wf2, bf2, w2, b2


def rnn_scan_pallas_chunked(params, xs, state=None, max_chunk: int = 256,
                            interpret=None):
    r"""``rnn_scan_pallas`` chained over time chunks.

    VMEM must hold the stack's weights (~13.5 MB f32 for the 512-wide
    stacks) PLUS one chunk's activations (8 sublane-replicated rows per
    frame); chunking the time axis keeps the activation footprint to
    ``max_chunk * 8 * in_size`` floats while weights are re-read from HBM
    only once per chunk — the whole point of the weight-stationary kernel
    (one weight read per ``max_chunk`` frames instead of per frame).

    Accepts bf16/int8-quantized params (dequantized + cast to f32: the
    kernel computes in f32 like ``rnn_scan``'s highest-precision path).
    ``interpret=None`` auto-selects interpret mode off-TPU so the same
    caller code is CI-testable on CPU.
    """
    from ..nn.rnn import dequantize_params

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    params = dequantize_params(params)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    T = xs.shape[0]
    outs = []
    for s in range(0, T, max_chunk):
        ys, state = rnn_scan_pallas(params, xs[s:s + max_chunk], state,
                                    interpret=interpret)
        outs.append(ys)
    return jnp.concatenate(outs), state


def rnn_scan_pallas(params, xs, state=None, interpret: bool = False):
    r"""Run a whole unbatched sequence through the stack: xs [T, in] ->
    (ys [T, out], (h, c) each [L, H]). ``state`` seeds (h, c) for chunk
    chaining (zeros for a fresh sequence). The frame is carried in an 8-row
    slot (TPU sublane minimum); row 0 is the live lane and the other 7 rows
    are replicas that keep tile shapes legal.
    """
    if len(params["layers"]) != 2:
        raise ValueError("kernel supports 2-layer stacks")
    T, in_size = xs.shape
    H = params["layers"][0]["w_hh"].shape[1]
    out_size = params["linear2"]["w"].shape[0]

    # replicate each frame into an 8-row slot (sublane-aligned)
    xs8 = jnp.repeat(xs.astype(jnp.float32), 8, axis=0)        # [8T, in]
    if state is None:
        h0 = jnp.zeros((16, H), jnp.float32)
        c0 = jnp.zeros((16, H), jnp.float32)
    else:
        h0 = jnp.repeat(state[0].astype(jnp.float32), 8, axis=0)
        c0 = jnp.repeat(state[1].astype(jnp.float32), 8, axis=0)
    ops = _prep(params)

    # Mosaic's default scoped-VMEM limit is 16 MiB; a 512-wide stack's f32
    # weights alone are ~17 MiB (wf1+wf2 = 2 x 8.4 MiB), so the real chip
    # rejects the kernel at the default (observed: "scoped allocation
    # 16.53M ... limit 16.00M" on v5e). Size the limit from the actual
    # operand footprint plus headroom — v5e has 128 MiB VMEM, and this
    # kernel is the only thing resident while it runs.
    operand_f32s = (xs8.size + h0.size + c0.size + 8 * T * out_size
                    + 4 * 16 * H + sum(int(np.prod(o.shape)) for o in ops))
    vmem_limit = max(16 * 2 ** 20, int(operand_f32s * 4 * 1.25))

    out, hN, cN = pl.pallas_call(
        partial(_kernel, T=T, H=H, in_size=in_size, out_size=out_size),
        out_shape=(
            jax.ShapeDtypeStruct((8 * T, out_size), jnp.float32),
            jax.ShapeDtypeStruct((16, H), jnp.float32),
            jax.ShapeDtypeStruct((16, H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((16, H), jnp.float32),   # h for 2 layers x 8 rows
            pltpu.VMEM((16, H), jnp.float32),   # c
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(xs8, h0, c0, *ops)
    return out[::8], (hN[::8], cN[::8])
