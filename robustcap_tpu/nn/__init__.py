r"""Neural-network primitives (LSTM stacks, torch-compatible layouts)."""

from .rnn import (  # noqa: F401
    init_linear, init_lstm_layer, init_rnn_params, init_state, lstm_cell,
    rnn_step, rnn_scan, rnn_forward_padded, init_net_apply,
    rnn_params_from_torch, cast_params, quantize_params, quantize_tensor,
    dequantize_tensor, dequantize_params, is_quantized)

__all__ = [
    "init_linear", "init_lstm_layer", "init_rnn_params", "init_state",
    "lstm_cell", "rnn_step", "rnn_scan", "rnn_forward_padded",
    "init_net_apply", "rnn_params_from_torch", "cast_params",
    "quantize_params", "quantize_tensor", "dequantize_tensor",
    "dequantize_params", "is_quantized",
]
