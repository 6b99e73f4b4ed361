r"""Neural-network primitives (LSTM stacks, torch-compatible layouts)."""

from .rnn import (  # noqa: F401
    init_linear, init_lstm_layer, init_rnn_params, init_state, lstm_cell,
    rnn_step, rnn_pair_step, rnn_group_step, rnn_scan, rnn_forward_padded,
    init_net_apply,
    rnn_params_from_torch, cast_params, quantize_params, quantize_tensor,
    dequantize_tensor, dequantize_params, dequantize_non_gate_params,
    is_quantized, quantize_activation,
    pure_rnn_params_from_torch, pure_rnn_forward_padded,
    cycle_rnn_params_from_torch, cycle_rnn_forward_padded)

__all__ = [
    "init_linear", "init_lstm_layer", "init_rnn_params", "init_state",
    "lstm_cell", "rnn_step", "rnn_pair_step", "rnn_group_step", "rnn_scan",
    "rnn_forward_padded",
    "init_net_apply", "rnn_params_from_torch", "cast_params",
    "quantize_params", "quantize_tensor", "dequantize_tensor",
    "dequantize_params", "dequantize_non_gate_params", "is_quantized",
    "quantize_activation",
    "pure_rnn_params_from_torch", "pure_rnn_forward_padded",
    "cycle_rnn_params_from_torch", "cycle_rnn_forward_padded",
]
