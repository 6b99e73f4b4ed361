r"""Weight-stationary Pallas LSTM scan kernel vs the XLA reference scan.

Runs in Pallas interpret mode on CPU; the compiled TPU path is exercised by
bench/tooling (see docs/PERFORMANCE.md for measurements and caveats).
"""

import numpy as np
import jax
import jax.numpy as jnp

from robustcap_tpu.nn.rnn import init_rnn_params, init_state, rnn_scan
from robustcap_tpu.ops.pallas_lstm import (lstm_stack_vmem_bytes,
                                           rnn_scan_pallas)


class TestPallasLSTM:
    def test_matches_xla_scan(self):
        params = init_rnn_params(jax.random.PRNGKey(0), 72, 69, 64, 2)
        xs = jnp.asarray(np.random.RandomState(0).randn(12, 72), jnp.float32)
        ys_ref, (h_ref, c_ref) = rnn_scan(params, xs)
        ys, (h, c) = rnn_scan_pallas(params, xs, interpret=True)
        np.testing.assert_allclose(ys, ys_ref, atol=2e-5)
        np.testing.assert_allclose(h[:2], h_ref, atol=2e-5)
        np.testing.assert_allclose(c[:2], c_ref, atol=2e-5)

    def test_chunk_chaining(self):
        params = init_rnn_params(jax.random.PRNGKey(1), 24, 8, 32, 2)
        xs = jnp.asarray(np.random.RandomState(1).randn(10, 24), jnp.float32)
        ys_full, _ = rnn_scan_pallas(params, xs, interpret=True)
        y1, st = rnn_scan_pallas(params, xs[:4], interpret=True)
        y2, _ = rnn_scan_pallas(params, xs[4:], state=(st[0][:2], st[1][:2]),
                                interpret=True)
        np.testing.assert_allclose(jnp.concatenate([y1, y2]), ys_full,
                                   atol=2e-5)

    def test_vmem_budget(self):
        # 512-wide stacks stay in the ~tens-of-MB VMEM class (kernel-eligible
        # on v5e); the 1280-wide stack is ~6x larger and stays on XLA
        small = init_rnn_params(jax.random.PRNGKey(2), 141, 3, 512, 2)
        big = init_rnn_params(jax.random.PRNGKey(3), 171, 69, 1280, 2)
        assert lstm_stack_vmem_bytes(small) < 20 * 2 ** 20
        assert lstm_stack_vmem_bytes(big) > 80 * 2 ** 20
