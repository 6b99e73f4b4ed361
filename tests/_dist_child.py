r"""Child process for the two-process jax.distributed CPU test.

Launched by tests/test_distributed.py::TestTwoProcess with
``python _dist_child.py <coordinator> <num_procs> <proc_id>``. Exercises the
REAL multi-process path of ``robustcap_tpu.parallel.distributed`` — actual
``jax.distributed.initialize`` over a localhost coordinator, gloo CPU
collectives, global-array assembly from process-local rows, and a jitted
cross-process reduction + DP train step — and prints one JSON line the
parent asserts on.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=2"
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beat the sitecustomize TPU pin
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from robustcap_tpu.parallel.distributed import (
        dataset_shard_indices, global_batch_from_local, initialize_distributed,
        make_global_mesh, process_local_batch)

    ctx = initialize_distributed(coordinator_address=coordinator,
                                 num_processes=num_procs, process_id=proc_id)
    mesh = make_global_mesh()

    # deterministic global batch; every process knows the full array but
    # feeds only ITS rows into the global jax.Array
    global_b = 8
    rng = np.random.RandomState(0)
    full = rng.randn(global_b, 16).astype(np.float32)
    sl = process_local_batch(global_b)
    garr = global_batch_from_local({"x": full[sl]}, mesh)["x"]

    # jitted cross-process reduction (the all-reduce rides the gloo
    # collectives between the two processes)
    total = float(jax.jit(lambda x: jnp.sum(x * x))(garr))

    # one DP train step on the global mesh — the unchanged single-host step
    import optax

    from robustcap_tpu.nn.rnn import init_rnn_params
    from robustcap_tpu.parallel.mesh import make_dp_train_step
    from robustcap_tpu.train.losses import masked_mse
    from robustcap_tpu.train.trainers import make_forward_fn

    params = init_rnn_params(jax.random.PRNGKey(0), 6, 4, 8, 2, False)
    tx = optax.adam(1e-3)
    step = make_dp_train_step(make_forward_fn(0.0), masked_mse, tx, mesh)
    T = 5
    xs_full = rng.randn(T, global_b, 6).astype(np.float32)
    ys_full = rng.randn(T, global_b, 4).astype(np.float32)
    local = global_batch_from_local(
        {"xs": xs_full[:, sl], "ys": ys_full[:, sl]}, mesh, axis=1)
    lengths = jnp.full((global_b,), T, jnp.int32)
    new_params, _, loss = step(params, tx.init(params), local["xs"],
                               local["ys"], lengths, None, None, 1.0)
    leaf0 = float(jax.tree.leaves(new_params)[0].reshape(-1)[0])

    shard_idx = dataset_shard_indices(10).tolist()
    print(json.dumps({
        "proc": ctx.process_index,
        "procs": ctx.process_count,
        "global_devices": ctx.global_device_count,
        "local_devices": ctx.local_device_count,
        "enabled": ctx.enabled,
        "sum_sq": total,
        "loss": float(loss),
        "param_leaf0": leaf0,
        "shard_idx": shard_idx,
    }))


if __name__ == "__main__":
    main()
