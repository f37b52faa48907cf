"""Two-process localhost dryrun of the multi-process execution path.

Parity: the reference launches real multi-node training through Lightning
Fabric (`vod_exps/init.py:40-85`, `hydra/fabric/strategy/{ddp,fsdp}.yaml`).
This validates the TPU-native equivalent without a pod: N local processes join
a jax.distributed coordination service over localhost, each contributes
`--local_devices` virtual CPU devices, the mesh spans all processes, and one
dp-sharded train step runs with per-process data feeding + a multihost orbax
checkpoint.

Usage:
  python examples/multiprocess_dryrun.py --launch 2         # forks 2 workers
  python examples/multiprocess_dryrun.py --processes 2 --process_id 0 \
      --coordinator localhost:9876                          # one worker
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys
import tempfile


def worker(args: argparse.Namespace) -> None:
    # env BEFORE jax import: virtual CPU devices + gloo cross-process collectives
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from vod_tpu.parallel import (
        barrier,
        global_batch_from_local,
        init_distributed,
        is_main_process,
        make_mesh,
        process_slice,
    )

    pi, pc = init_distributed(args.coordinator, args.processes, args.process_id)
    n_global = len(jax.devices())
    assert pc == args.processes, (pc, args.processes)
    assert n_global == args.processes * args.local_devices, n_global
    print(f"[p{pi}] joined: {pc} processes, {n_global} global devices", flush=True)

    mesh = make_mesh((n_global,), ("dp",))

    # --- per-process data feeding (each process owns a contiguous slice) -----
    n_rows, dim = 64, 16
    rng = np.random.default_rng(0)  # same seed: full dataset known everywhere
    full_x = rng.standard_normal((n_rows, dim)).astype(np.float32)
    full_y = rng.standard_normal((n_rows, 1)).astype(np.float32)
    sl = process_slice(n_rows)
    gx = global_batch_from_local(full_x[sl], mesh, P("dp"))
    gy = global_batch_from_local(full_y[sl], mesh, P("dp"))

    # --- one dp-sharded train step (grads psum'd across hosts by XLA) --------
    params = {"w": jnp.zeros((dim, 1)), "b": jnp.zeros((1,))}
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = x @ p["w"] + p["b"]
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, gx, gy)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    print(f"[p{pi}] loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)

    # numpy reference: the dp-sharded multi-host step must equal plain SGD on
    # the full batch (grad psum across hosts == global-batch mean gradient)
    w = np.zeros((dim, 1), np.float32)
    bb = np.zeros((1,), np.float32)
    for _ in range(5):
        err = full_x @ w + bb - full_y
        w = w - 0.1 * (2.0 / n_rows) * (full_x.T @ err)
        bb = bb - 0.1 * (2.0 / n_rows) * err.sum(axis=0)
    got_w = np.asarray(jax.device_get(params["w"]))
    assert np.allclose(got_w, w, atol=1e-4), "multi-host != single-process SGD"

    # --- multihost orbax checkpoint (every process participates) ------------
    ckpt_dir = pathlib.Path(args.ckpt_dir or tempfile.gettempdir()) / "mp_dryrun_ckpt"
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir.absolute(), params, force=True)
    barrier("after-ckpt")
    # restore is COLLECTIVE too (orbax syncs all processes internally) — a
    # rank-0-only restore deadlocks the coordination service
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt_dir.absolute())
    assert np.allclose(np.asarray(restored["w"]), got_w, atol=1e-6)
    if is_main_process():
        print("MULTIPROCESS-DRYRUN-OK", flush=True)
    # all processes must reach shutdown together (a process exiting while
    # rank 0 still restores trips the coordination-service shutdown barrier)
    barrier("before-exit")
    jax.distributed.shutdown()


def launch(n: int) -> int:
    """Fork n workers against a fresh localhost coordinator port."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    ckpt_dir = tempfile.mkdtemp(prefix="mp_dryrun_")
    procs = []
    for i in range(n):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, __file__,
                    "--processes", str(n), "--process_id", str(i),
                    "--coordinator", f"localhost:{port}",
                    "--ckpt_dir", ckpt_dir,
                ],
                stdout=None if i == 0 else subprocess.DEVNULL,
                stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL,
            )
        )
    codes = [p.wait(timeout=600) for p in procs]
    return max(codes)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", type=int, default=None, help="fork N workers and wait")
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--ckpt_dir", type=str, default=None)
    args = ap.parse_args()
    if args.launch:
        sys.exit(launch(args.launch))
    worker(args)


if __name__ == "__main__":
    main()
