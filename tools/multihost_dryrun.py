"""Multi-host (DCN) dry run: 2-process pjit on the CPU platform.

SURVEY.md §5.8: the framework's multi-host path is
``parallel.mesh.initialize_distributed`` -> global ``jax.devices()`` ->
the same mesh/sharding code spanning hosts. No pod is reachable from this
environment, so this tool exercises the code path with JAX's
single-node multi-process support: it spawns N worker processes, each
``jax.distributed.initialize``-d against a local coordinator on the CPU
platform with ``--xla_force_host_platform_device_count`` local devices,
builds the global (data, model) mesh, runs one jitted data-parallel
step whose gradient reduction crosses the process boundary (psum over
'data' spans both processes), and checks every process computes the
same replicated result as a single-process run of identical math.

Usage:  python tools/multihost_dryrun.py [--processes 2] [--local-devices 4]
Exit 0 = the multi-host code path compiles, runs, and agrees.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")  # axon overrides JAX_PLATFORMS

sys.path.insert(0, {repo!r})
from neuralbarkcalculator_tpu.parallel.mesh import (
    ShardingRules, initialize_distributed, make_mesh)

initialize_distributed(coordinator_address=f"localhost:{{port}}",
                       num_processes=n_procs, process_id=proc_id)
assert jax.process_count() == n_procs, jax.process_count()
n_global = jax.device_count()
n_local = len(jax.local_devices())
assert n_global == n_local * n_procs, (n_global, n_local)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(n_data=n_global, n_model=1)  # data axis spans processes
rules = ShardingRules(mesh)

# one data-parallel "training-shaped" step: per-shard compute + global
# mean over the data axis (the psum crosses the process boundary)
w = jnp.linspace(0.5, 1.5, 64, dtype=jnp.float32)  # replicated "params"
xs_host = np.arange(n_global * 64, dtype=np.float32).reshape(n_global, 64)
xs = jax.make_array_from_process_local_data(rules.batch, xs_host)


def step(w, xs):
    per = jnp.sum((xs * w) ** 2, axis=1)          # [B] sharded
    return jnp.mean(per)                          # global all-reduce


out = jax.jit(step, in_shardings=(rules.replicated, rules.batch),
              out_shardings=rules.replicated)(w, xs)
got = float(out)
want = float(np.mean(np.sum((xs_host * np.asarray(w)) ** 2, axis=1)))
rel = abs(got - want) / abs(want)
assert rel < 1e-6, (got, want)
print(f"process {{proc_id}}: global={{n_global}} local={{n_local}} "
      f"result={{got:.6g}} (single-process math agrees, rel={{rel:.2e}})",
      flush=True)
"""


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--local-devices", type=int, default=4)
    parser.add_argument("--port", type=int, default=29521)
    parser.add_argument("--timeout", type=float, default=300.0)
    args = parser.parse_args()

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{args.local_devices}").strip()
    script = WORKER.format(repo=REPO)
    procs = [subprocess.Popen(
        [sys.executable, "-u", "-c", script, str(i), str(args.processes),
         str(args.port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(args.processes)]
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        sys.stdout.write(out)
        if p.returncode != 0:
            ok = False
    if not ok:
        print("MULTIHOST DRYRUN FAILED")
        sys.exit(1)
    print(f"MULTIHOST DRYRUN OK: {args.processes} processes x "
          f"{args.local_devices} devices, DCN-path collectives verified")


if __name__ == "__main__":
    main()
