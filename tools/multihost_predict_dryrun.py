"""Multi-host folder-INFERENCE dry run: 2 jax.distributed processes.

SURVEY.md §2.4's remaining parallelism box (VERDICT r3 item 5): shard a
folder prediction across processes and merge per-shard CSVs. This tool
spawns N worker processes on the CPU platform, each
``jax.distributed.initialize``-d against a local coordinator
(parallel.mesh.initialize_distributed — the same Gloo/DCN code path a
real multi-host job uses for process identity), runs
``pipeline.multihost.predict_folder_multihost`` (process ids from
``jax.process_index()``; engine over LOCAL devices — folder inference
is per-image independent, so no collectives cross hosts), and checks
the merged final_stats.csv is byte-identical to a single-process run
over the same folder with the same weights.

Usage: python tools/multihost_predict_dryrun.py [--processes 2]
Exit 0 = sharded run merged byte-identical to single-process.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
root = sys.argv[4]
ckpt = sys.argv[5]

import jax
jax.config.update("jax_platforms", "cpu")  # axon overrides JAX_PLATFORMS

sys.path.insert(0, {repo!r})
from neuralbarkcalculator_tpu.parallel.mesh import initialize_distributed
from neuralbarkcalculator_tpu.pipeline.multihost import \
    predict_folder_multihost
from neuralbarkcalculator_tpu.config import PredictConfig

initialize_distributed(coordinator_address=f"localhost:{{port}}",
                       num_processes=n_procs, process_id=proc_id)
assert jax.process_count() == n_procs
assert jax.process_index() == proc_id

config = PredictConfig(model_path=ckpt, batch_size=1, figure_dpi=30)
out = predict_folder_multihost(ckpt, root, config=config,
                               progress=False, merge_timeout=240.0)
print(f"process {{proc_id}}: wrote {{out}}", flush=True)
"""


def build_folder_and_ckpt(root: str) -> str:
    import flax.serialization
    import numpy as np
    from PIL import Image

    # imports deferred so the parent never initializes the TPU plugin
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    d = os.path.join(root, "processed", "samples", "sapin")
    os.makedirs(d)
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(root, "results", sub, "sapin"))
    rng = np.random.default_rng(3)
    for i, h in enumerate((90, 100, 110, 96, 120)):
        img = (rng.random((h, 64, 3)) * 160 + 60).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"img{i}.png"))

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ckpt = os.path.join(root, "model.msgpack")
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    return ckpt


def single_process_csv(root: str, ckpt: str) -> bytes:
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.pipeline.predict import \
        NeuralBarkCalculator

    config = PredictConfig(model_path=ckpt, batch_size=1, figure_dpi=30)
    calc = NeuralBarkCalculator(ckpt, config=config)
    out = calc.predict(root, progress=False)
    with open(out, "rb") as f:
        return f.read()


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--port", type=int, default=29531)
    parser.add_argument("--timeout", type=float, default=600.0)
    args = parser.parse_args()

    root = tempfile.mkdtemp(prefix="mh_predict_")
    ckpt = build_folder_and_ckpt(root)
    want = single_process_csv(root, ckpt)
    # wipe results so the sharded run starts clean
    import shutil
    shutil.rmtree(os.path.join(root, "results"))
    for sub in ("combined_images", "outputs"):
        os.makedirs(os.path.join(root, "results", sub, "sapin"))

    env = dict(os.environ)
    script = WORKER.format(repo=REPO)
    procs = [subprocess.Popen(
        [sys.executable, "-u", "-c", script, str(i), str(args.processes),
         str(args.port), root, ckpt], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(args.processes)]
    ok = True
    for p in procs:
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
        print("MULTIHOST PREDICT DRYRUN FAILED (worker error)")
        sys.exit(1)

    with open(os.path.join(root, "results", "final_stats.csv"),
              "rb") as f:
        got = f.read()
    if got != want:
        print("MULTIHOST PREDICT DRYRUN FAILED (CSV differs from "
              "single-process)")
        sys.exit(1)
    print(f"MULTIHOST PREDICT DRYRUN OK: {args.processes}-way sharded "
          f"folder predict merged byte-identical to single-process")


if __name__ == "__main__":
    main()
