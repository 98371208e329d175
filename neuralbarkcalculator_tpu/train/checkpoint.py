"""Checkpointing: orbax per-epoch saves + best-checkpoint tracking.

Replaces the Poutyne Experiment checkpoint machinery the reference
delegates to (__main__.py:235-242, SURVEY.md §5.4): per-epoch checkpoints,
monitor-metric tracking (val_miou, mode max), ``load_checkpoint(n)`` /
best restore, plus a ``best_model`` export loadable by the predict engine.
"""
from __future__ import annotations

import json
import math
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class ExperimentCheckpoints:
    """Per-epoch orbax checkpoints under ``directory`` with monitor-metric
    bookkeeping (Poutyne Experiment parity)."""

    def __init__(self, directory: str, monitor: str = "val_miou",
                 mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._ckpt = ocp.PyTreeCheckpointer()
        self._log_path = os.path.join(self.directory, "experiment_log.json")
        self.log: dict[str, Any] = {"epochs": [], "best_epoch": None}
        if os.path.isfile(self._log_path):
            with open(self._log_path) as f:
                self.log = json.load(f)

    # ----------------------------------------------------------- epochs

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"checkpoint_epoch_{epoch}")

    def save_epoch(self, epoch: int, state_tree, metrics: dict) -> bool:
        """Save a checkpoint; update best bookkeeping. Returns is_best."""
        self._ckpt.save(self._epoch_dir(epoch), _to_host(state_tree),
                        force=True)
        entry = {**{k: float(v) for k, v in metrics.items()},
                 "epoch": int(epoch)}  # epoch stays int (it names dirs)
        self.log["epochs"].append(entry)
        is_best = self._is_best(entry)
        if is_best:
            self.log["best_epoch"] = epoch
        with open(self._log_path, "w") as f:
            json.dump(self.log, f, indent=1)
        return is_best

    def _is_best(self, entry: dict) -> bool:
        value = entry.get(self.monitor)
        if value is None:
            return False
        best = self.log.get("best_epoch")
        if best is None:
            return True
        best_value = next((e[self.monitor] for e in self.log["epochs"]
                           if e["epoch"] == best and self.monitor in e),
                          -math.inf if self.mode == "max" else math.inf)
        return value > best_value if self.mode == "max" \
            else value < best_value

    def load_checkpoint(self, epoch: int, template=None):
        """Poutyne exp.load_checkpoint(n) parity (__main__.py:298)."""
        return self._ckpt.restore(self._epoch_dir(epoch), item=template)

    def load_best(self, template=None):
        best = self.log.get("best_epoch")
        if best is None:
            raise FileNotFoundError("no best checkpoint recorded yet")
        return self.load_checkpoint(best, template)

    @property
    def best_epoch(self) -> int | None:
        return self.log.get("best_epoch")

    @property
    def last_epoch(self) -> int:
        return max((e["epoch"] for e in self.log["epochs"]), default=0)

    # ------------------------------------------------------ best export

    def export_best_model(self, variables) -> str:
        """Write ``best_model`` (orbax dir of {params, batch_stats}) —
        the artifact predict loads (reference ./best_model.pt role)."""
        path = os.path.join(self.directory, "best_model")
        self._ckpt.save(path, _to_host(variables), force=True)
        return path


def save_variables(directory: str, variables) -> str:
    ocp.PyTreeCheckpointer().save(os.path.abspath(directory),
                                  _to_host(variables), force=True)
    return directory


def restore_variables(directory: str, template=None):
    """Load a {params, batch_stats} tree saved by export/save above."""
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(directory),
                                            item=template)
