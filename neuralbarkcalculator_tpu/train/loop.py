"""The training experiment: Poutyne-Experiment-equivalent harness.

Reproduces the reference training recipe (__main__.py:199-311) TPU-first:

- dataset mean/std + class pos-weights computed once (utils.py:23-69),
- stratified 80/10/10 splits + exp-weighted sampling (utils.py:76-132),
- the whole (pad_resized-to-1024, uint8) training set resident in device
  HBM; each step ships only sampled indices (train/step.py),
- fcn_resnet50(dropout=0.8), torch-parity Adam(5e-4, wd 2e-3),
  Lovász-Softmax, metrics miou + pixel-F1, ReduceLROnPlateau(0.2/3/abs
  1e-1), EarlyStopping(1e-1/8), monitor val_miou max (__main__.py:231-269),
- per-epoch orbax checkpoints with best-model tracking + export
  (train/checkpoint.py), epoch logs in Poutyne's spirit.

The README-described alternative recipe (weighted CE + best pixel-F1
selection; reference README.md:66 diverges from the code) is one config
away: loss_name='cwe', monitor='val_f1'.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.augment import pad_resize_pair
from ..data.dataset import BarkDataset
from ..data.sampling import get_splits, weighted_batch_iterator
from ..models.segmentation import MODEL_FACTORIES
from ..parallel.mesh import ShardingRules, make_mesh
from .checkpoint import ExperimentCheckpoints
from .optim import (EarlyStopping, ReduceLROnPlateau, adam,
                    get_learning_rate, set_learning_rate)
from .step import TrainState, make_eval_step, make_train_step


def compute_mean_std(images_u8: np.ndarray) -> tuple[list, list]:
    """Reference compute_mean_std parity (utils.py:23-39): per-image
    channel mean/std (population std over pixels, torch .std -> ddof=1),
    averaged over images."""
    means, stds = [], []
    for img in images_u8:
        flat = img.reshape(-1, 3).astype(np.float64) / 255.0
        means.append(flat.mean(0))
        stds.append(flat.std(0, ddof=1))
    return (np.mean(means, axis=0).tolist(), np.mean(stds, axis=0).tolist())


def compute_pos_weight(labels: Sequence[np.ndarray]) -> list:
    """Reference compute_pos_weight parity (utils.py:51-69): inverse class
    frequency, total / (3 * count_c)."""
    counts = np.zeros(3, np.int64)
    for lab in labels:
        counts += np.bincount(np.asarray(lab).reshape(-1), minlength=3)
    total = counts.sum()
    return (total / (3.0 * counts)).tolist()


@dataclasses.dataclass
class EpochLog:
    epoch: int
    lr: float
    time_s: float
    loss: float
    miou: float
    f1: float
    val_loss: float
    val_miou: float
    val_f1: float

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class Experiment:
    """Training harness over a reference-layout dataset directory
    (root/samples/<wood_type>/*.png|bmp + root/duals/...)."""

    def __init__(self, data_root: str, directory: str,
                 config: TrainConfig | None = None, mesh=None,
                 model_name: str = "fcn_resnet50",
                 loss_name: str = "lovasz",
                 monitor: str | None = None,
                 sampler: str = "weighted"):
        self.config = config or TrainConfig()
        self.rules = ShardingRules(mesh if mesh is not None else make_mesh())
        self.model_name = model_name
        self.loss_name = loss_name
        self.monitor = monitor or self.config.monitor
        self.ckpts = ExperimentCheckpoints(directory, monitor=self.monitor,
                                           mode=self.config.monitor_mode)

        # ---- host data: scan; stats from the RAW images (the reference's
        # compute_mean_std/compute_pos_weight run on the untransformed
        # dataset, __main__.py:200-207), then pad_resize to the static
        # training size for the device-resident arrays.
        size = self.config.pad_resize_size
        dataset = BarkDataset(data_root)
        n = len(dataset)
        self.fnames = [r.fname for r in dataset.records]
        self.wood_types = [r.wood_type for r in dataset.records]
        images = np.zeros((n, size, size, 3), np.uint8)
        labels = np.zeros((n, size, size), np.uint8)
        means, stds = [], []
        class_counts = np.zeros(3, np.int64)
        raw_nonzero = np.zeros(n, np.int64)  # for get_splits weights
        for i in range(n):
            sample, target, _, _ = dataset[i]
            flat = sample.reshape(-1, 3).astype(np.float64)
            means.append(flat.mean(0))
            stds.append(flat.std(0, ddof=1))  # torch .std: unbiased
            class_counts += np.bincount(target.reshape(-1), minlength=3)
            raw_nonzero[i] = np.count_nonzero(target)
            sample, target = pad_resize_pair(sample, target, size)
            images[i] = np.rint(np.clip(sample, 0.0, 1.0) * 255.0)
            labels[i] = target
        del dataset

        # ---- stats + splits (reference __main__.py:204-224)
        self.mean = np.mean(means, axis=0).tolist()
        self.std = np.mean(stds, axis=0).tolist()
        total = class_counts.sum()
        self.pos_weight = (total / (3.0 * class_counts)).tolist()
        print(self.mean)
        print(self.std)
        print(self.pos_weight)
        # Legacy MT19937 stream: the reference seeds global np.random
        # (make_training_deterministic, utils.py:195-198) and get_splits
        # shuffles with it — RandomState(seed) reproduces the exact same
        # shuffle sequence, so split membership matches the reference's
        # run for the same seed.
        rng = np.random.RandomState(self.config.seed)
        self.train_split, self.valid_split, self.test_split, \
            self.train_weights = get_splits(
                raw_nonzero, self.wood_types, rng,
                self.config.train_percent, self.config.valid_percent)
        self._rng = rng

        # ---- dataset placement: HBM-resident (default; steps consume
        # only indices) or host-resident (streamed per batch when the
        # corpus exceeds HBM, TrainConfig.device_resident_data=False)
        self.device_resident = self.config.device_resident_data
        if self.device_resident:
            self.images = jax.device_put(images, self.rules.replicated)
            self.labels = jax.device_put(labels, self.rules.replicated)
        else:
            self.images = images
            self.labels = labels

        # ---- model + optimizer state
        import inspect
        dtype = jnp.bfloat16 if self.config.use_bfloat16 else jnp.float32
        factory = MODEL_FACTORIES[model_name]
        kwargs = {"dtype": dtype}
        if "dropout" in inspect.signature(factory).parameters:
            kwargs["dropout"] = self.config.dropout  # fcn heads only
        self.model = factory(**kwargs)
        variables = self.model.init(
            jax.random.PRNGKey(self.config.seed),
            jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        if self.config.backbone_ckpt:
            # reference pretrained=True parity: fine-tune from an ImageNet
            # backbone (models.py:127-130 via __main__.py:231)
            from ..models.convert import (load_backbone_checkpoint,
                                          merge_backbone)
            variables = merge_backbone(
                variables,
                load_backbone_checkpoint(self.config.backbone_ckpt))
        tx = adam(self.config.lr, self.config.weight_decay)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        self.state = jax.device_put(self.state, self.rules.replicated)

        if sampler not in ("weighted", "prioritized"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler_kind = sampler
        self._train_step = make_train_step(
            self.rules, loss_name=loss_name, crop=self.config.crop_size,
            mean=self.mean, std=self.std,
            brightness=self.config.jitter_brightness,
            saturation=self.config.jitter_saturation,
            f1_postprocess=self.config.train_f1_postprocess)
        self._eval_step = make_eval_step(
            self.model, self.rules, loss_name=loss_name,
            mean=self.mean, std=self.std)
        self.history: list[EpochLog] = []

    # -------------------------------------------------------------- train

    def train(self, epochs: int | None = None,
              valid_batch_size: int = 8,
              resume: bool = False) -> list[EpochLog]:
        """Run the training loop. ``resume=True`` (new vs reference,
        SURVEY.md §5.3) restores the last epoch checkpoint — weights,
        optimizer moments, injected lr — and replays the recorded epoch
        metrics through the plateau/early-stop controllers so the
        continued run behaves as if never interrupted."""
        cfg = self.config
        epochs = epochs or cfg.epochs
        plateau = ReduceLROnPlateau(
            mode=cfg.monitor_mode, factor=cfg.plateau_factor,
            patience=cfg.plateau_patience, threshold=cfg.plateau_threshold,
            threshold_mode="abs")
        early = EarlyStopping(mode=cfg.monitor_mode,
                              min_delta=cfg.early_stop_min_delta,
                              patience=cfg.early_stop_patience)
        key = jax.random.PRNGKey(cfg.seed)
        start_epoch = 1
        if resume and self.ckpts.last_epoch > 0:
            start_epoch = self.ckpts.last_epoch + 1
            self.load_checkpoint(self.ckpts.last_epoch)
            lr = get_learning_rate(self.state.opt_state)
            for entry in self.ckpts.log["epochs"]:
                if self.monitor in entry:
                    lr = plateau.step(entry[self.monitor], lr)
                    early.step(entry[self.monitor], entry["epoch"])
            key = jax.random.fold_in(key, start_epoch)
        prioritized = None
        if self.sampler_kind == "prioritized":
            from ..data.sampling import PrioritizedSampler
            prioritized = PrioritizedSampler(
                len(self.train_split), cfg.batch_size,
                len(self.train_split) * cfg.samples_per_epoch_factor,
                self._rng, metric_mode=cfg.monitor_mode)

        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            # keep per-batch metrics on device until epoch end (no sync
            # inside the hot loop; steps pipeline back-to-back). The
            # prioritized sampler needs the metric per batch (its weight
            # update, utils.py:403-412) and therefore syncs every step.
            batch_metrics: list[dict] = []
            count = 0
            batches = (prioritized if prioritized is not None else
                       weighted_batch_iterator(
                           self.train_weights, cfg.batch_size, self._rng,
                           cfg.samples_per_epoch_factor))
            for batch_pos in batches:
                idx = self.train_split[batch_pos]
                key, sub = jax.random.split(key)
                imgs, labs, didx = self._step_inputs(idx)
                self.state, metrics = self._train_step(
                    self.state, imgs, labs, didx, sub)
                if prioritized is not None:
                    prioritized.update(batch_pos,
                                       float(metrics["miou"]) / 100.0)
                batch_metrics.append(metrics)
                count += len(idx)
            train_metrics = {
                k: float(np.mean([np.asarray(m[k]) for m in batch_metrics]))
                for k in (batch_metrics[0] if batch_metrics else {})}
            train_metrics.setdefault("loss", 0.0)
            train_metrics.setdefault("miou", 0.0)
            train_metrics.setdefault("f1", 0.0)

            val = self.evaluate(self.valid_split, valid_batch_size)
            lr = get_learning_rate(self.state.opt_state)
            log = EpochLog(epoch=epoch, lr=lr, time_s=time.time() - t0,
                           loss=train_metrics["loss"],
                           miou=train_metrics["miou"],
                           f1=train_metrics["f1"],
                           val_loss=val["loss"], val_miou=val["miou"],
                           val_f1=val["f1"])
            self.history.append(log)
            self._log_epoch(log, epochs)

            monitored = log.as_dict()[self.monitor]
            # optimizer state saved too (Poutyne writes .optim files) so a
            # resumed run keeps its Adam moments and injected lr
            is_best = self.ckpts.save_epoch(
                epoch, {"params": self.state.params,
                        "batch_stats": self.state.batch_stats,
                        "opt_state": self.state.opt_state,
                        "step": int(self.state.step)},
                log.as_dict())
            if is_best:
                self.ckpts.export_best_model(self.variables)

            new_lr = plateau.step(monitored, lr)
            if new_lr != lr:
                print(f"Epoch {epoch}: reducing learning rate to "
                      f"{new_lr:.2e}")
                set_learning_rate(self.state.opt_state, new_lr)
            if early.step(monitored, epoch):
                break
        if prioritized is not None:  # train-end stats (utils.py:414-456)
            for k, v in prioritized.stats().items():
                print(f"{k}: {v}")
        return self.history

    # -------------------------------------------------------------- eval

    @property
    def variables(self) -> dict:
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _step_inputs(self, idx):
        """(images, labels, device_idx) for a batch: the HBM-resident
        arrays + indices, or (streamed mode) the host-gathered batch with
        identity indices."""
        idx = np.asarray(idx)
        if self.device_resident:
            return self.images, self.labels, jnp.asarray(idx, jnp.int32)
        return (jax.device_put(self.images[idx], self.rules.replicated),
                jax.device_put(self.labels[idx], self.rules.replicated),
                jnp.arange(len(idx), dtype=jnp.int32))

    def evaluate(self, split: np.ndarray, batch_size: int = 8,
                 variables: dict | None = None) -> dict:
        """Poutyne-style evaluation: per-batch metrics averaged weighted by
        batch size. Batches are padded to a data-axis multiple with repeats
        of the last sample; padded entries are excluded EXACTLY inside the
        eval step (pixel-validity weights on loss + confusion counts), so
        results are identical across any mesh/batch-size layout."""
        variables = variables or self.variables
        sums: dict[str, float] = {}
        count = 0
        d = self.rules.data_size
        for start in range(0, len(split), batch_size):
            idx = np.asarray(split[start:start + batch_size])
            b = len(idx)
            valid = np.ones(len(idx), np.float32)
            if b % d:
                pad = d - b % d
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            imgs, labs, didx = self._step_inputs(idx)
            out = self._eval_step(variables, imgs, labs, didx,
                                  jnp.asarray(valid))
            for k, v in out.items():
                v = np.asarray(v)
                if v.ndim == 0:
                    sums[k] = sums.get(k, 0.0) + float(v) * b
            count += b
        out = {k: v / max(count, 1) for k, v in sums.items()}
        for k in ("loss", "miou", "f1"):
            out.setdefault(k, 0.0)
        return out

    def test(self, batch_size: int = 8, use_best: bool = True) -> dict:
        """exp.test parity (__main__.py:291): Poutyne's Experiment.test
        restores the best checkpoint before evaluating the test split;
        pass use_best=False to test the current weights."""
        if use_best:
            try:
                self.load_best()
            except FileNotFoundError:
                pass  # nothing saved yet: current weights
        metrics = self.evaluate(self.test_split, batch_size)
        print("Test:", ", ".join(f"{k}: {v:g}" for k, v in
                                 sorted(metrics.items())))
        return metrics

    def load_checkpoint(self, epoch: int) -> None:
        self._restore(self.ckpts.load_checkpoint(epoch))

    def load_best(self) -> None:
        self._restore(self.ckpts.load_best())

    def _restore(self, tree: dict) -> None:
        """Restore weights (+ optimizer state when present, keyed on the
        current opt tree structure) from a checkpoint tree."""
        kwargs = dict(params=tree["params"],
                      batch_stats=tree["batch_stats"])
        if "opt_state" in tree:
            try:
                kwargs["opt_state"] = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.state.opt_state),
                    jax.tree_util.tree_leaves(tree["opt_state"]))
                kwargs["step"] = int(tree.get("step", self.state.step))
            except ValueError:
                pass  # structure mismatch (older checkpoint): weights only
        self.state = self.state.replace(**kwargs)

    # ------------------------------------------------------------- logging

    def _log_epoch(self, log: EpochLog, total_epochs: int) -> None:
        print(f"Epoch {log.epoch}/{total_epochs} {log.time_s:.2f}s "
              f"lr: {log.lr:.2e} loss: {log.loss:.6g} "
              f"miou: {log.miou:.6g} f1: {log.f1:.6g} "
              f"val_loss: {log.val_loss:.6g} val_miou: {log.val_miou:.6g} "
              f"val_f1: {log.val_f1:.6g}", flush=True)
