"""The folder inference engine (reference NeuralBarkCalculator,
models.py:206-364), rebuilt TPU-first.

The reference runs strictly batch_size=1, with two device<->host round
trips per image (models.py:249-262). Here the whole folder is batched:

- processed images (uint8, width 1024, ragged trimmed heights) are grouped
  into static height buckets (multiples of PredictConfig.height_bucket) and
  batched; per-image row masks + embedded bicubic operators make the padded
  batch *exactly* equivalent to per-image execution (models/resnet.py,
  ops/resize.py) — no recompilation per height;
- one jitted program per (bucket, batch) shape does normalize -> forward ->
  fused Pallas upsample+argmax on device, sharded over the mesh data axis
  (spatial width sharding over the model axis available for the conv
  stack); batches are double-buffered so the next batch's transfer and
  forward overlap the current batch's host work;
- only the uint8 class maps return to host, where the exact native
  union-find remove_small_zones + exclude_nodes remap run (io/native.py),
  and artifact rendering (pipeline/report.py) proceeds on threads.

Checkpoints: a reference ``best_model.pt`` (torch state_dict, converted on
load — models/convert.py), a flax msgpack file, or an orbax directory
(train/checkpoint.py) all work.
"""
from __future__ import annotations

import functools
import os
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import NUM_CLASSES, PredictConfig
from ..data.dataset import make_dataset
from ..io.native import (remove_small_zones_host2,
                         load_image_u8_fast as load_image_u8,
                         remove_small_zones_host)
from ..models.segmentation import MODEL_FACTORIES
from ..ops.ccl import remove_small_zones_ragged
from ..ops.resize import embedded_bicubic_rows
from ..parallel.mesh import DATA_AXIS, ShardingRules, make_mesh, \
    pad_to_multiple
from ..utils.profiling import stage_timer
from .preprocess import ProcessedImage
from .report import PredictReporter


class NeuralBarkCalculator:
    """Folder predictor with the reference's public surface
    (models.py:212-245): ``NeuralBarkCalculator(model_path).predict(root,
    exclude_nodes)``."""

    def __init__(self, model_path: str,
                 mesh=None,
                 config: PredictConfig | None = None,
                 model_name: str = "fcn_resnet50"):
        self.config = config or PredictConfig(model_path=model_path)
        dtype = jnp.bfloat16 if self.config.use_bfloat16 else jnp.float32
        self.rules = ShardingRules(mesh if mesh is not None else make_mesh())
        from ..models.quantize import is_quantized_checkpoint
        qckpt = is_quantized_checkpoint(model_path)
        if qckpt:
            # offline int8 checkpoint (tools/quantize_checkpoint.py or
            # models/quantize.save_quantized): the scales were calibrated
            # at export time, so no folding and no first-chunk
            # calibration — the engine starts quantized
            from ..models.quantize import load_quantized
            self.model, variables = load_quantized(model_path, model_name,
                                                   dtype=dtype)
        else:
            self.model = MODEL_FACTORIES[model_name](dtype=dtype)
            variables = _load_variables(model_path, model_name)
        if not qckpt and getattr(self.config, "fold_bn", False) and getattr(
                self.model.backbone, "supports_fold", False):
            # constant-fold eval-mode BN into conv kernels+biases: the
            # inference graph loses every BN elementwise pass
            # (models/fold.py; no reference equivalent — the reference
            # always runs BN, torchvision models.py:113-139). The whole
            # zoo folds (ResNet eps 1e-5, EfficientNet MBConv eps 1e-3);
            # the attribute check keeps future fold-less backbones on
            # the plain path. A ValueError from the fold itself means
            # the checkpoint doesn't match the model (missing
            # batch_stats, unrecognized BN scope) and must surface, not
            # silently run unfolded.
            from ..models.fold import fold_model
            self.model, variables = fold_model(self.model, variables)
        # int8 inference (opt-in, approximate): calibration needs real
        # images, so it runs lazily on the first chunk (_run_chunks); a
        # host copy of the variables avoids pulling 132 MB of params back
        # through the device link for the conversion.
        self._quantize_pending = (not qckpt) and bool(
            getattr(self.config, "quantize_int8", False))
        self._quant_lock = threading.Lock()
        if self._quantize_pending:
            for part, label in ((self.model.backbone, "backbone"),
                                (self.model.classifier, "head")):
                if not getattr(part, "supports_quantize", False):
                    raise ValueError(
                        f"quantize_int8: {label} "
                        f"{type(part).__name__} has no int8 mode "
                        "(supported: ResNet backbones + FCN/DeepLab heads)")
            self._host_variables = jax.tree.map(np.asarray, variables)
        self.variables = jax.device_put(variables, self.rules.replicated)
        self.mean = np.asarray(self.config.mean, np.float32)
        self.std = np.asarray(self.config.std, np.float32)
        # EfficientNet backbones can't run masked ragged batches exactly
        # (TF-SAME stride phase, models/efficientnet.py): fall back to
        # exact-height bucketing — images grouped by their true trimmed
        # height, one compiled program per distinct height. Slower to warm
        # up on height-diverse folders, bit-exact always. The opt-in
        # effnet_bucket_heights trades exactness for bounded compiles:
        # heights pad up to the bucket with edge-replicated rows (the
        # stride phase stays fixed because the bucket is a multiple of
        # the feature stride). Approximate EVERYWHERE, not just at the
        # boundary: squeeze-excite global-pools the map, so pad rows
        # nudge every pixel's SE scale (near-tie argmax pixels flip).
        self._exact_heights = not getattr(self.model.backbone,
                                          "supports_ragged", True)
        self._bucketed_exact = self._exact_heights and bool(
            getattr(self.config, "effnet_bucket_heights", False))
        if self._bucketed_exact:
            stride = getattr(self.model.backbone, "feature_stride", 32)
            if self.config.height_bucket % stride:
                raise ValueError(
                    f"effnet_bucket_heights: height_bucket "
                    f"{self.config.height_bucket} must be a multiple of "
                    f"the backbone's feature stride {stride} (the "
                    f"TF-SAME padding phase is only height-invariant on "
                    f"stride multiples)")
        # compile/eviction telemetry (cache_stats): exact-height
        # backbones key the step cache on every distinct trimmed height,
        # so folders can thrash the 64-entry bound — surfaced rather
        # than silent (VERDICT r3 item 6)
        self._cache_stats = {"step_compiles": 0, "step_evictions": 0,
                             "rowop_evictions": 0, "bytes_h2d": 0}
        # _pad_group runs on pump workers concurrently; GIL makes the
        # int += racy only across bytecode boundaries, but be explicit
        self._stats_bytes_lock = threading.Lock()
        # device-resident cache of the per-height bicubic row operators
        # (see _row_op_dev); keyed (h, pad_h), bounded LRU-ish. The lock
        # serializes cache misses from concurrent pump workers — both for
        # the eviction (two threads popping the same first key would
        # KeyError) and for _device_step, where two threads tracing the
        # same cold (pad_h, batch) shape would each build a jit wrapper
        # and compile the identical XLA program twice.
        self._rowop_cache: dict[tuple[int, int], jax.Array] = {}
        self._cache_lock = threading.Lock()
        self._step_cache: dict[tuple, object] = {}

    def _bucket_of(self, h: int) -> int:
        if self._exact_heights:
            if self._bucketed_exact:
                return pad_to_multiple(h, self.config.height_bucket)
            return h
        fixed = getattr(self.config, "fixed_pad_height", None)
        if fixed and h <= fixed:
            # serving: one pinned launch height (bit-exact via row
            # masking) instead of a content-dependent bucket that may
            # never have been warmed — see PredictConfig.fixed_pad_height
            return fixed
        return pad_to_multiple(h, self.config.height_bucket)

    # ------------------------------------------------------------- public

    def predict(self, root_path: str, exclude_nodes: bool = False,
                images: Sequence[ProcessedImage] | None = None,
                progress: bool = True, resume: bool = False,
                shard: tuple[int, int] | None = None) -> str:
        """Predict every image under root/processed, writing results/
        artifacts (combined figures, dual PNGs, final_stats.csv). Returns
        the csv path.

        ``images`` short-circuits re-reading the PNGs when the caller just
        preprocessed them in the same process (full-pipeline fast path; the
        PNGs on disk are identical by construction). Without it, the
        engine streams: image sizes come from file headers (native *_info
        / PIL lazy open) and each bucket chunk is decoded just in time on
        the thread pool, so folder size never bounds host memory.

        ``resume`` (new vs reference, SURVEY.md §5.3): images whose dual
        PNG + combined figure already exist are not recomputed — their CSV
        row is rebuilt from the dual mask on disk, so an interrupted folder
        run finishes with a complete final_stats.csv.

        ``shard=(k, n)``: multi-host folder partitioning — this process
        computes only manifest indices with ``i % n == k`` (round-robin
        keeps height buckets balanced across hosts) and writes
        ``final_stats.shard-k-of-n.csv`` (rows tagged with their manifest
        order) instead of the final CSV; a merge pass
        (pipeline/multihost.merge_shard_stats, run by process 0) stitches
        the shard files into a final_stats.csv byte-identical to a
        single-process run. Inference is per-image independent — sharding
        by folder needs no cross-host collectives at all (SCALING.md),
        so each process should build its engine over its LOCAL devices.
        """
        processed_path = os.path.join(root_path, "processed")
        results_dir = os.path.join(root_path, "results")
        reporter = PredictReporter(results_dir, dpi=self.config.figure_dpi,
                                   mm_per_pix=self.config.mm_per_pix,
                                   renderer=getattr(self.config,
                                                    "renderer", "fast"))
        if images is None:
            records = make_dataset(processed_path)
            names = [(r.fname, r.wood_type) for r in records]

            def size_of(i: int) -> tuple[int, int]:
                return _header_size(records[i].sample_path)

            def decode_chunk(idxs):
                return [ProcessedImage(
                    load_image_u8(records[i].sample_path),
                    records[i].fname, records[i].wood_type) for i in idxs]
        else:
            names = [(im.fname, im.wood_type) for im in images]

            def size_of(i: int) -> tuple[int, int]:
                return images[i].image.shape[:2]

            def decode_chunk(idxs):
                return [images[i] for i in idxs]

        if shard is not None:
            k, n = shard
            if not (0 <= k < n):
                raise ValueError(f"shard {k}/{n}: need 0 <= k < n")
            mine = set(range(k, len(names), n))
        else:
            mine = None
        done = (self._scan_resume(names, reporter, results_dir,
                                  only=mine) if resume else set())
        chunks = self._plan_chunks(
            [(i, *size_of(i)) for i in range(len(names))
             if i not in done and (mine is None or i in mine)])

        bar = None
        if progress:
            try:
                from tqdm import tqdm
                bar = tqdm(total=sum(len(c[1]) for c in chunks),
                           ascii=True, desc="Predicted images")
            except ImportError:  # pragma: no cover
                pass
        for idx, item, cmap, counts3 in self._run_chunks(
                chunks, decode_chunk, exclude_nodes):
            reporter.add(item.image, cmap, item.fname, item.wood_type,
                         order=idx, counts3=counts3)
            if bar is not None:
                bar.update(1)
        if bar is not None:
            bar.close()
        return reporter.finalize(shard=shard)

    def predict_images(self, images: Sequence[ProcessedImage],
                       exclude_nodes: bool = False,
                       prefetch: int | None = None,
                       with_counts: bool = False):
        """Yield (ProcessedImage, class_map[h, w] uint8) for each image, in
        batched bucket order. Library API under the CLI surface.

        Batches are double-buffered: JAX's async dispatch lets the next
        batch's host->device transfer and forward overlap the current
        batch's host-side postprocess/yielding (``prefetch`` in-flight;
        ``None`` uses ``PredictConfig.prefetch``, same as the folder path).

        ``with_counts=True`` yields (item, class_map, counts3) instead,
        where counts3 is the int64 [3] per-class pixel count over the
        valid rows that the fused native postprocess already produced
        (None when the native lib is unavailable) — callers needing
        percentages (serving, reporting) should take it rather than
        re-sweeping the map with np.bincount.
        """
        chunks = self._plan_chunks(
            [(i, *im.image.shape[:2]) for i, im in enumerate(images)])
        for _, item, cmap, counts in self._run_chunks(
                chunks, lambda idxs: [images[i] for i in idxs],
                exclude_nodes, prefetch=prefetch):
            yield (item, cmap, counts) if with_counts else (item, cmap)

    def predict_streaming(self, root_path: str, stream,
                          exclude_nodes: bool = False,
                          total: int | None = None,
                          progress: bool = True) -> str:
        """Full-pipeline fusion: consume a live (manifest_idx,
        ProcessedImage) stream — Preprocessor.preprocess_stream — and
        feed the predict pump as images arrive, so BMP-folder end-to-end
        runs at ~max(preprocess, predict) instead of their sum, with
        bounded memory: at most (open buckets x batch_size) decoded
        images buffered in the planner plus `prefetch` chunks in flight
        (the non-streaming path first materializes the WHOLE folder's
        ProcessedImages). CSV rows land in manifest order via the
        stream's indices — identical output to the sequential path.
        """
        import queue as _queue

        results_dir = os.path.join(root_path, "results")
        reporter = PredictReporter(results_dir, dpi=self.config.figure_dpi,
                                   mm_per_pix=self.config.mm_per_pix,
                                   renderer=getattr(self.config,
                                                    "renderer", "fast"))
        bs = self.config.batch_size
        # maxsize bounds RSS: the planner blocks once the pump is
        # `prefetch`+queue chunks behind the preprocessor
        chunk_q: _queue.Queue = _queue.Queue(
            maxsize=max(2, getattr(self.config, "prefetch", 2)))
        items_by_idx: dict[int, ProcessedImage] = {}
        items_lock = threading.Lock()
        planner_err: list[BaseException] = []

        def planner() -> None:
            pending: dict[tuple[int, int], list[int]] = {}
            try:
                for idx, item in stream:
                    with items_lock:
                        items_by_idx[idx] = item
                    key = (self._bucket_of(item.image.shape[0]),
                           item.image.shape[1])
                    group = pending.setdefault(key, [])
                    group.append(idx)
                    if len(group) == bs:
                        chunk_q.put((key[0], pending.pop(key)))
                for (pad_h, _w), idxs in sorted(pending.items()):
                    chunk_q.put((pad_h, idxs))
            except BaseException as e:  # surfaced by the consumer
                planner_err.append(e)
            finally:
                chunk_q.put(None)

        def take_items(idxs):
            with items_lock:
                return [items_by_idx.pop(i) for i in idxs]

        def chunk_iter():
            while True:
                c = chunk_q.get()
                if c is None:
                    if planner_err:
                        raise planner_err[0]
                    return
                yield c

        t = threading.Thread(target=planner, daemon=True)
        t.start()
        chunks = chunk_iter()
        if self._quantize_pending:
            # int8 calibration needs real pixels before the first step:
            # peek the first chunk off the live iterator, calibrate on
            # it, then chain it back in front
            import itertools
            first = next(chunks, None)
            if first is not None:
                # non-destructive lookup: the pump's take_items will pop
                # these same indices later
                self._calibrate_quantize(
                    [first], lambda idxs: [items_by_idx[i] for i in idxs])
                chunks = itertools.chain([first], chunks)

        bar = None
        if progress and total:
            try:
                from tqdm import tqdm
                bar = tqdm(total=total, ascii=True,
                           desc="Predicted images")
            except ImportError:  # pragma: no cover
                pass
        for idx, item, cmap, counts3 in self._run_chunks(
                chunks, take_items, exclude_nodes):
            reporter.add(item.image, cmap, item.fname, item.wood_type,
                         order=idx, counts3=counts3)
            if bar is not None:
                bar.update(1)
        t.join()
        if bar is not None:
            bar.close()
        return reporter.finalize()

    # --------------------------------------------------- unified engine

    def _scan_resume(self, names: list[tuple[str, str]], reporter,
                     results_dir: str,
                     only: set[int] | None = None) -> set[int]:
        """Rebuild CSV rows for images whose dual PNG + combined figure
        already exist on disk; returns their indices (to skip). ``only``
        restricts the scan to this process's shard (a resumed shard run
        must not pull other shards' rows into its CSV)."""
        done: set[int] = set()
        for i, (fname, wood_type) in enumerate(names):
            if only is not None and i not in only:
                continue
            dual_path = os.path.join(results_dir, "outputs", wood_type,
                                     fname)
            fig_path = os.path.join(results_dir, "combined_images",
                                    wood_type, fname)
            if os.path.isfile(dual_path) and os.path.isfile(fig_path):
                dual = load_image_u8(dual_path, grayscale=True)
                reporter.add_row_only(
                    ((dual == 127) * 1 + (dual == 255) * 2).astype(
                        np.uint8), fname, wood_type, order=i)
                done.add(i)
        return done

    def _plan_chunks(self, sizes: list[tuple[int, int, int]]
                     ) -> list[tuple[int, list[int]]]:
        """(index, trimmed height, width) triples -> [(pad_h, [index...])]:
        group into static (height bucket, width) shapes, split into
        batch-size chunks. The one planner behind both the in-memory and
        streaming paths. Width is a compiled-shape dimension like the
        height bucket — folders are constant-width in practice (the
        preprocessor emits 1024), but predict_images is a public API and
        serving feeds it arbitrary request mixes, so same-height
        different-width images must never share a chunk buffer."""
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, h, w in sizes:
            buckets.setdefault((self._bucket_of(h), w), []).append(i)
        bs = self.config.batch_size
        return [(pad_h, idxs[s:s + bs])
                for (pad_h, _w), idxs in sorted(buckets.items())
                for s in range(0, len(idxs), bs)]

    def _run_chunks(self, chunks, decode_chunk, exclude_nodes: bool,
                    prefetch: int | None = None):
        """The pump: each chunk's full device round trip — decode -> pad ->
        host->device transfer -> jit dispatch -> device->host pull — runs
        as one worker-pool task, ``prefetch`` chunks in flight, and the
        caller's thread yields (index, ProcessedImage, class_map).

        Keeping every transfer off the consuming thread matters on a
        bandwidth-bound link: device_put of a large uint8 batch and
        np.asarray of the result future each block their calling thread
        for the whole transfer, and the consumer must spend its time in
        postprocess + artifact rendering, not waiting on the wire —
        serializing the streams costs ~sum instead of ~max (measured:
        6.1 -> 8+ img/s moving the uploads off the main thread, and the
        pulls of chunk j+1 now stream during chunk j's rendering). JAX
        dispatch is thread-safe; the runtime serializes device execution
        in submission order, so in-order consumption adds no stalls."""
        if prefetch is None:
            prefetch = getattr(self.config, "prefetch", 2)
        prefetch = max(1, prefetch)
        if self._quantize_pending and isinstance(chunks, list) and chunks:
            # lazy int8 calibration decodes a prefix of chunk 0 before the
            # pump starts; memoize those decodes so the pump's own pass
            # over chunk 0 reuses them instead of re-reading the files
            # (~25 ms/image of PNG decode on a 1-core host)
            memo_set = frozenset(chunks[0][1])
            memo: dict[int, ProcessedImage] = {}
            memo_lock = threading.Lock()
            base_decode = decode_chunk

            def decode_chunk(idxs, _base=base_decode):
                idxs = list(idxs)
                with memo_lock:
                    if memo and all(i not in memo_set for i in idxs):
                        memo.clear()  # past chunk 0: free the cache
                    have = {i: memo[i] for i in idxs if i in memo}
                missing = [i for i in idxs if i not in have]
                if missing:
                    for i, it in zip(missing, _base(missing)):
                        have[i] = it
                        if i in memo_set:
                            with memo_lock:
                                memo[i] = it
                return [have[i] for i in idxs]

            self._calibrate_quantize(chunks, decode_chunk)

        def pump_one(pad_h, idxs):
            if (getattr(self.config, "pipelined_uploads", True)
                    and self.rules.data_size == 1 and len(idxs) >= 4
                    and self._padded_batch(len(idxs)) == len(idxs)):
                # pipelined upload: decode a small first group and start
                # its transfer while the rest of the chunk decodes — a
                # whole-chunk decode leaves the link idle for the full
                # decode time (~25 ms/image on one core), which is dead
                # time at the head of every chunk on a bandwidth-bound
                # link. Single-device only: group buffers concatenate on
                # device without resharding there. (Groups never need
                # dummy padding: n_pad == n when the data axis is 1.)
                # The transfers go to the dedicated upload pool: pump_one
                # itself runs on `pool`, and nesting the device_put tasks
                # there would deadlock once `prefetch` pump tasks occupy
                # every worker (each blocked on p.result() for subtasks
                # queued behind them).
                k = max(2, len(idxs) // 4)
                items, parts = [], []
                for gi in (idxs[:k], idxs[k:]):
                    gitems = decode_chunk(gi)
                    parts.append(upload_pool.submit(
                        jax.device_put, self._pad_group(gitems, pad_h),
                        self.rules.image_batch))
                    items.extend(gitems)
                dev_batch = jnp.concatenate(
                    [p.result() for p in parts], axis=0)
                items, valid_h, fut = self._launch_batch(
                    items, pad_h, dev_batch=dev_batch)
            else:
                items = decode_chunk(idxs)
                items, valid_h, fut = self._launch_batch(items, pad_h)
            with stage_timer(f"predict/pull_h{pad_h}"):
                out = np.asarray(fut)  # worker blocks; GIL released
            return items, valid_h, out

        with ThreadPoolExecutor(max_workers=8) as pool, \
                ThreadPoolExecutor(max_workers=2) as upload_pool:
            # windowed pump over a chunk source that may be a list OR a
            # live iterator (the streaming full-pipeline path feeds
            # chunks as the preprocessor produces them): keep `prefetch`
            # in flight, consume in submission order
            it = iter(chunks)
            window: deque = deque()

            def submit_next() -> bool:
                try:
                    pad_h, idxs = next(it)
                except StopIteration:
                    return False
                window.append((idxs, pool.submit(pump_one, pad_h, idxs)))
                return True

            for _ in range(prefetch):
                if not submit_next():
                    break
            while window:
                idxs, fut = window.popleft()
                items, valid_h, out = fut.result()
                submit_next()
                yield from self._finish_batch_raw(exclude_nodes, idxs,
                                                  items, valid_h, out)

    def _calibrate_quantize(self, chunks, decode_chunk) -> None:
        """First-chunk int8 calibration (PredictConfig.quantize_int8).

        Decodes up to 4 images of the first chunk, builds one normalized
        zero-padded f32 batch, and runs models/quantize.quantize_model on
        the host-variable copy: one extra forward compile at the calib
        shape, then the engine swaps to the int8 (model, variables) pair
        for every subsequent step. Padded rows are zeroed, not masked,
        during calibration — they only make the max-abs scales slightly
        conservative, never wrong."""
        with self._quant_lock:
            if not self._quantize_pending:
                return
            from ..models.quantize import quantize_model
            pad_h, idxs = chunks[0]
            items = decode_chunk(idxs[:4])
            w = items[0].image.shape[1]
            batch = np.zeros((len(items), pad_h, w, 3), np.float32)
            for i, it in enumerate(items):
                h = it.image.shape[0]
                batch[i, :h] = (it.image.astype(np.float32) / 255.0
                                - self.mean) / self.std
            with stage_timer("predict/quantize_calibration"):
                self.model, qvars = quantize_model(
                    self.model, self._host_variables, [batch])
            self.variables = jax.device_put(qvars, self.rules.replicated)
            del self._host_variables
            self._quantize_pending = False

    def _finish_batch_raw(self, exclude_nodes, chunk_idxs, items, valid_h,
                          out):
        if out.shape[0] > len(items):  # drop dummy-padded rows (pow2
            out = out[:len(items)]     # ladder / data-axis rounding)
            valid_h = valid_h[:len(items)]
        pad_h = out.shape[1]
        w = items[0].image.shape[1]
        packed = out.shape[2] != w  # 2-bit packed device pull
        with stage_timer(f"predict/postprocess_h{pad_h}"):
            # one native pass: unpack (if packed) + remove_small_zones +
            # exclude_nodes remap + per-class counts — replaces three
            # numpy sweeps (LUT gather, np.where, bincount) and the 4x
            # unpacked intermediate (io/native.remove_small_zones_host2)
            res = remove_small_zones_host2(out, w, valid_h,
                                           packed=packed,
                                           exclude_nodes=exclude_nodes)
            if res is not None:
                out, counts = res
            else:  # no native lib: numpy unpack + device CCL fallback
                if packed:
                    out = _UNPACK2[out].reshape(out.shape[0],
                                                out.shape[1], -1)
                out = self._postprocess(out, valid_h, exclude_nodes)
                counts = None
        for i, (idx, item) in enumerate(zip(chunk_idxs, items)):
            yield (idx, item, out[i, :item.image.shape[0]],
                   None if counts is None else counts[i])

    # ------------------------------------------------------------ internal

    def _pad_group(self, items: Sequence[ProcessedImage],
                   pad_h: int) -> np.ndarray:
        """Assemble [n, pad_h, w, 3] uint8 from trimmed images, filling
        only the pad rows (np.zeros of a whole 24 MB chunk buffer is
        measurable host time for a few hundred KB of actual padding).
        Fill is zeros on the ragged path (the zero-beyond-valid_h
        invariant the masking machinery relies on) and edge replication
        on the effnet_bucket_heights path (zeros would be a hard dark
        edge feeding real conv taps; replicating the last content row is
        the least-surprising approximate boundary)."""
        w = items[0].image.shape[1]
        edge = self._bucketed_exact
        buf = np.empty((len(items), pad_h, w, 3), np.uint8)
        for i, item in enumerate(items):
            h = item.image.shape[0]
            buf[i, :h] = item.image
            if h < pad_h:
                buf[i, h:] = item.image[h - 1:h] if edge else 0
        # every assembled batch is device_put exactly once: this counter
        # is the engine's host->device pixel-byte telemetry
        # (cache_stats()["bytes_h2d"]). Long-lived processes use it to
        # attribute RSS growth: this environment's tunneled PJRT client
        # retains ~0.9x of every uploaded buffer host-side
        # (tools/leak_probe2.py — device_put of a fresh 3 MB array grows
        # RSS 2.73 MB/put with flat Python-object accounting, CPU
        # backend clean), so tools/serving_soak.py nets the platform
        # term out of its flat-RSS invariant.
        with self._stats_bytes_lock:
            self._cache_stats["bytes_h2d"] += buf.nbytes
        return buf

    def _padded_batch(self, n: int) -> int:
        """Final launch-batch size for ``n`` items: rounded up the
        {1,2,4,...,batch_size} ladder (PredictConfig.pad_batch_pow2) and
        then to a multiple of the data-axis size so the batch dim shards
        evenly. The ladder bounds the set of compiled (pad_h, batch)
        programs: folder tails and serving micro-batches of any size hit
        at most log2(batch_size)+1 shapes instead of one compile per
        distinct arrival count."""
        bs = self.config.batch_size
        if getattr(self.config, "pad_batch_pow2", True) and 0 < n < bs:
            p = 1
            while p < n:
                p *= 2
            n = min(p, bs)
        return pad_to_multiple(n, self.rules.data_size)

    def launch_item_counts(self) -> list[int]:
        """One representative item count per distinct launch-batch shape:
        feeding the engine each of these (at one width/height bucket)
        compiles every batch shape a micro-batch of 1..batch_size items
        can hit. Single source of truth for serving warmup
        (BatchingPredictor.warmup) — derived from _padded_batch by
        construction, not by copy. Representative counts (not the launch
        sizes themselves) because _padded_batch need not be idempotent
        when the data-axis size is not a power of two."""
        reps: dict[int, int] = {}
        for n in range(1, self.config.batch_size + 1):
            reps.setdefault(self._padded_batch(n), n)
        return sorted(reps.values())

    def _launch_batch(self, items: list[ProcessedImage], pad_h: int,
                      dev_batch=None):
        """Pad a bucket chunk to static shapes and dispatch the device
        step asynchronously. Returns (items, valid_h, device_future).

        ``dev_batch``: the image batch already on device (the pipelined
        upload path in _run_chunks) — must cover exactly len(items) rows,
        so it is only passed when no dummy padding is needed."""
        n = len(items)
        # surplus rows are dummies dropped before postprocess
        n_pad = self._padded_batch(n)
        w = items[0].image.shape[1]
        valid_h = np.full((n_pad,), pad_h, np.int32)
        pack = w % 4 == 0  # 2-bit packed pull (see _pack2bit)
        if dev_batch is None:
            batch = self._pad_group(items, pad_h)
            if n_pad > n:
                batch = np.concatenate(
                    [batch, np.zeros((n_pad - n, pad_h, w, 3), np.uint8)])
        else:
            assert n_pad == n and dev_batch.shape[0] == n

        if self._exact_heights:
            # plain forward, no masks or embedded row operators. Default:
            # every item has exactly this height (the planner buckets by
            # true height), bit-exact. effnet_bucket_heights: items are
            # edge-padded up to the bucket (approximate near the trim
            # boundary); valid_h carries true heights so the postprocess
            # zeroes/ignores the pad rows.
            if self._bucketed_exact:
                for i, item in enumerate(items):
                    valid_h[i] = item.image.shape[0]
            else:
                assert all(it.image.shape[0] == pad_h for it in items)
            with stage_timer(f"predict/dispatch_h{pad_h}"):
                if dev_batch is None:
                    dev_batch = jax.device_put(batch,
                                               self.rules.image_batch)
                fut = self._device_step(pad_h, n_pad, exact=True,
                                        pack=pack)(
                    self.variables, dev_batch)
            return items, valid_h, fut

        if pad_h % 8:
            raise ValueError(
                f"height bucket {pad_h} must be a multiple of 8 (the "
                f"model's output stride); set PredictConfig.height_bucket "
                f"accordingly")
        ops = []
        for i, item in enumerate(items):
            valid_h[i] = item.image.shape[0]
            ops.append(self._row_op_dev(item.image.shape[0], pad_h))
        for i in range(n, n_pad):  # dummies reuse image 0's operator shape
            valid_h[i] = items[0].image.shape[0]
            ops.append(ops[0])

        with stage_timer(f"predict/dispatch_h{pad_h}"):
            # the row operators are already device-resident (per-height
            # cache): stacking them is an on-device concat + reshard, so
            # the chunk upload moves only the uint8 pixels — at pad 1024
            # the [B, 1024, 128] f32 operators would add ~17% bytes to a
            # bandwidth-bound host->device link (512 KB vs 3 MB per image)
            row_ops = jax.device_put(jnp.stack(ops), self.rules.batch)
            if dev_batch is None:
                dev_batch = jax.device_put(batch, self.rules.image_batch)
            fut = self._device_step(pad_h, n_pad, pack=pack)(
                self.variables, dev_batch,
                jax.device_put(valid_h, self.rules.batch),
                row_ops)
        return items, valid_h, fut

    def _row_op_dev(self, h: int, pad_h: int) -> "jax.Array":
        """The embedded (feat_h -> h) bicubic row operator for one trimmed
        height, uploaded once and cached on device (replicated). Numerics
        are identical to uploading per batch — the same host-built f32
        matrix (ops/resize.embedded_bicubic_rows) is the cache value."""
        key = (h, pad_h)
        op = self._rowop_cache.get(key)
        if op is None:
            feat_h = self.model.backbone.valid_feature_height(h)
            op = jax.device_put(
                embedded_bicubic_rows(feat_h, h, pad_h // 8, pad_h),
                self.rules.replicated)
            with self._cache_lock:
                if len(self._rowop_cache) >= 128:  # bound HBM: 128x512 KB
                    self._rowop_cache.pop(next(iter(self._rowop_cache)),
                                          None)
                    self._cache_stats["rowop_evictions"] += 1
                self._rowop_cache[key] = op
        return op

    def _postprocess(self, preds_u8: np.ndarray, valid_h: np.ndarray,
                     exclude_nodes: bool) -> np.ndarray:
        """remove_small_zones + exclude_nodes remap (models.py:270-276).

        Runs in the native C++ union-find (io/native.py) — exact skimage
        semantics, ~5 ms per 1024^2 image vs seconds for iterative label
        propagation on device — falling back to the device op when the
        library isn't built. The class maps are already host-side for
        artifact rendering, so this costs no extra transfer.
        """
        cleaned = remove_small_zones_host(preds_u8, valid_h)
        if cleaned is None:  # no native lib: device CCL fallback
            import warnings
            warnings.warn(
                "native/libbarkio.so is not built: remove_small_zones is "
                "falling back to the device segmented-scan CCL, ~100x "
                "slower on realistic masks (seconds/image of postprocess)."
                " Run `make -C native` to build the C++ runtime.",
                RuntimeWarning, stacklevel=2)
            cleaned = np.asarray(remove_small_zones_ragged(
                jnp.asarray(preds_u8.astype(np.int32)),
                jnp.asarray(valid_h))).astype(np.uint8)
        if exclude_nodes:  # node class 2 -> 1 (models.py:273-276)
            cleaned = np.where(cleaned == 2, 1, cleaned).astype(np.uint8)
        return cleaned

    def _device_step(self, pad_h: int, batch: int, exact: bool = False,
                     pack: bool = False):
        """The jitted normalize+forward+argmax step for one static
        (pad_h, batch) shape, built once per shape (double-checked lock:
        concurrent pump workers hitting the same cold shape must share
        ONE jit wrapper, or each would trace and compile the identical
        program — a plain lru_cache does not deduplicate in-flight
        misses). Ragged backbones keep the cache small by construction
        (8 height buckets worst case x full/tail batch); exact-height
        backbones (EfficientNet) key on every distinct trimmed height,
        so the cache is bounded — evicting a wrapper frees its XLA
        executable, and a recurring height just recompiles."""
        key = (pad_h, batch, exact, pack)
        fn = self._step_cache.get(key)
        if fn is None:
            with self._cache_lock:
                fn = self._step_cache.get(key)
                if fn is None:
                    fn = self._build_device_step(pad_h, batch, exact,
                                                 pack)
                    self._cache_stats["step_compiles"] += 1
                    if len(self._step_cache) >= 64:
                        self._step_cache.pop(
                            next(iter(self._step_cache)), None)
                        self._cache_stats["step_evictions"] += 1
                        if self._cache_stats["step_evictions"] == 1:
                            import warnings
                            warnings.warn(
                                "predict step cache exceeded 64 compiled "
                                "programs and is evicting (recurring "
                                "shapes now recompile, tens of seconds "
                                "each). Height-diverse EfficientNet "
                                "folders hit this by design — set "
                                "PredictConfig.effnet_bucket_heights "
                                "(approximate) to bound compiles; see "
                                "cache_stats().", RuntimeWarning,
                                stacklevel=3)
                    self._step_cache[key] = fn
        return fn

    def cache_stats(self) -> dict:
        """Compile/eviction telemetry for the jitted-step and row-operator
        caches: ``step_compiles`` counts distinct (pad_h, batch, exact,
        pack) programs built; nonzero ``step_evictions`` means the 64-entry
        bound was hit and recurring shapes now recompile (cache thrash —
        the first eviction also warns). ``bytes_h2d`` counts host->device
        pixel bytes uploaded (every assembled batch, incl. pow2-ladder
        padding) — the denominator for RSS-growth attribution in
        long-lived processes (tools/serving_soak.py)."""
        return dict(self._cache_stats)

    def _build_device_step(self, pad_h: int, batch: int, exact: bool,
                           pack: bool):
        """Build + jit the device step. With use_pallas (TPU backend),
        upsample and argmax fuse into one Pallas kernel that never
        materializes the full-resolution float logits in HBM
        (ops/pallas_kernels.py).

        ``exact``: every image in the batch has true height pad_h (the
        EfficientNet fallback path) — plain forward, no masks/row ops."""
        mean, std = jnp.asarray(self.mean), jnp.asarray(self.std)
        data_only = NamedSharding(self.rules.mesh, P(DATA_AXIS))
        interpret = bool(getattr(self.config, "pallas_interpret", False))
        use_pallas = (self.config.use_pallas
                      and (jax.default_backend() == "tpu" or interpret))

        if exact:
            def exact_step(variables, batch_u8):
                x = batch_u8.astype(jnp.float32) / 255.0
                x = (x - mean) / std
                logits = self.model.apply(variables, x, train=False)
                preds = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                return _pack2bit(preds) if pack else preds

            return jax.jit(exact_step, out_shardings=data_only)

        def step(variables, batch_u8, valid_h, row_ops):
            from ..models.resnet import apply_row_mask
            x = batch_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            # normalization turns the zero-padded rows into -mean/std;
            # re-zero them — the ragged-batch exactness proof
            # (models/resnet.py) requires the input to be zero beyond
            # valid_h, matching reference conv zero-padding.
            x = apply_row_mask(x, valid_h)
            if use_pallas:
                from ..models.segmentation import SegmentationModel
                from ..ops.pallas_kernels import upsample_argmax
                from ..ops.resize import bicubic_resize_matrix
                feat = self.model.apply(
                    variables, x, train=False, valid_h=valid_h,
                    method=SegmentationModel.head_logits)
                colt = jnp.asarray(np.ascontiguousarray(
                    bicubic_resize_matrix(feat.shape[2],
                                          x.shape[2]).T), jnp.float32)
                kernel = functools.partial(upsample_argmax,
                                           out_w=x.shape[2],
                                           interpret=interpret)
                if self.rules.n_devices > 1:
                    # pallas_call can't be auto-partitioned by GSPMD:
                    # shard_map it over the whole mesh. The batch grid is
                    # embarrassingly parallel on the data axis; the small
                    # stride-8 feature maps (128x128x3 f32) are gathered
                    # to full width first (P(DATA_AXIS) on every dim but
                    # batch == replicated over the model axis), so each
                    # shard runs the identical single-device kernel.
                    kernel = jax.shard_map(
                        kernel, mesh=self.rules.mesh,
                        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
                        out_specs=P(DATA_AXIS), check_vma=False)
                preds = kernel(feat, row_ops, colt)
                return _pack2bit(preds) if pack else preds
            logits = self.model.apply(variables, x, train=False,
                                      valid_h=valid_h, row_upsample=row_ops)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            return _pack2bit(preds) if pack else preds

        # scoped-vmem: two reasons to raise the 16 MB default for THIS
        # program. (1) Correctness headroom: XLA:TPU's buffer assignment
        # sometimes stack-allocates the pallas kernel's whole [B, OH, OW]
        # u8 output (plus operands) in scoped VMEM; at batch 8 the int8
        # program hit the default limit as a compile-time OOM ("should
        # not be possible", per the error text). (2) Measured perf: the
        # round-5 ladder scan (tools/inference_opts_probe.py,
        # benchmarks/inference_opts{,_vmem}.json) found 64 MB fastest in
        # both modes across two passes — bf16 7.25-7.30 -> 7.04-7.12,
        # int8 4.99-5.02 -> 4.77-4.86 ms/img at b32 (2-4%) — while
        # 96 MB REGRESSES both (crowds out the compiler's other on-chip
        # buffers); v5e has 128 MB of VMEM total. The other accepted
        # XLA knobs (latency-hiding off, rwb fusion off) are neutral.
        options = ({"xla_tpu_scoped_vmem_limit_kib": 65536}
                   if use_pallas and jax.default_backend() == "tpu"
                   else None)
        extra = getattr(self.config, "compiler_options", None)
        if extra:  # deployment escape hatch; user keys win
            options = {**(options or {}), **extra}
        return jax.jit(step, out_shardings=data_only,
                       compiler_options=options)


# class maps carry 3 values in 8 bits; the device packs 4 pixels/byte
# along W (w % 4 == 0) so the device->host pull moves 4x fewer bytes —
# on PCIe- or tunnel-bound hosts the pull is pure bandwidth. LUT-expand
# on host: byte -> its 4 crumbs.
_UNPACK2 = np.stack([(np.arange(256, dtype=np.uint8) >> (2 * k)) & 3
                     for k in range(4)], axis=1)


def _pack2bit(m: "jnp.ndarray") -> "jnp.ndarray":
    """[B, H, W] uint8 {0,1,2} -> [B, H, W//4] uint8, 4 pixels/byte."""
    m4 = m.reshape(m.shape[0], m.shape[1], -1, 4)
    return (m4[..., 0] | (m4[..., 1] << 2) | (m4[..., 2] << 4)
            | (m4[..., 3] << 6))


def _header_size(path: str) -> tuple[int, int]:
    """Image (height, width) from the file header alone (no pixel
    decode)."""
    from ..io.native import image_info
    info = image_info(path)
    if info is not None:
        return info[0], info[1]
    from PIL import Image
    with open(path, "rb") as f:
        w, h = Image.open(f).size  # lazy: header only
    return h, w


def _load_variables(path: str, model_name: str) -> dict:
    """Load {params, batch_stats} from .pt / .msgpack / orbax dir."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"model checkpoint not found: {path!r} (expected a reference "
            f"best_model.pt, a flax .msgpack file, or an orbax directory; "
            f"the predict CLI looks for ./best_model.pt by default, "
            f"reference predict.py:57)")
    head = "deeplab" if model_name.startswith("deeplab") else "fcn"
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..models.convert import load_torch_checkpoint
        from ..models.segmentation import efficientnet_variant_of
        return load_torch_checkpoint(
            path, head=head,
            efficientnet_variant=efficientnet_variant_of(model_name))
    if os.path.isdir(path):
        from ..train.checkpoint import restore_variables
        return restore_variables(path)
    import flax.serialization

    from ..models.segmentation import MODEL_FACTORIES as _F
    model = _F[model_name]()
    # param shapes are input-size independent; init tiny for the template
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          train=False)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


__all__ = ["NeuralBarkCalculator", "NUM_CLASSES"]
