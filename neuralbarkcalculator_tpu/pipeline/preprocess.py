"""Batched TPU preprocessing: decode -> resize -> trim -> PNG.

Reference semantics (models.py:157-203), rebuilt as a device pipeline:

- decode BMPs on host threads (uint8 — 4x less host->device traffic than
  float), batched by input shape;
- on device, one jitted program per input shape: uint8 -> float/255 ->
  MXU-matmul cubic-spline resize to 1024x1024 (ops/resize.py, exact skimage
  parity) -> dark-band row bounds (ops/trim.py) -> uint8 quantization
  (rint(clip(x)*255), exactly skimage imsave's img_as_ubyte conversion at
  models.py:203);
- host crops rows [first:last] (the only ragged step) and encodes PNGs on a
  thread pool, overlapping the next device batch.

Decision parity (models.py:191-201): resize only when max(H, W) >
target_size; trim only when the (possibly resized) image is square.
The reference processes one image at a time on host CPU — this pipeline is
the first of the two hot loops the TPU rebuild batches (SURVEY.md §3.1).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (PREPROCESS_TARGET_SIZE, TRIM_PIXEL_THRESHOLD,
                      TRIM_ROW_FRACTION)
from ..data.dataset import make_dataset
from ..io.native import (load_image_u8_fast as load_image_u8,
                         save_image_u8_fast as save_image_u8)
from ..ops.resize import spline_resize, spline_resize_host
from ..ops.trim import trim_bounds_batch


@dataclasses.dataclass
class ProcessedImage:
    """One preprocessed (resized + trimmed) image, ready for prediction."""

    image: np.ndarray  # uint8 [h, w, 3]
    fname: str  # output name (bmp -> png)
    wood_type: str


@functools.partial(jax.jit, static_argnums=(1, 2))
def _preprocess_batch(batch_u8: jnp.ndarray, target: int, do_resize: bool):
    """[B, H, W, 3] uint8 -> (uint8 [B, target, target, 3], first[B],
    last[B]) on device."""
    img = batch_u8.astype(jnp.float32) / 255.0
    if do_resize:
        img = jax.vmap(lambda x: spline_resize(x, target, target))(img)
    first, last = trim_bounds_batch(img)
    out_u8 = jnp.rint(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return out_u8, first, last


def measure_transfer_bandwidth(nbytes: int = 8 << 20) -> float:
    """Host->device throughput in bytes/s (best of 2; the first transfer
    warms the path). Used to pick the preprocess backend."""
    import time

    import jax

    a = np.zeros((nbytes,), np.uint8)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(jax.device_put(a))
        best = min(best, time.time() - t0)
    return nbytes / max(best, 1e-9)


class Preprocessor:
    """Reference Preprocessor parity (models.py:169-203), folder-batched.

    ``backend``:
    - 'device' — uint8 upload + MXU-matmul resize + device trim bounds
      (the default on a co-located host, where transfers cost ~ms);
    - 'host' — prefiltered cubic B-spline resize entirely host-side:
      the threaded native C++ pass when built (io/native.py:
      preprocess_image_native — bit-exact with scipy, ~4-6x faster per
      core), else the scipy-IIR twin (ops/resize.py:
      spline_resize_host, same math). A 4096^2 BMP is 48 MB; when
      host->device bandwidth is tunnel-bound, shipping it costs more
      than resizing it locally;
    - 'auto' — calibrate once (measured transfer bandwidth + a small
      host-resize probe scaled by the core count available to the IO
      pool) and pick the cheaper predicted path. A co-located host
      (GB/s links) always picks 'device'; 'host' wins only when the
      link is slow AND the host has cores to spare.
    The NEURALBARK_PREPROCESS env var ('host'/'device') overrides all.
    """

    def __init__(self, target_size: int = PREPROCESS_TARGET_SIZE,
                 batch_size: int = 4, io_workers: int = 8,
                 backend: str = "auto"):
        self.target_size = target_size
        self.batch_size = batch_size
        self.io_workers = io_workers
        if backend not in ("auto", "device", "host"):
            raise ValueError(f"unknown preprocess backend {backend!r}")
        self.backend = backend
        self._resolved_backend: str | None = None

    # 'auto' calibration probes the transfer link and host resize speed —
    # neither changes within a process, so the result is cached at module
    # scope: serving/watch mode constructs a fresh Preprocessor per
    # rescan and must not re-pay the probe each time (ADVICE r2).
    _auto_backend_cache: str | None = None

    def _resolve_backend(self) -> str:
        if self._resolved_backend is None:
            env = os.environ.get("NEURALBARK_PREPROCESS")
            if env in ("host", "device"):
                self._resolved_backend = env
            elif self.backend != "auto":
                self._resolved_backend = self.backend
            else:
                if Preprocessor._auto_backend_cache is None:
                    Preprocessor._auto_backend_cache = \
                        self._calibrate_backend()
                self._resolved_backend = Preprocessor._auto_backend_cache
        return self._resolved_backend

    def _calibrate_backend(self, src: int = 4096) -> str:
        """Predict per-image cost of each path and pick the cheaper.

        device ≈ upload of the uint8 source over the measured link (the
        MXU resize itself is ~ms); host ≈ a 1/16-scale resize probe
        scaled to the source size, divided by the cores the IO thread
        pool can actually use (the native pass and scipy/numpy all
        release the GIL). The probe runs the ACTUAL host path — the
        native C++ resize when built, the scipy twin otherwise — so the
        decision reflects what would really run.
        """
        import time

        bw = measure_transfer_bandwidth()
        device_s = (src * src * 3) / bw + 0.1  # + dispatch/pull overhead

        from ..io.native import preprocess_image_native
        probe_src = src // 4
        rng = np.random.default_rng(0)
        probe_u8 = (rng.random((probe_src, probe_src, 3))
                    * 255).astype(np.uint8)
        t0 = time.perf_counter()
        if preprocess_image_native(probe_u8, probe_src // 4,
                                   TRIM_PIXEL_THRESHOLD,
                                   TRIM_ROW_FRACTION, threads=1) is None:
            spline_resize_host(probe_u8.astype(np.float32),
                               probe_src // 4, probe_src // 4)
        probe_s = time.perf_counter() - t0
        cores = max(1, min(self.io_workers, os.cpu_count() or 1))
        host_s = probe_s * 16 / cores
        return "host" if host_s < device_s else "device"

    def preprocess_images(self, root_path: str,
                          save: bool = True,
                          progress: bool = True,
                          resume: bool = False) -> list[ProcessedImage]:
        """Process root/samples/** into root/processed/samples/**.

        Returns the processed images in manifest order so the full pipeline
        can feed prediction without re-reading the PNGs it just wrote.

        ``resume`` skips records whose processed PNG already exists
        (incremental folders / serving mode); only the newly processed
        images are returned.
        """
        records = make_dataset(root_path)
        output_dir = os.path.join(root_path, "processed")
        if resume:
            records = [
                r for r in records
                if not os.path.isfile(os.path.join(
                    output_dir, "samples", r.wood_type, r.fname))]
            if not records:
                return []
        results: list[ProcessedImage | None] = [None] * len(records)
        for idx, item in self._stream_records(records, output_dir, save,
                                              progress):
            results[idx] = item
        return results  # type: ignore[return-value]

    def preprocess_stream(self, root_path: str, save: bool = True,
                          progress: bool = False, resume: bool = False):
        """Streaming twin of preprocess_images: yields (manifest_idx,
        ProcessedImage) as each image finishes, without materializing the
        folder (the full-pipeline fusion path —
        NeuralBarkCalculator.predict_streaming consumes this directly so
        preprocess and predict overlap). Same semantics, same PNG
        side-effects; completion order may differ from manifest order
        (the index carries the order)."""
        records = make_dataset(root_path)
        output_dir = os.path.join(root_path, "processed")
        if resume:
            records = [
                r for r in records
                if not os.path.isfile(os.path.join(
                    output_dir, "samples", r.wood_type, r.fname))]
        yield from self._stream_records(records, output_dir, save,
                                        progress)

    def _stream_records(self, records, output_dir: str, save: bool,
                        progress: bool):
        """Backend dispatch: yields (index-into-records, ProcessedImage)
        in completion order; PNG saves drain before the generator ends."""
        if self._resolve_backend() == "host":
            # decode+resize+trim run per image on the thread pool
            # (scipy/numpy release the GIL, so compute parallelizes on
            # multi-core hosts); a bounded submission window keeps at
            # most ~2x workers of decoded 4096^2 sources in memory.
            with ThreadPoolExecutor(max_workers=self.io_workers) as pool:
                def process(rec):
                    return self._preprocess_host_one(
                        load_image_u8(rec.sample_path))

                # window sized by actual cores: oversubscribing a small
                # host just thrashes memory with decoded 48 MB sources
                window = max(2, 2 * min(self.io_workers,
                                        os.cpu_count() or 1))
                futures: deque = deque(
                    pool.submit(process, rec)
                    for rec in records[:window])
                iterator = enumerate(records)
                if progress:
                    iterator = _tqdm(iterator, total=len(records),
                                     desc="Preprocessing images")
                save_futures = []
                for idx, rec in iterator:
                    processed = futures.popleft().result()
                    if idx + window < len(records):
                        futures.append(
                            pool.submit(process, records[idx + window]))
                    if save:
                        path = os.path.join(output_dir, "samples",
                                            rec.wood_type, rec.fname)
                        save_futures.append(
                            pool.submit(save_image_u8, path, processed))
                    yield idx, ProcessedImage(processed, rec.fname,
                                              rec.wood_type)
                for fut in save_futures:
                    fut.result()
            return

        # Device backend. Two executors: decodes + PNG saves share the IO
        # pool with a bounded look-ahead window (a bare pool.map would
        # eagerly queue one decode task per image — on a large folder
        # every 48 MB source ends up decoded and resident at once, and
        # any task submitted later to the same FIFO pool starves behind
        # the full decode backlog); the launch (stack + host->device
        # transfer + dispatch) gets its own single-worker executor so it
        # runs as soon as a batch is assembled. Keeping the launch off
        # the main thread still matters: jnp.asarray of a 4096^2 uint8
        # batch blocks its calling thread for the whole transfer, which
        # must overlap the previous batch's result pull and PNG encodes
        # (same fix as predict._run_chunks).
        with ThreadPoolExecutor(max_workers=self.io_workers) as pool, \
                ThreadPoolExecutor(max_workers=1) as launch_pool:
            window = max(2, 2 * min(self.io_workers,
                                    os.cpu_count() or 1))
            decode_futs: deque = deque(
                pool.submit(load_image_u8, rec.sample_path)
                for rec in records[:window])

            def decoded_stream():
                for idx, rec in enumerate(records):
                    img = decode_futs.popleft().result()
                    if idx + window < len(records):
                        decode_futs.append(pool.submit(
                            load_image_u8,
                            records[idx + window].sample_path))
                    yield (idx, rec), img

            iterator = decoded_stream()
            if progress:
                iterator = _tqdm(iterator, total=len(records),
                                 desc="Preprocessing images")

            save_futures = []
            pending: deque = deque()

            def finish(keyed, launched):
                done = []
                for (idx, rec), processed in zip(
                        keyed, self._finish_shape_batch(launched)):
                    item = ProcessedImage(processed, rec.fname,
                                          rec.wood_type)
                    if save:
                        path = os.path.join(output_dir, "samples",
                                            rec.wood_type, rec.fname)
                        save_futures.append(
                            pool.submit(save_image_u8, path, processed))
                    done.append((idx, item))
                return done

            for group in _shape_batches(iterator, self.batch_size):
                keyed, imgs = zip(*group)
                pending.append((keyed, launch_pool.submit(
                    self._launch_shape_batch, imgs)))
                if len(pending) >= 2:
                    keyed_done, fut = pending.popleft()
                    yield from finish(keyed_done, fut.result())
            while pending:
                keyed_done, fut = pending.popleft()
                yield from finish(keyed_done, fut.result())
            for fut in save_futures:
                fut.result()

    def preprocess_one(self, img: np.ndarray) -> np.ndarray:
        """Preprocess a single in-memory uint8 [h, w, 3] image (serving
        path: one request, no folder). Host math — for one image the
        device round trip never pays for itself; semantics identical to
        the batched paths (reference models.py:191-203)."""
        if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(
                f"expected uint8 [h, w, 3], got {img.dtype} {img.shape}")
        return self._preprocess_host_one(
            img, threads=min(self.io_workers, os.cpu_count() or 1))

    def _preprocess_host_one(self, img: np.ndarray,
                             threads: int = 1) -> np.ndarray:
        """Host twin of _preprocess_batch + the ragged crop: resize
        decision, spline resize, trim, uint8 quantization — identical
        semantics (reference models.py:191-203).

        Prefers the native C++ pass (io/native.preprocess_image_native:
        bit-exact scipy IIR prefilter, threaded) and falls back to the
        scipy+numpy math below when the library isn't built. ``threads``
        parallelizes WITHIN the image — callers already running one
        image per pool worker keep the default 1 (image-level
        parallelism composes better than nested oversubscription);
        single-request callers (serving preprocess_one) pass the core
        count.
        """
        from ..io.native import preprocess_image_native

        if img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3:
            res = preprocess_image_native(
                img, self.target_size, TRIM_PIXEL_THRESHOLD,
                TRIM_ROW_FRACTION, threads=threads)
            if res is not None:
                out, first, last = res
                return out[first:last] if first >= 0 else out
        h, w = img.shape[:2]
        do_resize = max(h, w) > self.target_size
        imgf = img.astype(np.float32) / 255.0
        if do_resize:
            imgf = spline_resize_host(imgf, self.target_size,
                                      self.target_size)
        if do_resize or h == w:  # "still square": trim (models.py:200)
            nonblack = imgf.sum(axis=-1) > TRIM_PIXEL_THRESHOLD
            keep = nonblack.mean(axis=-1) > TRIM_ROW_FRACTION
            first = int(np.argmax(keep))  # all-False -> 0: no trim
            last = len(keep) - int(np.argmax(keep[::-1]))
            imgf = imgf[first:last]
        return np.rint(np.clip(imgf, 0.0, 1.0) * 255.0).astype(np.uint8)

    def _launch_shape_batch(self, imgs: tuple[np.ndarray, ...]):
        """Dispatch transfer + device preprocess for same-shape images."""
        h, w = imgs[0].shape[:2]
        do_resize = max(h, w) > self.target_size
        square_after = do_resize or h == w
        batch = jnp.asarray(np.stack(imgs))
        out, first, last = _preprocess_batch(batch, self.target_size,
                                             do_resize)
        return out, first, last, square_after

    def _finish_shape_batch(self, launched) -> Iterator[np.ndarray]:
        """Pull a launched batch; yields trimmed uint8 arrays."""
        out, first, last, square_after = launched
        out = np.asarray(out)
        first = np.asarray(first)
        last = np.asarray(last)
        for i in range(out.shape[0]):
            if square_after:
                yield out[i, int(first[i]):int(last[i])]
            else:
                yield out[i]


def _shape_batches(iterator, batch_size: int):
    """Group an ((index, record), image) stream into same-shape batches of
    at most batch_size, preserving order within each shape."""
    pending: dict[tuple, list] = {}
    for keyed, img in iterator:
        key = img.shape
        pending.setdefault(key, []).append((keyed, img))
        if len(pending[key]) == batch_size:
            yield pending.pop(key)
    for group in pending.values():
        yield group


def _tqdm(iterable, **kwargs):
    try:
        from tqdm import tqdm
        return tqdm(iterable, ascii=True, **kwargs)
    except ImportError:  # pragma: no cover
        return iterable
