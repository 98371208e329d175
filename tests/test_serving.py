"""Serving subsystem tests: micro-batcher exactness + the HTTP surface.

The batcher must be a pure transport layer: a request's class map and
stats must equal what the folder engine (predict_images + reporter math)
produces for the same image — batching, width grouping, and the
per-request exclude_nodes remap must never change numbers.
"""
import argparse
import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w, 3)) * 120 + 90).astype(np.uint8)


@pytest.fixture(scope="module")
def calc(tmp_path_factory):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import (
        NeuralBarkCalculator)

    model = fcn_resnet50(dropout=0.0)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = tmp_path_factory.mktemp("serve_ckpt") / "model.msgpack"
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    config = PredictConfig(model_path=str(path), batch_size=4,
                           use_bfloat16=False, figure_dpi=50)
    return NeuralBarkCalculator(str(path), mesh=make_mesh(n_data=2),
                                config=config)


def test_batcher_matches_direct_engine(calc):
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    imgs = [_img(h, 128, seed=i)
            for i, h in enumerate((120, 128, 128, 96, 128))]
    direct = {
        it.fname: cm for it, cm in calc.predict_images(
            [ProcessedImage(im, f"d{i}", "t") for i, im in enumerate(imgs)])
    }

    pred = BatchingPredictor(calc, batch_size=4, max_wait_ms=150.0)
    try:
        futs = [pred.submit(im) for im in imgs]
        for i, fut in enumerate(futs):
            res = fut.result(timeout=120)
            np.testing.assert_array_equal(res.class_map, direct[f"d{i}"])
            # stats must be the reporter's math over the same map
            counts = np.bincount(res.class_map.ravel(), minlength=3)
            assert res.counts.tolist() == counts.tolist()
            assert res.bark_percent == pytest.approx(
                counts[1] / res.class_map.size * 100.0)
            assert res.batch_images >= 1
        stats = pred.snapshot_stats()
        assert stats["served"] == 5
        assert stats["requests"] == 5
        assert stats["errors"] == 0
        assert stats["batches"] >= 2  # 5 images at batch 4 needs >= 2
        assert stats["latency_ms_p50"] > 0
    finally:
        pred.close()


def test_pow2_ladder_bounds_compiled_batch_shapes(calc):
    """PredictConfig.pad_batch_pow2: a 3-image micro-batch must launch
    at ladder size 4, not compile a batch-3 program (each distinct batch
    size is a fresh XLA compile — under mixed serving load that was a
    115 s p95), and the dummy row must be dropped before postprocess so
    results stay bit-identical to per-image runs."""
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    # calc fixture: batch_size=4 over a 2-device data axis
    assert [calc._padded_batch(n) for n in (1, 2, 3, 4)] == [2, 2, 4, 4]
    # warmup's source of truth: one representative count per launch shape
    assert calc.launch_item_counts() == [1, 3]

    items = [ProcessedImage(_img(128, 64, seed=10 + i), f"p{i}", "t")
             for i in range(3)]
    batched = {it.fname: cm for it, cm in calc.predict_images(items)}
    assert sorted(batched) == ["p0", "p1", "p2"]
    for it in items:
        (single,) = [cm for _, cm in calc.predict_images([it])]
        np.testing.assert_array_equal(batched[it.fname], single)
    launched = {k[1] for k in calc._step_cache if k[0] == 128}
    assert 3 not in launched
    assert launched <= {2, 4}


def test_fixed_pad_height_pins_launch_bucket(calc):
    """PredictConfig.fixed_pad_height (serving default 1024, scaled down
    here): every launch at or below it must use ONE pad height — a
    content-dependent trim height must never select an unwarmed bucket
    (a 20-40 s XLA compile mid-traffic) — while results stay bit-equal
    to the bucketed engine (ragged row-mask exactness)."""
    from neuralbarkcalculator_tpu.config import PredictConfig
    from neuralbarkcalculator_tpu.parallel.mesh import make_mesh
    from neuralbarkcalculator_tpu.pipeline.predict import (
        NeuralBarkCalculator)
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage

    cfg = PredictConfig(model_path=calc.config.model_path, batch_size=4,
                        use_bfloat16=False, height_bucket=64,
                        fixed_pad_height=128)
    fixed = NeuralBarkCalculator(calc.config.model_path,
                                 mesh=make_mesh(n_data=2), config=cfg)
    # 60 would bucket to 64 (height_bucket=64); pinned it must launch 128
    assert fixed._bucket_of(60) == 128
    assert fixed._bucket_of(128) == 128
    # taller than the pin: fall back to normal bucketing, never truncate
    assert fixed._bucket_of(200) == 256

    items = [ProcessedImage(_img(60, 128, seed=21), "a", "t"),
             ProcessedImage(_img(128, 128, seed=22), "b", "t")]
    got = {it.fname: cm for it, cm in fixed.predict_images(items)}
    assert {ph for (ph, *_rest) in fixed._step_cache} == {128}
    # calc (height_bucket=128, no pin) buckets 60 -> 128 too; equality
    # here is the ragged row-mask exactness guarantee end-to-end
    ref = {it.fname: cm for it, cm in calc.predict_images(items)}
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_batcher_exclude_nodes_per_request(calc):
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    img = _img(128, 128, seed=7)
    pred = BatchingPredictor(calc, batch_size=2, max_wait_ms=150.0)
    try:
        f_keep = pred.submit(img, exclude_nodes=False)
        f_excl = pred.submit(img, exclude_nodes=True)
        keep, excl = f_keep.result(timeout=120), f_excl.result(timeout=120)
        # same batch, both flavors: remap is exactly node->bark, after
        # remove_small_zones (reference order, models.py:270-276)
        np.testing.assert_array_equal(
            excl.class_map,
            np.where(keep.class_map == 2, 1, keep.class_map))
        assert not (excl.class_map == 2).any()
        assert excl.counts[2] == 0
    finally:
        pred.close()


def test_batcher_mixed_widths(calc):
    """Widths are compiled-shape dims: the engine's chunk planner must
    split a mixed-size micro-batch by (height bucket, width), so any
    arrival mix resolves correctly (this covers the public
    predict_images API too — the direct call below is mixed-width)."""
    from neuralbarkcalculator_tpu.pipeline.preprocess import ProcessedImage
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    imgs = [_img(128, 128, seed=1), _img(128, 96, seed=2),
            _img(120, 128, seed=3), _img(96, 96, seed=4)]
    direct = {
        it.fname: cm for it, cm in calc.predict_images(
            [ProcessedImage(im, f"d{i}", "t") for i, im in enumerate(imgs)])
    }
    pred = BatchingPredictor(calc, batch_size=4, max_wait_ms=100.0)
    try:
        futs = [pred.submit(im) for im in imgs]
        for i, fut in enumerate(futs):
            np.testing.assert_array_equal(
                fut.result(timeout=120).class_map, direct[f"d{i}"])
    finally:
        pred.close()


def test_batcher_rejects_bad_input_and_close(calc):
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    pred = BatchingPredictor(calc, batch_size=2, max_wait_ms=10.0)
    with pytest.raises(ValueError):
        pred.submit(np.zeros((8, 8), np.uint8))  # no channel dim
    with pytest.raises(ValueError):
        pred.submit(np.zeros((8, 8, 3), np.float32))  # wrong dtype
    pred.close()
    with pytest.raises(RuntimeError):
        pred.submit(np.zeros((8, 8, 3), np.uint8))
    # double close is a no-op
    pred.close()


def test_warmup_resets_stats(calc):
    """Warmup pays the compile; telemetry must start clean afterwards
    (a minutes-long warmup 'request' would own p95 forever)."""
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    pred = BatchingPredictor(calc, batch_size=2, max_wait_ms=10.0)
    try:
        pred.warmup(height=64, width=64)
        stats = pred.snapshot_stats()
        assert stats["served"] == 0 and stats["requests"] == 0
        assert "latency_ms_p50" not in stats
        res = pred.submit(_img(64, 64)).result(timeout=120)
        assert res.class_map.shape == (64, 64)
        assert pred.snapshot_stats()["served"] == 1
    finally:
        pred.close()


class _GatedCalc:
    """Minimal calc stub whose predict blocks on an event — lets tests
    hold the batcher worker mid-batch deterministically."""

    def __init__(self, gate):
        import types
        self.gate = gate
        self.config = types.SimpleNamespace(batch_size=1, mm_per_pix=12.96)

    def launch_item_counts(self):
        return [1]

    def predict_images(self, items, exclude_nodes=False, prefetch=None,
                       with_counts=False):
        self.gate.wait(timeout=30)
        for it in items:
            cmap = np.zeros(it.image.shape[:2], np.uint8)
            counts = np.array([cmap.size, 0, 0], np.int64)
            yield (it, cmap, counts) if with_counts else (it, cmap)


def test_backpressure_counts_rejected_requests():
    """queue.Full must show up in /v1/stats: requests and rejected both
    tick, so overload is visible in the telemetry built to expose it."""
    import threading
    import queue as _q
    import time as _t
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    gate = threading.Event()
    pred = BatchingPredictor(_GatedCalc(gate), batch_size=1,
                             max_wait_ms=5.0, queue_limit=1)
    try:
        f1 = pred.submit(_img(8, 8))
        deadline = _t.time() + 5
        while pred._queue.qsize() and _t.time() < deadline:
            _t.sleep(0.005)  # worker takes r1, blocks on the gate
        f2 = pred.submit(_img(8, 8))  # fills the bounded queue
        with pytest.raises(_q.Full):
            pred.submit(_img(8, 8))
        stats = pred.snapshot_stats()
        assert stats["requests"] == 3 and stats["rejected"] == 1
        gate.set()
        assert f1.result(timeout=10).class_map.shape == (8, 8)
        assert f2.result(timeout=10).class_map.shape == (8, 8)
        assert pred.snapshot_stats()["served"] == 2
    finally:
        gate.set()
        pred.close()


def test_close_serves_requests_queued_before_sentinel():
    """A request accepted before close() must resolve, not orphan: the
    FIFO protocol (submit put and close sentinel serialized by one lock)
    guarantees accepted items precede the sentinel."""
    import threading
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    gate = threading.Event()
    pred = BatchingPredictor(_GatedCalc(gate), batch_size=1,
                             max_wait_ms=5.0, queue_limit=8)
    f1 = pred.submit(_img(8, 8))
    f2 = pred.submit(_img(8, 8))  # queued behind the in-flight batch
    closer = threading.Thread(target=pred.close)
    closer.start()
    gate.set()
    closer.join(timeout=15)
    assert not closer.is_alive()
    assert f1.result(timeout=1).class_map.shape == (8, 8)
    assert f2.result(timeout=1).class_map.shape == (8, 8)
    with pytest.raises(RuntimeError):
        pred.submit(_img(8, 8))


# --------------------------------------------------------------- HTTP


@pytest.fixture(scope="module")
def server(calc):
    """ThreadingHTTPServer on an ephemeral port over the shared calc
    (make_server would build its own model; wire the fixture's in
    directly to keep the suite fast)."""
    from http.server import ThreadingHTTPServer

    from neuralbarkcalculator_tpu.cli.serve import (BarkHandler,
                                                    _ServerState,
                                                    serve_in_thread)
    from neuralbarkcalculator_tpu.pipeline.preprocess import Preprocessor
    from neuralbarkcalculator_tpu.pipeline.serving import BatchingPredictor

    predictor = BatchingPredictor(calc, batch_size=2, max_wait_ms=10.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), BarkHandler)
    srv.state = _ServerState(predictor, Preprocessor(), "fcn_resnet50",
                             timeout_s=120.0, dpi=50)
    thread = serve_in_thread(srv)
    yield srv
    srv.shutdown()
    srv.server_close()
    predictor.close()
    thread.join(timeout=10)


def _conn(server):
    return http.client.HTTPConnection("127.0.0.1",
                                      server.server_address[1], timeout=150)


def _png_bytes(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_http_predict_json(server):
    body = _png_bytes(_img(128, 128, seed=11))
    c = _conn(server)
    c.request("POST", "/v1/predict", body=body,
              headers={"Content-Type": "application/octet-stream"})
    r = c.getresponse()
    assert r.status == 200
    payload = json.loads(r.read())
    assert payload["height"] == 128 and payload["width"] == 128
    assert payload["source_height"] == 128
    assert 0.0 <= payload["bark_percent"] <= 100.0
    assert payload["bark_area_mm2"] == pytest.approx(
        payload["class_pixels"][1] * 3.6 * 3.6)
    assert sum(payload["class_pixels"]) == 128 * 128
    assert payload["batch_images"] >= 1
    c.close()


def test_http_predict_mask_and_exclude(server):
    body = _png_bytes(_img(128, 128, seed=12))
    c = _conn(server)
    c.request("POST", "/v1/predict?format=mask", body=body)
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(r.read())))
    assert mask.shape == (128, 128)
    assert set(np.unique(mask)) <= {0, 127, 255}

    c.request("POST", "/v1/predict?format=mask&exclude_nodes=1", body=body)
    r = c.getresponse()
    excl = np.asarray(Image.open(io.BytesIO(r.read())))
    assert set(np.unique(excl)) <= {0, 127}
    np.testing.assert_array_equal(excl, np.where(mask == 255, 127, mask))
    c.close()


def test_http_predict_combined_figure(server):
    body = _png_bytes(_img(128, 128, seed=13))
    c = _conn(server)
    c.request("POST", "/v1/predict?format=combined&dpi=50", body=body)
    r = c.getresponse()
    assert r.status == 200
    fig = Image.open(io.BytesIO(r.read()))
    assert fig.size[0] > fig.size[1]  # side-by-side landscape layout
    c.close()


def test_http_preprocess_applied(server):
    """A square image with dark bands must be trimmed before prediction
    (reference models.py:191-201), visible in the returned height."""
    img = _img(128, 128, seed=14)
    img[:16] = 0
    img[-8:] = 0
    c = _conn(server)
    c.request("POST", "/v1/predict", body=_png_bytes(img))
    payload = json.loads(c.getresponse().read())
    assert payload["height"] == 128 - 16 - 8
    assert payload["source_height"] == 128
    c.close()


def test_http_health_stats_errors(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    health = json.loads(c.getresponse().read())
    assert health["ok"] is True and health["model"] == "fcn_resnet50"
    assert health["n_devices"] >= 1

    c.request("GET", "/v1/stats")
    stats = json.loads(c.getresponse().read())
    assert stats["served"] >= 1 and stats["errors"] == 0

    c.request("GET", "/nope")
    assert c.getresponse().status == 404
    c.request("POST", "/v1/nope", body=b"x")
    assert c.getresponse().status == 404

    c.request("POST", "/v1/predict", body=b"not an image")
    r = c.getresponse()
    assert r.status == 400
    assert "undecodable" in json.loads(r.read())["error"]

    c.request("POST", "/v1/predict?format=tiff", body=b"x")
    assert c.getresponse().status == 400

    c.request("POST", "/v1/predict")  # no body
    assert c.getresponse().status == 400
    c.close()


@pytest.mark.slow
def test_serving_soak_short(calc):
    """45 s soak (tools/serving_soak.py drives the 10-minute production
    variant): flat RSS, zero errors, telemetry adds up, batching engages
    under concurrent load. Small shapes keep the CPU-mesh step fast."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from serving_soak import run_soak

    report = run_soak(calc, seconds=45.0, clients=4,
                      heights=(64, 96, 128), widths=(64,),
                      max_wait_ms=10.0, rss_tolerance=0.15)
    assert report["violations"] == []
    assert report["served"] > 50
    assert report["errors"] == 0
    assert report["mean_batch"] > 1.0
    # this lane runs on the CPU mesh = clean PJRT, so the raw flat-RSS
    # invariant is in force (module docstring: the clean-platform lane
    # is the one that catches per-request leaks in our stack)
    assert report["platform_retention"]["clean_platform"]
