"""Serving-layer tests: bucket padding/slicing, log_prob-vs-forward
consistency, large-n paging, and a loopback HTTP round-trip.

The serving layer is new capability over the reference (which has no
inference story — models only run inside its training scripts), so these
tests pin our own contract: arbitrary request sizes never recompile, padding
never leaks into results, and log_prob is exactly the flow NLL."""

import dataclasses
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hint_tpu.configs import get_config
from hint_tpu.serve import MAX_HTTP_SAMPLE_N, InferenceService, make_server

LOG_2PI = float(np.log(2 * np.pi))


def _shrunk(name, **overrides):
    cfg = get_config(name)
    return dataclasses.replace(cfg, **overrides)


@pytest.fixture(scope="module")
def svc():
    """Small unconditional HINT service with tiny buckets."""
    cfg = _shrunk("lens_shape.unconditional_hint_1_full", hidden=16, c_internal=(16, 8))
    model = cfg.build_model()
    params = model.init(jax.random.PRNGKey(0))
    return InferenceService(cfg, params, buckets=(4, 8))


@pytest.fixture(scope="module")
def svc_two_lane():
    cfg = _shrunk(
        "lens_shape.conditional_hint_1_full", hidden=8, c_internal=(8, 4), hidden_y=4
    )
    model = cfg.build_model()
    params = model.init(jax.random.PRNGKey(1))
    return InferenceService(cfg, params, buckets=(4,))


def test_bucket_selection(svc):
    assert svc._bucket(1) == 4
    assert svc._bucket(4) == 4
    assert svc._bucket(5) == 8
    assert svc._bucket(8) == 8


@pytest.mark.parametrize("n", [1, 4, 5, 8])
def test_sample_shapes_at_bucket_boundaries(svc, n):
    x = svc.sample(n, seed=7)
    assert x.shape == (n, svc.cfg.ndim_x)
    assert np.all(np.isfinite(x))


def test_sample_paging_beyond_max_bucket(svc):
    """n > max bucket pages over the largest compiled bucket — shape is
    exact and chunks carry independent entropy."""
    n = 19  # 3 pages of 8
    x = svc.sample(n, seed=3)
    assert x.shape == (n, svc.cfg.ndim_x)
    assert np.all(np.isfinite(x))
    # chunk keys differ, so pages are not copies of each other
    assert not np.allclose(x[:8], x[8:16])


def test_sample_seed_determinism(svc):
    a = svc.sample(5, seed=11)
    b = svc.sample(5, seed=11)
    c = svc.sample(5, seed=12)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_log_prob_matches_forward_unconditional(svc):
    """log_prob must equal the model-forward NLL, and padding rows must not
    leak into the first n results (n=3 inside a 4-bucket)."""
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, svc.cfg.ndim_x)))
    lp = svc.log_prob(x)
    z, ld = svc.model.forward(svc.params, jnp.asarray(x))
    expected = -(0.5 * np.sum(np.asarray(z) ** 2, axis=1) + 0.5 * z.shape[1] * LOG_2PI) + np.asarray(ld)
    np.testing.assert_allclose(lp, expected, rtol=1e-5, atol=1e-5)
    # same x padded into a larger batch gives identical answers
    lp2 = svc.log_prob(np.concatenate([x, x[:1]]))[:3]
    np.testing.assert_allclose(lp, lp2, rtol=1e-5, atol=1e-5)


def test_log_prob_two_lane_matches_forward(svc_two_lane):
    svc = svc_two_lane
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (2, svc.cfg.ndim_x)))
    y = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (2, svc.cfg.ndim_y)))
    lp = svc.log_prob(x, y)
    z_y, z_x, ld_y, ld_x = svc.model.forward(svc.params, jnp.asarray(y), jnp.asarray(x))
    z = np.concatenate([np.asarray(z_x), np.asarray(z_y)], axis=1)
    expected = -(0.5 * np.sum(z**2, axis=1) + 0.5 * z.shape[1] * LOG_2PI) + np.asarray(
        ld_y
    ) + np.asarray(ld_x)
    np.testing.assert_allclose(lp, expected, rtol=1e-5, atol=1e-5)


def test_two_lane_sample_path(svc_two_lane):
    x = svc_two_lane.sample(3, y_target=(2.0, -1.0), seed=5)
    assert x.shape == (3, svc_two_lane.cfg.ndim_x)
    assert np.all(np.isfinite(x))


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_roundtrip(svc):
    httpd = make_server(svc, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_port
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["config"] == svc.cfg.name

        code, out = _post(port, "/sample", {"n": 3, "seed": 1})
        assert code == 200
        x = np.asarray(out["x"])
        assert x.shape == (3, svc.cfg.ndim_x)

        code, out = _post(port, "/log_prob", {"x": x.tolist()})
        assert code == 200
        np.testing.assert_allclose(out["log_prob"], svc.log_prob(x), rtol=1e-5, atol=1e-5)

        # error paths stay 400, keep serving
        code, out = _post(port, "/sample", {"n": 0})
        assert code == 400 and "error" in out
        code, out = _post(port, "/sample", {"n": MAX_HTTP_SAMPLE_N + 1})
        assert code == 400 and "error" in out
        code, out = _post(port, "/log_prob", {"x": [[1.0, 2.0]]})
        assert code == 400 and "error" in out
        code, out = _post(port, "/nope", {})
        assert code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def _slowed(svc, monkeypatch, per_call=0.05):
    """Make each device call take >= per_call seconds so request overlap is
    deterministic on fast hosts."""
    import time as _time

    real = svc._jit_sample

    def slow(params, key, y):
        _time.sleep(per_call)
        return real(params, key, y)

    monkeypatch.setattr(svc, "_jit_sample", slow)


def test_health_answers_during_long_sample(svc, monkeypatch):
    """/health (no device work) must respond while a paged /sample is still
    in flight — the server is threaded and the device lock is per jit call."""
    _slowed(svc, monkeypatch)
    httpd = make_server(svc, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_port
        result = {}

        def long_sample():
            result["resp"] = _post(port, "/sample", {"n": 100, "seed": 1})  # 13 pages

        t = threading.Thread(target=long_sample)
        t.start()
        import time as _time

        _time.sleep(0.1)  # let the sample start paging
        assert t.is_alive(), "sample finished too fast to test overlap"
        t0 = _time.perf_counter()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5) as r:
            assert json.loads(r.read())["status"] == "ok"
        health_latency = _time.perf_counter() - t0
        assert t.is_alive(), "sample finished before health returned"
        t.join(timeout=30)
        code, out = result["resp"]
        assert code == 200 and np.asarray(out["x"]).shape == (100, svc.cfg.ndim_x)
        # health answered in a fraction of the sample's 13*0.05s device time
        assert health_latency < 0.5
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_three_concurrent_clients(svc):
    """Concurrent compute requests serialize on the device lock and all
    succeed with per-seed-correct results."""
    httpd = make_server(svc, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_port
        results = [None] * 3

        def client(i):
            results[i] = _post(port, "/sample", {"n": 6, "seed": 100 + i})

        threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, (code, out) in enumerate(results):
            assert code == 200
            np.testing.assert_array_equal(
                np.asarray(out["x"], np.float32),
                svc.sample(6, seed=100 + i).astype(np.float32),
            )
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_graceful_shutdown_finishes_inflight_request(svc, monkeypatch):
    """shutdown() during an in-flight request stops the accept loop but the
    in-flight handler still completes and returns 200."""
    _slowed(svc, monkeypatch)
    httpd = make_server(svc, port=0)
    serve_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    serve_thread.start()
    port = httpd.server_port
    result = {}

    def long_sample():
        result["resp"] = _post(port, "/sample", {"n": 64, "seed": 2})  # 8 pages

    t = threading.Thread(target=long_sample)
    t.start()
    import time as _time

    _time.sleep(0.1)
    assert t.is_alive()
    httpd.shutdown()  # returns once the accept loop exits
    serve_thread.join(timeout=10)
    assert not serve_thread.is_alive()
    t.join(timeout=30)
    code, out = result["resp"]
    assert code == 200 and np.asarray(out["x"]).shape == (64, svc.cfg.ndim_x)
    httpd.server_close()
