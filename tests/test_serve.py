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
