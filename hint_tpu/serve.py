"""Inference serving: checkpoint-backed sample / log-prob endpoints.

The reference has no serving story (models are used inside the training
scripts only). Here ``InferenceService`` wraps a trained checkpoint with
jit-compiled, shape-bucketed endpoints so arbitrary request sizes never
trigger recompilation (requests are padded up to the nearest bucket and
sliced), and ``serve()`` exposes them over a minimal JSON/HTTP API:

    POST /sample   {"n": 100, "y_target": [..]?, "seed": 0?}  -> {"x": [[..]]}
    POST /log_prob {"x": [[..]], "y": [[..]]?}                -> {"log_prob": [..]}
    GET  /health                                              -> {"status": "ok"}

CLI: ``python -m hint_tpu serve --config ... --ckpt run.npz --port 8000``.
"""

from __future__ import annotations

import json
import math
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

LOG_2PI = math.log(2.0 * math.pi)


class InferenceService:
    def __init__(
        self,
        cfg,
        params,
        buckets: Sequence[int] = (64, 256, 1024, 4096),
        compute_dtype: str = "float32",
        impl: str = "levelwise",
    ):
        import jax
        import jax.numpy as jnp

        from hint_tpu.models.flow import TwoLaneFlow

        self.cfg = cfg
        self.model = cfg.build_model(compute_dtype=compute_dtype, impl=impl)
        self.params = params
        self.buckets = tuple(sorted(buckets))
        self._two_lane = isinstance(self.model, TwoLaneFlow)
        self._jax = jax
        self._jnp = jnp

        model = self.model

        if self._two_lane:
            def _sample(params, key, y):
                from hint_tpu.evaluation.sampling import sample_conditional_hint

                kz, kx = jax.random.split(key)
                return sample_conditional_hint(model, params, y, kz, kx)

            def _log_prob(params, x, y):
                z_y, z_x, ld_y, ld_x = model.forward(params, y, x)
                z = jnp.concatenate([z_x, z_y], axis=-1)
                d = z.shape[-1]
                return -(0.5 * jnp.sum(z**2, axis=-1) + 0.5 * d * LOG_2PI) + ld_y + ld_x
        else:
            def _sample(params, key, y):
                z = jax.random.normal(key, (y.shape[0], model.dim))
                if cfg.is_conditional:
                    x, _ = model.inverse(params, z, y)
                else:
                    x, _ = model.inverse(params, z)
                return x

            def _log_prob(params, x, y):
                if cfg.is_conditional:
                    z, ld = model.forward(params, x, y)
                else:
                    z, ld = model.forward(params, x)
                d = z.shape[-1]
                return -(0.5 * jnp.sum(z**2, axis=-1) + 0.5 * d * LOG_2PI) + ld

        # the server handles requests on multiple threads; device dispatch is
        # serialized per jit call (not per request) so a paged 65k-sample
        # request can't starve a small log_prob — and /health, which never
        # touches the device, needs no lock at all
        self._device_lock = threading.Lock()
        self._jit_sample = jax.jit(_sample)
        self._jit_log_prob = jax.jit(_log_prob)

    def _sample_fn(self, params, key, y):
        with self._device_lock:
            return self._jit_sample(params, key, y)

    def _log_prob_fn(self, params, x, y):
        with self._device_lock:
            return self._jit_log_prob(params, x, y)

    # -- helpers -------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return int(2 ** math.ceil(math.log2(max(n, 1))))

    def _y_for(self, n: int, y_target) -> np.ndarray:
        dy = self.cfg.ndim_y if self.cfg.is_conditional else 0
        if dy == 0:
            return np.zeros((n, 0), np.float32)
        if y_target is None:
            y_target = self.cfg.vis_y_target
        if y_target is None:
            raise ValueError("conditional model: y_target required")
        y = np.asarray(y_target, np.float32).reshape(-1)
        if y.shape[0] != dy:
            raise ValueError(f"y_target must have {dy} entries")
        return np.broadcast_to(y[None, :], (n, dy)).copy()

    def warmup(self) -> None:
        """Compile every bucket ahead of traffic (request size == bucket size,
        so each bucket's program actually compiles)."""
        for b in self.buckets:
            self.sample(b, seed=0)
            self.log_prob(np.zeros((b, self.cfg.ndim_x), np.float32))

    # -- endpoints -----------------------------------------------------------

    def sample(self, n: int, y_target=None, seed: Optional[int] = None) -> np.ndarray:
        """``seed=None`` (default) draws fresh per-request entropy; pass a
        seed to opt into determinism.

        Requests larger than the largest bucket are served by paging over
        the largest (already-compiled) bucket and concatenating — a huge n
        never triggers a fresh XLA compile or a device allocation beyond
        one bucket."""
        import os as _os

        jax = self._jax
        if seed is None:
            seed = int.from_bytes(_os.urandom(4), "little")
        b_max = self.buckets[-1]
        if n <= b_max:
            b = self._bucket(n)
            y = self._y_for(b, y_target)
            x = self._sample_fn(self.params, jax.random.PRNGKey(seed), y)
            return np.asarray(x)[:n]
        n_chunks = -(-n // b_max)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_chunks)
        y = self._y_for(b_max, y_target)
        out = np.concatenate(
            [np.asarray(self._sample_fn(self.params, k, y)) for k in keys]
        )
        return out[:n]

    def log_prob(self, x: np.ndarray, y: Optional[np.ndarray] = None) -> np.ndarray:
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        b = self._bucket(n)
        xp = np.zeros((b, x.shape[1]), np.float32)
        xp[:n] = x
        if y is not None:
            yp = np.zeros((b, np.asarray(y).shape[1]), np.float32)
            yp[:n] = y
        else:
            yp = self._y_for(b, None) if self.cfg.is_conditional else np.zeros((b, 0), np.float32)
        lp = self._log_prob_fn(self.params, xp, yp)
        return np.asarray(lp)[:n]

    # -- constructors ----------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, config_name: str, ckpt_path: str, **kw) -> "InferenceService":
        import jax

        from hint_tpu.configs import get_config
        from hint_tpu.train import checkpoint

        cfg = get_config(config_name)
        trainer = cfg.make_trainer()
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = checkpoint.load_npz(ckpt_path, template, model=trainer.model)
        return cls(cfg, state.params, **kw)


# /sample HTTP cap: paging (see InferenceService.sample) makes any n cheap to
# *compute*, but the JSON response is O(n * ndim_x) host memory per handler
# thread, so one request must stay bounded. Page client-side for more.
MAX_HTTP_SAMPLE_N = 65_536


def make_server(service: InferenceService, host: str = "127.0.0.1", port: int = 8000):
    """Build (but don't start) the HTTP server — separable for tests.

    Threaded: each request gets its own handler thread, so /health (no
    device work) answers immediately even while a large /sample is paging
    through the chip; concurrent compute requests serialize on the
    service's per-jit-call device lock."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok", "config": service.cfg.name})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/sample":
                    n = int(req.get("n", 1))
                    if n < 1 or n > MAX_HTTP_SAMPLE_N:
                        raise ValueError(f"n out of range [1, {MAX_HTTP_SAMPLE_N}]")
                    seed = req.get("seed")
                    x = service.sample(n, req.get("y_target"),
                                       None if seed is None else int(seed))
                    self._reply(200, {"x": x.tolist()})
                elif self.path == "/log_prob":
                    x = np.asarray(req["x"], np.float32)
                    if x.ndim != 2 or x.shape[1] != service.cfg.ndim_x:
                        raise ValueError(f"x must be (n, {service.cfg.ndim_x})")
                    y = req.get("y")
                    lp = service.log_prob(x, None if y is None else np.asarray(y, np.float32))
                    self._reply(200, {"log_prob": lp.tolist()})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # report, keep serving
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True  # in-flight handlers don't block shutdown
    return server


def serve(service: InferenceService, host: str = "127.0.0.1", port: int = 8000):
    """Blocking multi-threaded HTTP server over the service.

    Shuts down cleanly on SIGINT/SIGTERM (finishes the accept loop and
    returns instead of dying mid-socket)."""
    import signal

    httpd = make_server(service, host, port)

    def _stop(signum, frame):
        # shutdown() must run off the serve_forever thread
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, _stop)
        except ValueError:  # not the main thread (embedded use) — skip
            pass
    print(f"serving {service.cfg.name} on http://{host}:{httpd.server_port}")
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    print("server stopped")
