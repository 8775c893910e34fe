#!/usr/bin/env python
"""Serve a trained SRL encoder over HTTP (production hand-off).

Downstream RL or robot controllers that don't embed JAX can get states over
the wire: POST raw npy bytes of a uint8 observation (H, W, C) or batch
(B, H, W, C) to ``/encode`` and receive npy bytes of float32 states. The
encoder is the jitted fixed-batch StateEncoder (no per-request recompiles);
requests are serialized through a lock (one accelerator, one queue).

  python serve.py --log-folder logs/<run> --port 8080
  # client:
  #   buf = io.BytesIO(); np.save(buf, obs)
  #   states = np.load(io.BytesIO(requests.post(url, data=buf.getvalue()).content))

GET /healthz returns run metadata. Stdlib-only (http.server); for heavy fleets
put it behind any standard HTTP load balancer, one process per chip.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class CoalescedEncodeError(RuntimeError):
    """A coalesced group's shared encode failed server-side.

    Raised (wrapping the original) instead of re-raising the worker's
    exception directly: every row was geometry-validated BEFORE enqueue, so
    anything escaping the group encode — even a ValueError/TypeError from
    np.concatenate or the jitted apply — is OUR fault, and must not fall
    into the handler's (ValueError, TypeError) -> 400 client-error branch
    (a 400 here would blind load balancers to a genuinely sick server)."""


class BatchCoalescer:
    """Group concurrent /encode requests into one device batch.

    With the plain lock, N concurrent clients run the chip at batch 1, N
    times (the jitted encoder pads each call to max_batch anyway — (N-1)/N
    of every launch is wasted padding). The coalescer holds the first
    request for up to ``window_ms`` while more arrive, concatenates up to
    ``max_batch`` rows, encodes ONCE, and hands each caller its slice.
    Single-client latency cost is bounded by window_ms; zero when a full
    batch forms sooner. Thread-safe; used instead of the lock when
    --coalesce-ms > 0."""

    def __init__(self, encoder, window_ms: float = 2.0):
        self.encoder = encoder
        self.window_s = window_ms / 1000.0
        self.max_rows = encoder.max_batch
        self._lock = threading.Lock()
        self._queue: list = []  # [(obs_batch, event, slot_dict)]
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="srl-serve-coalescer")
        self._wake = threading.Event()
        self._thread.start()

    def close(self, timeout: float = 5.0) -> None:
        """Stop the worker thread; fail any still-queued requests.

        Without this the daemon worker (and the StateEncoder it pins —
        jitted fns + params) outlives server_close(), leaking one thread +
        model per retired server in long-lived processes."""
        with self._lock:
            self._closed = True
            pending, self._queue = self._queue, []
        self._wake.set()
        for _, done, slot in pending:
            slot["err"] = CoalescedEncodeError("server shutting down")
            done.set()
        self._thread.join(timeout)

    def encode(self, obs: np.ndarray) -> np.ndarray:
        """Validate + enqueue one request; blocks until its states arrive."""
        single = obs.ndim == 3
        batch = obs[None] if single else obs
        # validate geometry HERE so one malformed request fails alone,
        # never the whole coalesced group
        expected = (self.encoder.cfg.img_height, self.encoder.cfg.img_width,
                    self.encoder.cfg.n_channels)
        if batch.ndim != 4 or batch.shape[1:] != expected:
            raise ValueError(
                f"expected uint8 observations of shape {expected} "
                f"(or batched (B, *{expected})), got {obs.shape}")
        done = threading.Event()
        slot: dict = {}
        with self._lock:
            if self._closed:
                raise CoalescedEncodeError("coalescer is closed")
            self._queue.append((np.asarray(batch, np.uint8), done, slot))
        self._wake.set()
        done.wait()
        if "err" in slot:
            err = slot["err"]
            if isinstance(err, CoalescedEncodeError):
                raise err
            raise CoalescedEncodeError(
                f"group encode failed: {type(err).__name__}: {err}") from err
        states = slot["states"]
        return states[0] if single else states

    def _run(self):
        while True:
            self._wake.wait()
            with self._lock:
                if self._closed:
                    return
                if not self._queue:
                    self._wake.clear()
                    continue
            # first request opens the window
            deadline = time.monotonic() + self.window_s
            while time.monotonic() < deadline:
                with self._lock:
                    if sum(len(b) for b, _, _ in self._queue) >= self.max_rows:
                        break
                time.sleep(self.window_s / 10.0)
            with self._lock:
                group, self._queue = self._queue, []
                if not self._closed:  # keep close()'s wake-up visible
                    self._wake.clear()  # queue drained; next append re-sets
            if not group:
                continue
            try:
                stacked = np.concatenate([b for b, _, _ in group])
                states = self.encoder.encode(stacked)
                off = 0
                for b, done, slot in group:
                    slot["states"] = states[off:off + len(b)]
                    off += len(b)
                    done.set()
            except BaseException as e:
                # deliver the failure to the WHOLE group: a worker that died
                # without setting the events would wedge every pending and
                # future request forever (encode()'s done.wait() is
                # unbounded by design — requests must not time out under
                # device compile stalls)
                for _, done, slot in group:
                    slot["err"] = e
                    done.set()
                if not isinstance(e, Exception):
                    # SystemExit/KeyboardInterrupt-class escaping library
                    # code: close the coalescer so future encodes raise
                    # instead of enqueueing onto a dead worker, fail the
                    # queue, and exit (the error already reached every
                    # caller via its slot; re-raising in a daemon thread
                    # reaches only the threading excepthook)
                    with self._lock:
                        self._closed = True
                        pending, self._queue = self._queue, []
                    for _, done, slot in pending:
                        slot["err"] = CoalescedEncodeError(
                            f"coalescer worker died: {e!r}")
                        done.set()
                    return


def make_handler(encoder, info: dict, max_body_mb: int = 256,
                 coalescer: "BatchCoalescer | None" = None):
    lock = threading.Lock()
    max_body = max_body_mb * 1024 * 1024

    def run_encode(obs):
        if coalescer is not None:
            return coalescer.encode(obs)
        with lock:
            return encoder.encode(obs)

    class Handler(BaseHTTPRequestHandler):
        timeout = 60  # a stalled client must not pin a handler thread

        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, json.dumps(info).encode(),
                            "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/encode":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > max_body:
                    # bound memory: one oversized request must not OOM the
                    # server (requests serialize through the encoder lock)
                    self._reply(413, f"body {length} B exceeds the "
                                     f"{max_body_mb} MiB limit".encode(),
                                "text/plain")
                    return
                obs = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
                if obs.dtype != np.uint8:
                    # np.asarray(..., uint8) would truncate float images to
                    # ~all-zeros and return garbage states with a 200
                    self._reply(400, f"expected uint8 pixels, got "
                                     f"{obs.dtype}".encode(), "text/plain")
                    return
                # geometry validated HERE, on both the lock and coalescer
                # paths: after this point any ValueError/TypeError escaping
                # the encoder is a SERVER fault and must be a 500, or load
                # balancers can't see a sick server (round-3 review — the
                # old catch classified backend ValueErrors as 400s)
                expected = (encoder.cfg.img_height, encoder.cfg.img_width,
                            encoder.cfg.n_channels)
                if obs.shape != expected and (
                        obs.ndim != 4 or obs.shape[1:] != expected):
                    self._reply(400, f"expected uint8 observations of shape "
                                     f"{expected} (or batched (B, "
                                     f"*{expected})), got "
                                     f"{obs.shape}".encode(), "text/plain")
                    return
            except Exception as e:  # malformed payload: the client's fault
                self._reply(400, str(e).encode(), "text/plain")
                return
            try:
                states = run_encode(obs)
                buf = io.BytesIO()
                np.save(buf, np.asarray(states, np.float32))
                self._reply(200, buf.getvalue())
            except Exception as e:  # encoder/backend failure: OUR fault —
                self._reply(500, str(e).encode(), "text/plain")  # let LBs see it

    return Handler


def build_server(log_folder: str, host: str = "127.0.0.1", port: int = 8080,
                 max_batch: int = 32,
                 max_body_mb: int = 256,
                 coalesce_ms: float = 0.0) -> ThreadingHTTPServer:
    from srl_zoo_tpu.inference import StateEncoder

    encoder = StateEncoder.load(log_folder, max_batch=max_batch)
    cfg = encoder.cfg
    info = {"log_folder": log_folder, "state_dim": cfg.state_dim,
            "model_type": cfg.model_type,
            "img_shape": [cfg.img_height, cfg.img_width, cfg.n_channels],
            "losses": dict(cfg.losses)}
    # warm the jit so the first request isn't a compile
    encoder.encode(np.zeros((cfg.img_height, cfg.img_width, cfg.n_channels),
                            np.uint8))
    coalescer = BatchCoalescer(encoder, coalesce_ms) if coalesce_ms > 0 \
        else None

    class _Server(ThreadingHTTPServer):
        def server_close(self):  # stop the coalescer worker with the server
            if coalescer is not None:
                coalescer.close()
            super().server_close()

    server = _Server(
        (host, port), make_handler(encoder, info, max_body_mb, coalescer))
    server.coalescer = coalescer  # introspectable (tests, ops tooling)
    return server


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    p = argparse.ArgumentParser(description="Serve a trained SRL encoder")
    p.add_argument("--log-folder", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-body-mb", type=int, default=256,
                   help="Reject request bodies over this size (HTTP 413)")
    p.add_argument("--coalesce-ms", type=float, default=0.0,
                   help="Group concurrent requests arriving within this "
                        "window into one device batch (up to --max-batch "
                        "rows). 0 = off. Under N concurrent clients this "
                        "turns N batch-1 launches into one full-batch "
                        "launch; single-client latency grows by at most "
                        "the window")
    args = p.parse_args(argv)
    from srl_zoo_tpu.utils.platform import require_backend_or_die
    require_backend_or_die()
    server = build_server(args.log_folder, args.host, args.port,
                          args.max_batch, args.max_body_mb,
                          args.coalesce_ms)
    print(f"Serving {args.log_folder} on http://{args.host}:{args.port} "
          "(POST /encode, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
