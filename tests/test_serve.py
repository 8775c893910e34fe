"""Serving endpoint: encode over HTTP matches the training-time export."""

import io
import json
import threading
import urllib.request

import pytest

import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training.learner import SRL4robotics


@pytest.fixture(scope="module")
def trained_srv_run(synthetic_dataset, tmp_path_factory):
    """ONE trained autoencoder shared by every serve test in this module
    (each used to train its own identical model — 3x the CPU time in a
    suite already flagged at ~14 min; review r3)."""
    ds = synthetic_dataset
    log = str(tmp_path_factory.mktemp("srv_shared") / "run")
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),), log_folder=log)
    learner = SRL4robotics(cfg, log_folder=log)
    learner.learn(ds)
    cfg.save(log)
    return log, learner.predict_states(ds)


def test_serve_encode_round_trip(synthetic_dataset, trained_srv_run):
    ds = synthetic_dataset
    log, exported = trained_srv_run

    from serve import build_server
    server = build_server(log, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            info = json.loads(r.read())
        assert info["state_dim"] == 4

        buf = io.BytesIO()
        np.save(buf, np.asarray(ds.frames[:5]))
        req = urllib.request.Request(f"{base}/encode", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            states = np.load(io.BytesIO(r.read()))
        assert states.shape == (5, 4)
        np.testing.assert_allclose(states, exported[:5], rtol=1e-4,
                                   atol=1e-5)

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(f"{base}/encode", data=b"junk",
                                     method="POST")
        try:
            urllib.request.urlopen(bad, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised

        # float payload -> 400 with a dtype message, NOT silently-truncated
        # garbage states with a 200 (review r2)
        fbuf = io.BytesIO()
        np.save(fbuf, np.asarray(ds.frames[:2], np.float32) / 255.0)
        freq = urllib.request.Request(f"{base}/encode", data=fbuf.getvalue(),
                                      method="POST")
        try:
            urllib.request.urlopen(freq, timeout=30)
            code, msg = 200, ""
        except urllib.error.HTTPError as e:
            code, msg = e.code, e.read().decode()
        assert code == 400 and "uint8" in msg
    finally:
        server.shutdown()
        server.server_close()


def test_serve_coalesced_concurrent_requests(synthetic_dataset,
                                             trained_srv_run):
    """--coalesce-ms groups concurrent requests into fewer device launches
    and every client still gets exactly its own rows back."""
    ds = synthetic_dataset
    log, exported = trained_srv_run

    from serve import build_server
    server = build_server(log, port=0, coalesce_ms=25.0)
    coalescer = server.coalescer
    assert coalescer is not None
    # count actual device launches by wrapping the real encoder
    real = coalescer.encoder
    calls = []

    class _Counting:
        cfg = real.cfg
        max_batch = real.max_batch

        def encode(self, obs):
            calls.append(len(obs))
            return real.encode(obs)

    coalescer.encoder = _Counting()

    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = {}

        def one(i):
            buf = io.BytesIO()
            np.save(buf, np.asarray(ds.frames[i]))
            req = urllib.request.Request(f"{base}/encode",
                                         data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=60) as r:
                results[i] = np.load(io.BytesIO(r.read()))

        threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i in range(8):
            np.testing.assert_allclose(results[i], exported[i], rtol=1e-4,
                                       atol=1e-5)
        # 8 concurrent single-frame requests must NOT cost 8 launches
        assert len(calls) < 8, calls
        assert sum(calls) == 8
    finally:
        server.shutdown()
        server.server_close()


def test_coalescer_rejects_bad_shape_individually(synthetic_dataset,
                                                  tmp_path):
    """A malformed request fails alone with ValueError; a concurrent good
    request in the same window still succeeds."""
    from serve import BatchCoalescer

    class _Enc:
        class cfg:
            img_height, img_width, n_channels = 8, 8, 3
        max_batch = 4
        def encode(self, obs):
            return np.ones((len(obs), 2), np.float32)

    co = BatchCoalescer(_Enc(), window_ms=20.0)
    try:
        good = np.zeros((8, 8, 3), np.uint8)
        bad = np.zeros((4, 4, 3), np.uint8)
        out = {}
        errs = {}

        def call(name, obs):
            try:
                out[name] = co.encode(obs)
            except ValueError as e:
                errs[name] = e

        ts = [threading.Thread(target=call, args=("good", good)),
              threading.Thread(target=call, args=("bad", bad))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert out["good"].shape == (2,)
        assert "bad" in errs
    finally:
        co.close()  # an un-closed coalescer leaks its worker + encoder


def test_coalescer_multirow_and_overflow_groups():
    """Batched requests keep their row order through a coalesced group, and
    a group larger than max_batch still returns every caller its own rows
    (StateEncoder chunks internally; the fake encoder tags rows by value)."""
    from serve import BatchCoalescer

    calls = []

    class _Enc:
        class cfg:
            img_height, img_width, n_channels = 8, 8, 3
        max_batch = 4

        def encode(self, obs):
            calls.append(len(obs))
            # state = mean pixel value of the row -> identifies the request
            return obs.reshape(len(obs), -1).mean(axis=1, dtype=np.float64)

    # window long enough that both requests land in ONE group even on a
    # loaded 1-core host — otherwise each 3-row request encodes alone
    # (3 <= max_batch) and the over-capacity path silently never runs
    co = BatchCoalescer(_Enc(), window_ms=300.0)
    try:
        out = {}

        def call(name, value, rows):
            obs = np.full((rows, 8, 8, 3), value, np.uint8)
            out[name] = co.encode(obs)

        # 3 + 3 rows (> max_batch 4) arriving in one window
        ts = [threading.Thread(target=call, args=("a", 10, 3)),
              threading.Thread(target=call, args=("b", 200, 3))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        np.testing.assert_array_equal(out["a"], [10.0] * 3)
        np.testing.assert_array_equal(out["b"], [200.0] * 3)
        # prove the over-max_batch group actually formed: ONE 6-row encode
        # (the StateEncoder chunks internally), not two 3-row groups
        assert calls == [6], calls
    finally:
        co.close()


def test_coalescer_group_failure_is_server_error():
    """Post-validation encode failures must NOT surface as ValueError (the
    handler maps ValueError/TypeError to 400-client-error; a sick encoder
    failing a whole group must stay a 500 so load balancers can see it)."""
    from serve import BatchCoalescer, CoalescedEncodeError

    class _Enc:
        class cfg:
            img_height, img_width, n_channels = 8, 8, 3
        max_batch = 4

        def encode(self, obs):
            raise ValueError("backend blew up mid-batch")

    co = BatchCoalescer(_Enc(), window_ms=5.0)
    try:
        with pytest.raises(CoalescedEncodeError, match="blew up"):
            co.encode(np.zeros((8, 8, 3), np.uint8))
    finally:
        co.close()


def test_coalescer_worker_survives_base_exception():
    """A BaseException (SystemExit-class) escaping the group encode must
    fail the caller and CLOSE the coalescer — not die silently and wedge
    every pending and future request in an unbounded done.wait()."""
    from serve import BatchCoalescer, CoalescedEncodeError

    class _Enc:
        class cfg:
            img_height, img_width, n_channels = 8, 8, 3
        max_batch = 4

        def encode(self, obs):
            raise SystemExit("deep library bailout")

    co = BatchCoalescer(_Enc(), window_ms=5.0)
    with pytest.raises(CoalescedEncodeError, match="bailout"):
        co.encode(np.zeros((8, 8, 3), np.uint8))
    # worker died with the BaseException; future requests must fail fast,
    # not enqueue onto a dead worker and block forever
    co._thread.join(5.0)
    assert not co._thread.is_alive()
    with pytest.raises(CoalescedEncodeError):
        co.encode(np.zeros((8, 8, 3), np.uint8))


def test_coalescer_close_stops_worker_and_rejects():
    from serve import BatchCoalescer, CoalescedEncodeError

    class _Enc:
        class cfg:
            img_height, img_width, n_channels = 8, 8, 3
        max_batch = 4

        def encode(self, obs):
            return np.ones((len(obs), 2), np.float32)

    co = BatchCoalescer(_Enc(), window_ms=5.0)
    assert co.encode(np.zeros((8, 8, 3), np.uint8)).shape == (2,)
    co.close()
    assert not co._thread.is_alive()
    with pytest.raises(CoalescedEncodeError):
        co.encode(np.zeros((8, 8, 3), np.uint8))
    co.close()  # idempotent


def test_serve_backend_failure_is_500_without_coalescer(trained_srv_run,
                                                        monkeypatch):
    """Geometry is validated in the handler, so a ValueError escaping the
    encoder on the DEFAULT (lock) path is a server fault -> 500, never a
    400 that blinds load balancers (round-3 review, final sweep)."""
    import urllib.error

    log, _ = trained_srv_run

    from serve import build_server
    server = build_server(log, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(obs):
            buf = io.BytesIO()
            np.save(buf, obs)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/encode", data=buf.getvalue())
            try:
                return urllib.request.urlopen(req, timeout=30).status
            except urllib.error.HTTPError as e:
                return e.code

        assert post(np.zeros((7, 7, 3), np.uint8)) == 400  # client geometry
        from srl_zoo_tpu.inference import StateEncoder
        monkeypatch.setattr(
            StateEncoder, "encode",
            lambda self, obs: (_ for _ in ()).throw(
                ValueError("backend exploded")))
        assert post(np.zeros((32, 32, 3), np.uint8)) == 500  # server fault
    finally:
        server.shutdown()
        server.server_close()


def test_state_encoder_float32_and_empty_batch(synthetic_dataset, tmp_path):
    """encode() honors its float32 contract for --dtype bfloat16 models
    (torch.from_numpy rejects ml_dtypes.bfloat16) and returns a well-formed
    (0, state_dim) array for an empty batch instead of crashing."""
    import train as train_cli
    from srl_zoo_tpu.inference import StateEncoder

    ds = synthetic_dataset
    log = str(tmp_path / "bf16_run")
    train_cli.main(["--data-folder", ds.data_folder, "--losses",
                    "autoencoder", "--epochs", "1", "--state-dim", "4",
                    "-bs", "16", "--dtype", "bfloat16", "--log-folder", log,
                    "--no-display-plots"])
    enc = StateEncoder.load(log, max_batch=8)
    obs = np.zeros((3, 32, 32, 3), np.uint8)
    states = enc.encode(obs)
    assert states.dtype == np.float32 and states.shape == (3, 4)
    empty = enc.encode(np.zeros((0, 32, 32, 3), np.uint8))
    assert empty.dtype == np.float32 and empty.shape == (0, 4)
