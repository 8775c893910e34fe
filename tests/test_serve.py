"""Serving endpoint: encode over HTTP matches the training-time export."""

import io
import json
import threading
import urllib.request

import numpy as np

from srl_zoo_tpu.config import SRLConfig
from srl_zoo_tpu.training.learner import SRL4robotics


def test_serve_encode_round_trip(synthetic_dataset, tmp_path):
    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    log_folder=str(tmp_path / "srv"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds)
    cfg.save(cfg.log_folder)
    exported = learner.predict_states(ds)

    from serve import build_server
    server = build_server(cfg.log_folder, port=0)  # ephemeral port
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
