"""Serving surface tests (serve.py): checkpoint-backed stateful streaming
predictor + HTTP front end. The key contract: per-session recurrent state is
carried across requests, so K separate 1-frame predictions equal one
K-frame prediction (and equal the offline rollout path)."""

import http.client
import json
import os

import numpy as np
import pytest

from unet_convlstm_tpu.cli import main
from unet_convlstm_tpu.serve import StreamingPredictor, serve_http


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("serve")


@pytest.fixture(scope="module")
def checkpoint(workdir):
    npz = str(workdir / "mm.npz")
    main(["gen-mnist", "--out", npz, "--seq-len", "3",
          "--num-samples", "8", "--image-size", "32",
          "--num-digits", "1", "--seed", "0", "--xy"])
    ckpt_dir = str(workdir / "ckpts")
    cfg = {"npz_path": npz, "batch_size": 4, "epochs": 1,
           "lr": 1e-3, "checkpoint_dir": ckpt_dir, "mesh_data": 1,
           "model": {"type": "custom", "base_ch": 4,
                     "use_skip_lstm": True, "lstm_layers": 1}}
    cfg_path = str(workdir / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main(["train", "--config", cfg_path])
    return os.path.join(ckpt_dir, "custom_best"), npz


def test_streaming_state_carries_across_requests(checkpoint):
    ckpt, npz = checkpoint
    pred = StreamingPredictor(ckpt)
    data = np.load(npz)
    x = np.ascontiguousarray(
        np.moveaxis(data["X"][:2], 2, -1)).astype(np.float32)  # [2,3,32,32,2]

    # one 3-frame request
    sid_a = pred.open_session(2, 32, 32)
    y_all = pred.predict(sid_a, x)
    assert y_all.shape == (2, 3, 32, 32, 1)

    # three 1-frame requests against a fresh session
    sid_b = pred.open_session(2, 32, 32)
    parts = [pred.predict(sid_b, x[:, t:t + 1]) for t in range(3)]
    y_steps = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(y_steps, y_all, rtol=1e-4, atol=1e-4)

    info = pred.session_info(sid_b)
    assert info["frames_seen"] == 3
    assert pred.close_session(sid_b)
    with pytest.raises(KeyError):
        pred.predict(sid_b, x[:, :1])


def test_predictor_validates_geometry(checkpoint):
    ckpt, _ = checkpoint
    pred = StreamingPredictor(ckpt)
    sid = pred.open_session(1, 32, 32)
    with pytest.raises(ValueError):
        pred.predict(sid, np.zeros((1, 1, 16, 16, 2), np.float32))
    with pytest.raises(ValueError):
        pred.predict(sid, np.zeros((1, 32, 32, 2), np.float32))
    # T=0 and wrong channel count are CLIENT errors too — they must raise
    # ValueError here (mapped to HTTP 400), not detonate inside the jitted
    # step as a 500 server fault.
    with pytest.raises(ValueError, match="time step"):
        pred.predict(sid, np.zeros((1, 0, 32, 32, 2), np.float32))
    with pytest.raises(ValueError, match="channels"):
        pred.predict(sid, np.zeros((1, 1, 32, 32, 5), np.float32))


def test_http_server_roundtrip(checkpoint):
    ckpt, npz = checkpoint
    pred = StreamingPredictor(ckpt)
    server = serve_http(pred, "127.0.0.1", 0)
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"

        conn.request("POST", "/v1/session",
                     body=json.dumps({"batch": 1, "height": 32,
                                      "width": 32}))
        sid = json.loads(conn.getresponse().read())["session_id"]

        data = np.load(npz)
        x = np.ascontiguousarray(
            np.moveaxis(data["X"][:1, :2], 2, -1)).astype("<f4")
        conn.request("POST", f"/v1/predict/{sid}", body=x.tobytes(),
                     headers={"X-Shape": ",".join(map(str, x.shape))})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        shape = tuple(int(v) for v in r.getheader("X-Shape").split(","))
        y = np.frombuffer(r.read(), dtype="<f4").reshape(shape)
        assert shape == (1, 2, 32, 32, 1)
        assert np.isfinite(y).all()

        # matches the in-process engine exactly (fresh session, same input)
        sid2 = pred.open_session(1, 32, 32)
        y_ref = pred.predict(sid2, x.astype(np.float32))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)

        conn.request("GET", f"/v1/session/{sid}")
        assert json.loads(conn.getresponse().read())["frames_seen"] == 2

        conn.request("DELETE", f"/v1/session/{sid}")
        assert json.loads(conn.getresponse().read())["closed"] is True

        conn.request("POST", f"/v1/predict/{sid}", body=x.tobytes(),
                     headers={"X-Shape": ",".join(map(str, x.shape))})
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()


def test_concurrent_sessions_race_free(checkpoint):
    """Race detection: N threads stream interleaved 1-frame requests into
    their own sessions concurrently. Each session's streamed outputs must
    equal the sequential single-request reference bit-for-bit level —
    proving the device lock serializes chip dispatch and the per-session
    locks keep each recurrent state consistent under interleaving."""
    import threading

    ckpt, npz = checkpoint
    pred = StreamingPredictor(ckpt)
    data = np.load(npz)
    x_all = np.ascontiguousarray(
        np.moveaxis(data["X"][:4], 2, -1)).astype(np.float32)  # [4,3,32,32,2]
    T = x_all.shape[1]

    # sequential references, one whole-sequence request per stream
    refs = []
    for i in range(4):
        sid = pred.open_session(1, 32, 32)
        refs.append(pred.predict(sid, x_all[i:i + 1]))
        pred.close_session(sid)

    results = [None] * 4
    errors = []
    barrier = threading.Barrier(4)

    def stream(i):
        try:
            sid = pred.open_session(1, 32, 32)
            barrier.wait(timeout=120)   # maximize interleaving
            parts = [pred.predict(sid, x_all[i:i + 1, t:t + 1])
                     for t in range(T)]
            results[i] = np.concatenate(parts, axis=1)
            assert pred.session_info(sid)["frames_seen"] == T
            pred.close_session(sid)
        except Exception as e:  # pragma: no cover - surfaced via errors
            errors.append((i, e))

    threads = [threading.Thread(target=stream, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    for i in range(4):
        np.testing.assert_allclose(results[i], refs[i],
                                   rtol=1e-5, atol=1e-5)


def test_http_malformed_requests_are_400(checkpoint):
    """Missing body fields / headers are client errors (400), not 404 —
    404 is reserved for unknown sessions and routes."""
    ckpt, _ = checkpoint
    pred = StreamingPredictor(ckpt)
    server = serve_http(pred, "127.0.0.1", 0)
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/session",
                     body=json.dumps({"batch": 1, "height": 32}))
        r = conn.getresponse()
        assert r.status == 400
        assert "width" in json.loads(r.read())["error"]
        conn.request("POST", "/v1/predict/nosuch", body=b"")
        r = conn.getresponse()
        assert r.status == 400                     # no X-Shape header
        r.read()
        # keep-alive survives an error reply WITH an unread body: the
        # handler must drain rfile before answering, or the next request
        # on the reused connection parses the leftover bytes as its
        # request line
        conn.request("POST", "/v1/predict/nosuch",
                     body=np.zeros(16, "<f4").tobytes())
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"
        # query strings must not 404 a valid route
        conn.request("POST", "/v1/session",
                     body=json.dumps({"batch": 1, "height": 32,
                                      "width": 32}))
        sid = json.loads(conn.getresponse().read())["session_id"]
        conn.request("GET", f"/v1/session/{sid}?trace=1")
        r = conn.getresponse()
        assert r.status == 200
        r.read()
    finally:
        server.shutdown()


def test_session_state_dtypes_match_step_output(checkpoint):
    """open_session aligns the carry dtypes with what the step returns
    (h in the compute dtype), so the first and every later predict share
    ONE compiled signature — a warmed server must not recompile on its
    second request."""
    import jax

    ckpt, _ = checkpoint
    pred = StreamingPredictor(ckpt)
    sid = pred.open_session(1, 32, 32)
    before = jax.tree_util.tree_map(
        lambda a: a.dtype, pred._sessions[sid].state)
    x = np.zeros((1, 1, 32, 32, 2), np.float32)
    pred.predict(sid, x)
    after = jax.tree_util.tree_map(
        lambda a: a.dtype, pred._sessions[sid].state)
    assert before == after


def test_predict_many_matches_per_session_predicts(checkpoint):
    """One fused dispatch for N sessions ≡ N separate predicts: outputs
    match and each session's state advances identically (the follow-up
    frame through `predict` agrees with the single-session trajectory)."""
    ckpt, npz = checkpoint
    pred = StreamingPredictor(ckpt)
    data = np.load(npz)
    x = np.ascontiguousarray(
        np.moveaxis(data["X"][:4], 2, -1)).astype(np.float32)
    xa, xb = x[:2], x[2:4]

    # reference trajectories: two independent sessions, frame by frame
    ra = pred.open_session(2, 32, 32)
    rb = pred.open_session(2, 32, 32)
    ya_ref = [pred.predict(ra, xa[:, t:t + 1]) for t in range(3)]
    yb_ref = [pred.predict(rb, xb[:, t:t + 1]) for t in range(3)]

    # fused: same two streams through predict_many for frames 0-1, then a
    # plain per-session predict for frame 2 (state handoff both ways)
    sa = pred.open_session(2, 32, 32)
    sb = pred.open_session(2, 32, 32)
    for t in range(2):
        ya, yb = pred.predict_many([sa, sb],
                                   [xa[:, t:t + 1], xb[:, t:t + 1]])
        np.testing.assert_allclose(ya, ya_ref[t], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(yb, yb_ref[t], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pred.predict(sa, xa[:, 2:3]), ya_ref[2],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pred.predict(sb, xb[:, 2:3]), yb_ref[2],
                               rtol=1e-4, atol=1e-4)
    assert pred.session_info(sa)["frames_seen"] == 3

    # validation surface
    with pytest.raises(ValueError, match="duplicate"):
        pred.predict_many([sa, sa], [xa[:, :1], xa[:, :1]])
    with pytest.raises(KeyError):
        pred.predict_many([sa, "nope"], [xa[:, :1], xb[:, :1]])
    with pytest.raises(ValueError, match="differ in shape"):
        pred.predict_many([sa, sb], [xa[:, :1], xb[:, :2]])
    for s in (ra, rb, sa, sb):
        pred.close_session(s)


def test_http_predict_batch_roundtrip(checkpoint):
    """POST /v1/predict-batch: N stacked frame blocks, one fused reply."""
    ckpt, npz = checkpoint
    pred = StreamingPredictor(ckpt)
    server = serve_http(pred, "127.0.0.1", 0)
    try:
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=120)
        sids = []
        for _ in range(2):
            conn.request("POST", "/v1/session",
                         body=json.dumps({"batch": 1, "height": 32,
                                          "width": 32}))
            sids.append(json.loads(conn.getresponse().read())["session_id"])
        data = np.load(npz)
        x = np.ascontiguousarray(
            np.moveaxis(data["X"][:2], 2, -1)).astype(np.float32)
        blocks = np.stack([x[0:1, :1], x[1:2, :1]])  # [2,1,1,32,32,2]
        conn.request(
            "POST", "/v1/predict-batch",
            body=np.ascontiguousarray(blocks, "<f4").tobytes(),
            headers={"X-Sessions": ",".join(sids),
                     "X-Shape": ",".join(map(str, blocks.shape))})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        out_shape = tuple(int(v) for v in r.getheader("X-Shape").split(","))
        out = np.frombuffer(r.read(), "<f4").reshape(out_shape)
        assert out.shape == (2, 1, 1, 32, 32, 1)

        # parity vs single-session predicts on fresh sessions
        sa = pred.open_session(1, 32, 32)
        sb = pred.open_session(1, 32, 32)
        np.testing.assert_allclose(out[0], pred.predict(sa, x[0:1, :1]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out[1], pred.predict(sb, x[1:2, :1]),
                                   rtol=1e-4, atol=1e-4)

        # malformed: N mismatch -> 400
        conn.request(
            "POST", "/v1/predict-batch",
            body=np.ascontiguousarray(blocks, "<f4").tobytes(),
            headers={"X-Sessions": sids[0],
                     "X-Shape": ",".join(map(str, blocks.shape))})
        assert conn.getresponse().status == 400
    finally:
        server.shutdown()


def test_resnet_family_serving_sessions(tmp_path):
    """The serving engine must carry the SECOND family's richer recurrent
    state (bottleneck + 4 skip-level ConvLSTM carries) across requests:
    streaming predicts ≡ one multi-frame call, resnet18 checkpoint."""
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    npz = str(tmp_path / "mm.npz")
    save_moving_mnist_npz(npz, seq_len=3, num_samples=8, image_size=32,
                          num_digits=1, seed=1, as_xy=True)
    ckdir = str(tmp_path / "ck")
    cfg = TrainConfig(npz_path=npz, batch_size=4, epochs=1,
                      checkpoint_dir=ckdir, mesh_data=1,
                      model={"type": "resnet18", "lstm_layers": 1,
                             "freeze_encoder": False})
    fit(cfg, verbose=False)

    pred = StreamingPredictor(os.path.join(ckdir, "resnet18_best"))
    data = np.load(npz)
    x = np.ascontiguousarray(
        np.moveaxis(data["X"][:2], 2, -1)).astype(np.float32)

    sid_a = pred.open_session(2, 32, 32)
    y_all = pred.predict(sid_a, x)
    assert y_all.shape == (2, 3, 32, 32, 1)
    sid_b = pred.open_session(2, 32, 32)
    parts = [pred.predict(sid_b, x[:, t:t + 1]) for t in range(3)]
    np.testing.assert_allclose(np.concatenate(parts, axis=1), y_all,
                               rtol=1e-4, atol=1e-4)

    # fused dispatch carries the multi-level state too
    sc, sd = pred.open_session(2, 32, 32), pred.open_session(2, 32, 32)
    for t in range(3):
        yc, yd = pred.predict_many([sc, sd],
                                   [x[:, t:t + 1], x[:, t:t + 1]])
        np.testing.assert_allclose(yc, parts[t], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(yd, parts[t], rtol=1e-4, atol=1e-4)


def test_int8_calibrated_predictor_matches_dynamic(checkpoint):
    """int8 + calibrated static activation scales (VERDICT r4 #2): the
    predictor calibrates on raw frame blocks at construction, reports the
    flag, and its streamed physical-unit outputs track the dynamic-quant
    predictor closely on in-distribution frames."""
    ckpt, npz = checkpoint
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset

    ds = NPZSequenceDataset(npz)
    calib = [ds.get_batch_raw(np.asarray([i]))[0] for i in range(3)]

    p_dyn = StreamingPredictor(ckpt, int8=True)
    p_cal = StreamingPredictor(ckpt, int8=True, int8_calib_frames=calib)
    assert not p_dyn.int8_calibrated
    assert p_cal.int8_calibrated

    x_raw = ds.get_batch_raw(np.asarray([4]))[0]  # [1, T, H, W, 2]
    outs = {}
    for name, p in (("dyn", p_dyn), ("cal", p_cal)):
        s = p.open_session(batch=1, height=x_raw.shape[2],
                           width=x_raw.shape[3])
        ys = [p.predict(s, x_raw[:, t:t + 1]) for t in range(x_raw.shape[1])]
        p.close_session(s)
        outs[name] = np.concatenate([np.asarray(y) for y in ys], axis=1)
    a, b = outs["dyn"], outs["cal"]
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert np.isfinite(b).all()
    assert rel < 0.15, rel
