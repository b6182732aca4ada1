"""Streaming inference serving — checkpoint → stateful O(1)-per-frame API.

The reference has no serving path at all: its rollout script re-runs the
model on every growing prefix, O(T²), and discards the recurrent state the
model returns (reference test.py:305-316). Here streaming inference is the
deployable surface:

* ``StreamingPredictor`` — in-process engine: restores a checkpoint
  (params + BatchNorm stats + normalization manifest, so raw sensor frames
  in / physical m/s out), keeps named sessions each carrying the (h, c)
  recurrence, and dispatches one jitted step per request. Per-frame cost is
  constant regardless of how long a session has been running.
* ``serve_http`` / CLI ``serve`` — a dependency-free HTTP front end
  (stdlib ``ThreadingHTTPServer``): JSON for control, raw little-endian
  float32 tensors for data (no serialization overhead on the hot path).

Endpoints:
    GET  /healthz                     → {"status": "ok", model info}
    POST /v1/session                  {"batch": B, "height": H, "width": W}
                                      → {"session_id": ...}
    POST /v1/predict/<sid>            body: raw f32 [B,T,H,W,Cin], header
                                      X-Shape: "B,T,H,W,C"
                                      → raw f32 [B,T,H,W,out] (denormalized,
                                      physical units), X-Shape set
    DELETE /v1/session/<sid>          → {"closed": true}

Device access is serialized with a lock (one chip, many HTTP threads); the
per-shape jitted step is compiled once and cached by JAX.
"""

from __future__ import annotations

import json
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


@dataclass
class _Session:
    batch: int
    height: int
    width: int
    state: Any = None
    frames_seen: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock)


class StreamingPredictor:
    """Checkpoint-backed stateful streaming inference engine."""

    def __init__(self, checkpoint_path: str,
                 denormalize_output: bool = True,
                 int8: bool = False,
                 int8_calib_frames=None):
        import jax.numpy as jnp  # noqa: F401  (fail early if jax broken)

        from .models.registry import build_model
        from .ops.normalize import NormStats
        from .train.checkpoint import restore_checkpoint

        state, meta = restore_checkpoint(checkpoint_path)
        model_cfg = meta["config"].get("model", meta["config"])
        self.model_cfg = dict(model_cfg)
        cfg, _, apply_fn, init_state = build_model(model_cfg)
        self._apply_fn = apply_fn
        self._init_state = init_state
        self.variables = {"params": state["params"], "stats": state["stats"]}
        if int8:
            # post-training int8 (ops/quant.py): conv kernels + dynamic
            # activation quant run on the int8 MXU — up to ~2x batch
            # inference throughput where bf16 saturates the MXU
            from .ops.quant import quantize_tree
            self.variables = quantize_tree(self.variables)
        self.int8 = int8
        self.int8_calibrated = False
        if "norm_stats" not in meta:
            raise ValueError(
                "checkpoint has no normalization manifest (norm_stats) — "
                "it cannot map raw frames to model inputs; retrain or "
                "re-save with a stats manifest")
        self.norm_stats = NormStats.from_dict(meta["norm_stats"])
        if int8 and int8_calib_frames is not None:
            # calibrated static activation scales (ops/quant.py,
            # VERDICT r4 #2): the per-request dynamic amax passes —
            # measured as what made int8 LOSE to bf16 at single-frame
            # dispatches (docs/SERVING.md round 4) — disappear; conv
            # inputs reach HBM at int8 width. ``int8_calib_frames``:
            # iterable of RAW [B,T,H,W,C] frame blocks covering the
            # deployment distribution.
            from .ops.normalize import normalize_x
            from .ops.quant import calibrate_tree

            batches = [normalize_x(np.asarray(b), self.norm_stats)
                       for b in int8_calib_frames]
            self.variables = calibrate_tree(apply_fn, self.variables,
                                            batches)
            self.int8_calibrated = True
        self.denormalize_output = denormalize_output
        self._sessions: Dict[str, _Session] = {}
        self._sessions_lock = threading.Lock()
        self._device_lock = threading.Lock()
        self._step = self._make_step()
        self._fused_steps: Dict[int, Callable] = {}

    def _make_step(self) -> Callable:
        import jax

        from .ops.normalize import denormalize_y, normalize_x

        apply_fn = self._apply_fn
        stats = self.norm_stats
        denorm = self.denormalize_output

        @jax.jit
        def step(variables, x_raw, state):
            x = normalize_x(x_raw, stats)
            y, new_state, _ = apply_fn(variables, x, state=state,
                                       train=False)
            y = y.astype(jax.numpy.float32)
            if denorm:
                y = denormalize_y(y, stats)
            return y, new_state

        return step

    def _fused_step(self, n: int) -> Callable:
        """Jitted (concat N frame blocks + states → step → split states)
        as ONE compiled program — a fused predict_many call costs a single
        device dispatch, not 1 + O(N) eager concat/slice dispatches (the
        first fused-bench cut measured exactly that overhead: 56 ms p50
        for N=2 vs 35 ms single). Cached per N; batch/shape polymorphism
        is jit's as usual."""
        fn = self._fused_steps.get(n)
        if fn is None:
            import jax
            import jax.numpy as jnp

            step = self._step

            @jax.jit
            def fused(variables, x, states):
                # x: [N·B, T, H, W, C] — concatenated HOST-side so the N
                # frame blocks ride ONE host→device transfer (N separate
                # jit arguments cost N transfers through the tunnel)
                st = jax.tree_util.tree_map(
                    lambda *leaves: jnp.concatenate(leaves, axis=0),
                    *states)
                y, new_st = step(variables, x, st)
                B = x.shape[0] // n
                split_states = tuple(
                    jax.tree_util.tree_map(
                        lambda a, i=i: a[i * B:(i + 1) * B], new_st)
                    for i in range(n))
                return y, split_states

            self._fused_steps[n] = fn = fused
        return fn

    # -- session management -------------------------------------------------

    def _input_channels(self) -> int:
        if self.model_cfg.get("type", "custom") == "custom":
            return 2 * self.model_cfg.get("in_channels_per_sat", 1)
        return self.model_cfg.get("in_channels", 2)

    def open_session(self, batch: int, height: int, width: int) -> str:
        import jax
        import jax.numpy as jnp

        sid = uuid.uuid4().hex[:16]
        state = self._init_state(batch, height, width)
        # Align the carry dtypes with what the step RETURNS (zero-init is
        # f32 but the model carries h in the compute dtype): without this
        # the first predict compiles an f32-state signature and the
        # SECOND predict of every session recompiles for the bf16 one —
        # a warmed server would still stall on its second live request.
        try:
            dummy = jax.ShapeDtypeStruct(
                (batch, 1, height, width, self._input_channels()),
                jnp.float32)
            out_state = jax.eval_shape(
                lambda v, x, st: self._step(v, x, st)[1],
                self.variables, dummy, state)
            state = jax.tree_util.tree_map(
                lambda a, t: a.astype(t.dtype), state, out_state)
        except Exception as e:  # noqa: BLE001 — never block a session:
            # Alignment is an optimization (skipping it only costs one
            # recompile on the second predict) — but log it: a genuinely
            # broken checkpoint/model would otherwise surface only as an
            # opaque 500 on the first predict.
            import logging
            logging.getLogger(__name__).warning(
                "carry-dtype alignment skipped (model eval_shape failed; "
                "a broken checkpoint would fail predict too): %s", e)
        with self._sessions_lock:
            self._sessions[sid] = _Session(batch, height, width,
                                           state=state)
        return sid

    def close_session(self, sid: str) -> bool:
        with self._sessions_lock:
            return self._sessions.pop(sid, None) is not None

    def session_info(self, sid: str) -> Optional[Dict[str, Any]]:
        s = self._sessions.get(sid)
        if s is None:
            return None
        return {"batch": s.batch, "height": s.height, "width": s.width,
                "frames_seen": s.frames_seen}

    # -- inference ----------------------------------------------------------

    def predict(self, sid: str, frames: np.ndarray) -> np.ndarray:
        """frames: raw [B, T, H, W, Cin] float32 (T >= 1). Advances the
        session state by T frames; returns [B, T, H, W, out] predictions."""
        import jax.numpy as jnp

        s = self._sessions.get(sid)
        if s is None:
            raise KeyError(f"unknown session {sid!r}")
        if frames.ndim != 5:
            raise ValueError(f"frames must be [B,T,H,W,C], got "
                             f"{frames.shape}")
        B, T, H, W, C = frames.shape
        if (B, H, W) != (s.batch, s.height, s.width):
            raise ValueError(
                f"frame geometry {B}x{H}x{W} does not match session "
                f"{s.batch}x{s.height}x{s.width}")
        # Validate T/C here so a malformed client payload maps to a 400
        # client error instead of failing inside the jitted step as a 500.
        if T < 1:
            raise ValueError("frames must contain at least one time step "
                             f"(got T={T})")
        expect_c = self._input_channels()
        if C != expect_c:
            raise ValueError(f"frames have {C} channels; the model "
                             f"expects {expect_c}")
        with s.lock:                    # per-session state consistency
            # re-validate AFTER acquiring the session lock: a concurrent
            # DELETE may have popped the session — serving (and mutating)
            # an orphan after the client was told it closed is a race
            with self._sessions_lock:
                if self._sessions.get(sid) is not s:
                    raise KeyError(f"unknown session {sid!r}")
            with self._device_lock:     # one chip, many threads
                y, new_state = self._step(self.variables,
                                          jnp.asarray(frames), s.state)
                y_host = np.asarray(y)
            s.state = new_state
            s.frames_seen += frames.shape[1]
        return y_host

    def predict_many(self, sids, frames_list) -> list:
        """ONE fused device dispatch for N same-geometry sessions.

        ``sids``: N distinct session ids sharing (batch, height, width);
        ``frames_list``: N raw [B, T, H, W, Cin] blocks with identical
        shapes. Each session's recurrent state advances exactly as if its
        block had gone through ``predict`` — but the chip sees a single
        [N·B] batch, so N concurrent streams cost ~one dispatch instead
        of N (the round-4 latency table measured a B=1 request as
        dispatch-bound: 36.8 ms p50 against ~0.35 ms of batched device
        compute — docs/SERVING.md). Compiles one extra signature per
        distinct N.
        """
        import jax.numpy as jnp

        if not sids:
            raise ValueError("predict_many needs at least one session")
        if len(set(sids)) != len(sids):
            raise ValueError("duplicate session ids in predict_many")
        if len(frames_list) != len(sids):
            raise ValueError(f"{len(sids)} sessions but "
                             f"{len(frames_list)} frame blocks")
        if len(sids) == 1:
            return [self.predict(sids[0], frames_list[0])]
        sess = []
        for sid in sids:
            s = self._sessions.get(sid)
            if s is None:
                raise KeyError(f"unknown session {sid!r}")
            sess.append(s)
        shapes = {np.shape(f) for f in frames_list}
        if len(shapes) != 1:
            raise ValueError(f"frame blocks differ in shape: {shapes}")
        geoms = {(s.batch, s.height, s.width) for s in sess}
        if len(geoms) != 1:
            raise ValueError(f"sessions differ in geometry: {geoms}")
        (shape,) = shapes
        if len(shape) != 5:
            raise ValueError(f"frames must be [B,T,H,W,C], got {shape}")
        B, T, H, W, C = shape
        ((sb, sh, sw),) = geoms
        if (B, H, W) != (sb, sh, sw):
            raise ValueError(f"frame geometry {B}x{H}x{W} does not match "
                             f"session {sb}x{sh}x{sw}")
        if T < 1:
            raise ValueError("frames must contain at least one time step")
        if C != self._input_channels():
            raise ValueError(f"frames have {C} channels; the model "
                             f"expects {self._input_channels()}")

        # take every session lock in a canonical (sid-sorted) order so two
        # overlapping predict_many calls cannot deadlock
        order = sorted(range(len(sess)), key=lambda i: sids[i])
        held = []
        try:
            for i in order:
                sess[i].lock.acquire()
                held.append(sess[i])
                with self._sessions_lock:
                    if self._sessions.get(sids[i]) is not sess[i]:
                        raise KeyError(f"unknown session {sids[i]!r}")
            x_all = np.concatenate([np.asarray(f, np.float32)
                                    for f in frames_list], axis=0)
            states = tuple(s.state for s in sess)
            with self._device_lock:
                y, new_states = self._fused_step(len(sess))(
                    self.variables, jnp.asarray(x_all), states)
                y_host = np.asarray(y)
            for i, s in enumerate(sess):
                s.state = new_states[i]
                s.frames_seen += T
            return [y_host[i * B:(i + 1) * B] for i in range(len(sess))]
        finally:
            for s in held:
                s.lock.release()

    def warmup(self, batch: int, height: int, width: int,
               seq_len: int = 1) -> None:
        """Pre-compile the step for a geometry (first compile is slow)."""
        sid = self.open_session(batch, height, width)
        try:
            self.predict(sid, np.zeros(
                (batch, seq_len, height, width,
                 self._input_channels()), np.float32))
        finally:
            self.close_session(sid)


# ---------------------------------------------------------------------------
# HTTP front end (stdlib only)
# ---------------------------------------------------------------------------

def _make_handler(predictor: StreamingPredictor):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def _route(self):
            """(path, last-segment) with any query string stripped — a
            cache-buster like ?trace=1 must not 404 a valid session id."""
            path = self.path.partition("?")[0]
            return path, path.rsplit("/", 1)[-1]

        def do_GET(self):
            path, sid = self._route()
            if path == "/healthz":
                self._json(200, {"status": "ok",
                                 "model": predictor.model_cfg})
            elif path.startswith("/v1/session/"):
                info = predictor.session_info(sid)
                if info is None:
                    self._json(404, {"error": "unknown session"})
                else:
                    self._json(200, info)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            # ALWAYS drain the body first: HTTP/1.1 keep-alive reuses the
            # connection, and an error reply that leaves N unread body
            # bytes in rfile makes the next request parse binary payload
            # as its request line
            body = self._read_body()
            path, sid = self._route()
            try:
                if path == "/v1/session":
                    req = json.loads(body or b"{}")
                    missing = [k for k in ("batch", "height", "width")
                               if k not in req]
                    if missing:
                        self._json(400, {"error": "missing field(s): "
                                         + ", ".join(missing)})
                        return
                    sid = predictor.open_session(
                        int(req["batch"]), int(req["height"]),
                        int(req["width"]))
                    self._json(200, {"session_id": sid})
                elif path.startswith("/v1/predict/"):
                    if self.headers.get("X-Shape") is None:
                        self._json(400,
                                   {"error": "missing X-Shape header"})
                        return
                    shape = tuple(int(v) for v in
                                  self.headers["X-Shape"].split(","))
                    frames = np.frombuffer(body, dtype="<f4").reshape(shape)
                    y = predictor.predict(sid, frames)
                    body = np.ascontiguousarray(y, dtype="<f4").tobytes()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("X-Shape",
                                     ",".join(map(str, y.shape)))
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif path == "/v1/predict-batch":
                    # fused dispatch for N sessions: X-Sessions lists the
                    # ids, X-Shape is "N,B,T,H,W,C", body is the N stacked
                    # raw-f32 frame blocks; reply is [N,B,T,H,W,out]
                    sids_hdr = self.headers.get("X-Sessions")
                    if sids_hdr is None or self.headers.get("X-Shape") is None:
                        self._json(400, {"error": "predict-batch needs "
                                         "X-Sessions and X-Shape headers"})
                        return
                    sids = [v.strip() for v in sids_hdr.split(",")
                            if v.strip()]
                    shape = tuple(int(v) for v in
                                  self.headers["X-Shape"].split(","))
                    if len(shape) != 6 or shape[0] != len(sids):
                        self._json(400, {"error": "X-Shape must be "
                                         "N,B,T,H,W,C with N == number "
                                         "of X-Sessions ids"})
                        return
                    blocks = np.frombuffer(body, dtype="<f4").reshape(shape)
                    ys = predictor.predict_many(sids, list(blocks))
                    out = np.ascontiguousarray(np.stack(ys), dtype="<f4")
                    body = out.tobytes()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("X-Shape",
                                     ",".join(map(str, out.shape)))
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as e:
                # with request fields validated above, a KeyError can only
                # be predictor.predict's unknown-session lookup
                self._json(404, {"error": str(e)})
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # anything else is a SERVER fault (compile failure, OOM,
                # bad checkpoint): 5xx for monitoring + traceback for the
                # operator — a 400 would send them debugging the client
                import traceback
                traceback.print_exc()
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):
            path, sid = self._route()
            if path.startswith("/v1/session/"):
                ok = predictor.close_session(sid)
                self._json(200 if ok else 404, {"closed": ok})
            else:
                self._json(404, {"error": "not found"})

    return Handler


def serve_http(predictor: StreamingPredictor, host: str = "127.0.0.1",
               port: int = 8000):
    """Returns a started ThreadingHTTPServer (caller joins/shuts down)."""
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((host, port), _make_handler(predictor))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def run_server(checkpoint: str, host: str, port: int,
               warmup: Optional[Tuple[int, int, int]] = None,
               int8: bool = False,
               int8_calib_frames=None):
    predictor = StreamingPredictor(checkpoint, int8=int8,
                                   int8_calib_frames=int8_calib_frames)
    if predictor.int8_calibrated:
        print("int8: static activation scales calibrated "
              f"({len(int8_calib_frames)} frame blocks)")
    if warmup:
        print(f"warmup compile {warmup} ...")
        predictor.warmup(*warmup)
    server = serve_http(predictor, host, port)
    print(f"serving {checkpoint} on http://{host}:{port} "
          f"(model {predictor.model_cfg.get('type', 'custom')})")
    try:
        threading.Event().wait()  # serve_http runs in a daemon thread
    except KeyboardInterrupt:
        server.shutdown()
