"""Autoregressive / incremental-context rollout.

The reference's rollout video (test.py:305-316) re-runs the model on every
growing prefix ``input_seq[:t_len]`` — O(T²) total work, and its models
return a recurrent state that test.py never threads through (SURVEY.md §3.3).
Here streaming inference is the first-class API: the (h, c) carries advance
one frame at a time, so a length-T rollout is O(T) with identical outputs
(proved by tests/test_ops_parity.py::test_convlstm_streaming_equals_full and
tests/test_resnet_unet.py::test_resnet_unet_streaming_matches_full).
``rollout_prefix_rerun`` reproduces the reference's exact prefix semantics
for apples-to-apples comparison.

The per-frame jitted step is cached per ``apply_fn`` (WeakKeyDictionary),
so repeated ``rollout_streaming`` calls reuse one trace — round 1 rebuilt
the jit wrapper per call, forcing a retrace every invocation. For offline
whole-sequence rollout, ``rollout_scan`` runs the T-loop on device inside a
single ``lax.scan`` dispatch.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# Bounded LRU keyed by id(apply_fn), holding (apply_fn, jitted) pairs. NOT
# a WeakKeyDictionary: the jitted closure references apply_fn, and a weak
# dict holds strong refs to its VALUES, so value→closure→key kept every
# entry immortal — the weak design never evicted anything. The strong ref
# stored alongside also guarantees the id key can't be recycled while the
# entry lives. Bound of 8 distinct models covers any realistic process;
# eviction drops the jit wrapper and its compiled executables.
_CACHE_LIMIT = 8
_STEP_CACHE: "OrderedDict[int, Tuple[Callable, Callable]]" = OrderedDict()
_SCAN_CACHE: "OrderedDict[int, Tuple[Callable, Callable]]" = OrderedDict()


def _cached_jit(cache: OrderedDict, apply_fn: Callable,
                build: Callable, extra_key=None) -> Callable:
    """``extra_key``: distinguishes variants of the same apply_fn (e.g. a
    Mesh for the sharded rollout) — hashed by identity like apply_fn."""
    key = (id(apply_fn), id(extra_key) if extra_key is not None else None)
    entry = cache.get(key)
    if (entry is not None and entry[0] is apply_fn
            and entry[2] is extra_key):
        cache.move_to_end(key)
        return entry[1]
    fn = build()
    # the strong refs stored alongside guarantee neither id can be
    # recycled while the entry lives
    cache[key] = (apply_fn, fn, extra_key)
    while len(cache) > _CACHE_LIMIT:
        cache.popitem(last=False)
    return fn


def _streaming_step(apply_fn: Callable) -> Callable:
    """One jitted single-frame step per live apply_fn: a second rollout
    with the same model+shapes is dispatch-only."""
    def build():
        @jax.jit
        def step(variables, x_t, state):
            y_t, new_state, _ = apply_fn(variables, x_t, state=state,
                                         train=False)
            return y_t, new_state

        return step

    return _cached_jit(_STEP_CACHE, apply_fn, build)


def rollout_streaming(apply_fn: Callable, variables, x_seq: jax.Array,
                      init_state_fn: Callable,
                      state: Optional[Dict[str, Any]] = None
                      ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Feed frames one at a time, carrying the recurrent state.

    x_seq: [B, T, H, W, C]. Returns (y_seq [B, T, H, W, out], final state).
    Per-frame cost is constant — the streaming-serving path (use this when
    frames arrive online; for offline full sequences prefer
    ``rollout_scan``, one dispatch instead of T).
    """
    B, T, H, W, _ = x_seq.shape
    if state is None:
        state = init_state_fn(B, H, W)
    step = _streaming_step(apply_fn)

    outs: List[jax.Array] = []
    for t in range(T):
        y_t, state = step(variables, x_seq[:, t:t + 1], state)
        outs.append(y_t)
    return jnp.concatenate(outs, axis=1), state


def rollout_scan(apply_fn: Callable, variables, x_seq: jax.Array,
                 init_state_fn: Callable,
                 state: Optional[Dict[str, Any]] = None,
                 mesh=None) -> Tuple[jax.Array, Dict[str, Any]]:
    """Whole-sequence streaming rollout as ONE device dispatch: the frame
    loop is a ``lax.scan`` over time, carrying the recurrent state — same
    outputs as ``rollout_streaming``, without T host round-trips.

    ``mesh``: shard the batch of sequences (and the [B,...] recurrent
    carries) over the mesh's 'data' axis — data-parallel offline rollout,
    identical outputs to the single-device pass (tested). Wrap
    ``apply_fn`` with ``flat_layout="batch"`` for a collective-free
    forward (models/layout.py); the reference's analog is a batch-1
    single-GPU prefix loop (test.py:305-316)."""
    B, T, H, W, _ = x_seq.shape
    if state is None:
        state = init_state_fn(B, H, W)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding

        if B % mesh.shape["data"]:
            raise ValueError(f"rollout batch {B} not divisible by mesh "
                             f"data degree {mesh.shape['data']}")
        rep = replicated_sharding(mesh)
        bat = batch_sharding(mesh)
        variables = jax.device_put(variables, rep)
        x_seq = jax.device_put(x_seq, bat)
        state = jax.device_put(state, bat)  # every carry leaf is [B, ...]

    def build():
        def scan_fn(variables, x_seq, state):
            def body(st, x_t):
                y_t, new_st, _ = apply_fn(variables, x_t[:, None],
                                          state=st, train=False)
                return new_st, y_t[:, 0]

            xs = jnp.moveaxis(x_seq, 1, 0)
            # Align carry dtypes: zero-init states are f32 while the step
            # emits the policy's h dtype (bf16) — cast once before the scan.
            out_st = jax.eval_shape(lambda s: body(s, xs[0])[0], state)
            state_c = jax.tree_util.tree_map(
                lambda s, t: s.astype(t.dtype), state, out_st)
            final, ys = jax.lax.scan(body, state_c, xs)
            return jnp.moveaxis(ys, 0, 1), final

        if mesh is None:
            return jax.jit(scan_fn)
        state_bat = jax.tree_util.tree_map(lambda _: bat, state)
        return jax.jit(scan_fn,
                       in_shardings=(rep, bat, state_bat),
                       out_shardings=(bat, state_bat))

    scan_fn = _cached_jit(_SCAN_CACHE, apply_fn, build, extra_key=mesh)
    return scan_fn(variables, x_seq, state)


def rollout_prefix_rerun(apply_fn: Callable, variables, x_seq: jax.Array
                         ) -> List[jax.Array]:
    """Reference semantics (test.py:305-316): for each prefix length t_len,
    run the model from scratch on x_seq[:, :t_len] and keep the last frame.
    Returns a list of [B, H, W, out] arrays (length T). O(T²) — kept for
    parity evaluation only."""
    T = x_seq.shape[1]
    outs = []
    for t_len in range(1, T + 1):
        y_seq, _, _ = apply_fn(variables, x_seq[:, :t_len], train=False)
        outs.append(y_seq[:, -1])
    return outs
