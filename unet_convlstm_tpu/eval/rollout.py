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
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def rollout_streaming(apply_fn: Callable, variables, x_seq: jax.Array,
                      init_state_fn: Callable,
                      state: Optional[Dict[str, Any]] = None
                      ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Feed frames one at a time, carrying the recurrent state.

    x_seq: [B, T, H, W, C]. Returns (y_seq [B, T, H, W, out], final state).
    Per-frame cost is constant — the streaming-serving path.
    """
    B, T, H, W, _ = x_seq.shape
    if state is None:
        state = init_state_fn(B, H, W)

    @jax.jit
    def step(variables, x_t, state):
        y_t, new_state, _ = apply_fn(variables, x_t, state=state,
                                     train=False)
        return y_t, new_state

    outs: List[jax.Array] = []
    for t in range(T):
        y_t, state = step(variables, x_seq[:, t:t + 1], state)
        outs.append(y_t)
    return jnp.concatenate(outs, axis=1), state


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
