"""Pallas TPU kernel: 3x3 SAME conv with fused BN prologue + stats epilogue.

The DoubleConv pair (Conv3x3+BN+ReLU twice — reference train/unet.py:66-75)
is the dominant HBM-traffic consumer of the training step (docs/PERF.md:
"DoubleConv stack ~23 ms of 59"). Under plain XLA each Conv+BN(train) costs,
per big tensor: conv write, stats read, normalize+ReLU read+write, next-conv
read. This kernel collapses three of those passes:

    y, sum, sumsq = fused_conv3x3(x, w, b, pre_inv, pre_shift)

      z = relu(x * pre_inv + pre_shift)     # BN-normalize prologue (VMEM)
      y = conv3x3_same(z, w) + b            # 9-tap MXU accumulation (f32)
      sum/sumsq = per-channel stats of y    # BN stats epilogue (f32)

so a full DoubleConv forward touches HBM only for: read x, write y1,
read y1, write y2 (+ negligible per-channel scalars). The batch-stats
finalization (mean/var/running-stat update) stays in plain jnp — it is
O(C) work.

The backward is hand-written XLA (``jax.custom_vjp``): identical math and
pass structure to XLA's own autodiff of the unfused chain (conv-transpose
for dx, batch-as-contraction conv for dw, fused elementwise for the
BN/stats cotangents), so training works and the forward savings are pure
win. Residuals are (x, y) in the storage dtype — no f32 activation
stacking.

Numerics: conv accumulates f32 on the MXU and rounds to the storage dtype,
the prologue runs at f32 precision in VMEM, and the stats are f32 sums over
the *rounded* y values — the same contract as the unfused
``conv2d``+``batchnorm`` path (ops/conv.py), verified by parity tests.

Falls back to the unfused XLA ops when shapes don't fit the kernel's VMEM
budget (``fits_fused_conv3x3``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Estimated per-block working set allowed. Mosaic's scoped-stack accounting
# runs ~3x this estimate (measured: a 9.3MB-estimated block allocated 25.8MB
# of scoped vmem), so the budget is set at a quarter of the 16MB scoped
# limit: est 4MB -> real ~12MB worst case.
_VMEM_BUDGET = 4 * 1024 * 1024


_COL_BUDGET = 1536 * 1024    # im2col scratch cap [bytes]
_MAX_CHUNKS = 16             # unrolled (image x h-chunk) iterations cap


def _chunk_height(h: int, w: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest divisor HC of H whose im2col chunk fits the scratch cap."""
    best = 0
    for hc in range(1, h + 1):
        if h % hc:
            continue
        col = hc * w * 9 * cin * itemsize + 2 * hc * w * cout * 4
        if col <= _COL_BUDGET:
            best = hc
    return best


def _block_shape(n: int, h: int, w: int, cin: int, cout: int,
                 itemsize: int):
    """(BN, HC): images per grid block and im2col chunk height."""
    hc = _chunk_height(h, w, cin, cout, itemsize)
    if hc < 1:
        return 0, 0

    def bytes_for(bn: int) -> int:
        pix = bn * h * w
        return (bn * (h + 2) * (w + 2) * cin * itemsize      # padded z
                + 2 * bn * h * w * cin * itemsize            # x in (×2 buf)
                + hc * w * 9 * cin * itemsize                # im2col chunk
                + 2 * hc * w * cout * 4                      # live f32 temps
                + 2 * pix * cout * itemsize)                 # y out (×2 buf)

    best = 0
    for bn in range(1, n + 1):
        if bytes_for(bn) > _VMEM_BUDGET and bn > 1:
            break
        if n % bn == 0 and bytes_for(bn) <= _VMEM_BUDGET \
                and bn * (h // hc) <= _MAX_CHUNKS:
            best = bn
    return best, hc


def fits_fused_conv3x3(x_shape, cout: int, itemsize: int = 2) -> bool:
    n, h, w, cin = x_shape
    return _block_shape(n, h, w, cin, cout, itemsize)[0] >= 1


def _kernel(x_ref, w_ref, b_ref, inv_ref, shift_ref,
            y_ref, sum_ref, sq_ref, zpad_ref, col_ref, *,
            has_prologue: bool, hc: int, out_dtype):
    bn, h, wd, cin = x_ref.shape
    cout = y_ref.shape[-1]

    zpad_ref[:] = jnp.zeros(zpad_ref.shape, zpad_ref.dtype)
    if has_prologue:
        zpad_ref[:, 1:h + 1, 1:wd + 1, :] = jnp.maximum(
            x_ref[:].astype(jnp.float32) * inv_ref[:].astype(jnp.float32)
            + shift_ref[:].astype(jnp.float32), 0.0).astype(x_ref.dtype)
    else:
        zpad_ref[:, 1:h + 1, 1:wd + 1, :] = x_ref[:]

    # im2col in VMEM, chunked over (image, H/hc): one [hc*W, 9*cin] x
    # [9*cin, cout] dot per chunk instead of nine K=cin dots — the MXU
    # contracts 128 rows per pass, so small-K dots pay a 128/cin padding
    # penalty per tap; the packed dot amortizes it 9-way. The chunk keeps
    # the scratch bounded regardless of block size.
    w2d = w_ref[:].reshape(9 * cin, cout)
    bias = b_ref[:].astype(jnp.float32)
    ps = jnp.zeros((1, cout), jnp.float32)
    pq = jnp.zeros((1, cout), jnp.float32)
    for j in range(bn):
        for c0 in range(0, h, hc):
            for kh in range(3):
                for kw in range(3):
                    t = 3 * kh + kw
                    col_ref[:, t * cin:(t + 1) * cin] = zpad_ref[
                        j, c0 + kh:c0 + kh + hc, kw:kw + wd, :
                    ].reshape(hc * wd, cin)
            yc = (jnp.dot(col_ref[:], w2d,
                          preferred_element_type=jnp.float32)
                  + bias).astype(out_dtype)
            y_ref[j, c0:c0 + hc, :, :] = yc.reshape(hc, wd, cout)
            ycf = yc.astype(jnp.float32)
            ps += jnp.sum(ycf, axis=0, keepdims=True)
            pq += jnp.sum(ycf * ycf, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sum_ref[:] = jnp.zeros(sum_ref.shape, sum_ref.dtype)
        sq_ref[:] = jnp.zeros(sq_ref.shape, sq_ref.dtype)

    sum_ref[:] += ps
    sq_ref[:] += pq


def _fused_conv3x3_fwd_impl(x, w, b, inv, shift, *, has_prologue: bool,
                            want_stats: bool, interpret: bool):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    bn, hc = _block_shape(n, h, wd, cin, cout, jnp.dtype(x.dtype).itemsize)
    if bn < 1:
        raise ValueError(f"fused_conv3x3: shape {x.shape}->{cout} exceeds "
                         "the VMEM budget; guard with fits_fused_conv3x3")
    del want_stats  # the kernel always accumulates stats (VMEM-cheap)
    grid = (n // bn,)
    kern = functools.partial(_kernel, has_prologue=has_prologue, hc=hc,
                             out_dtype=x.dtype)
    out_shapes = [jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
                  jax.ShapeDtypeStruct((1, cout), jnp.float32),
                  jax.ShapeDtypeStruct((1, cout), jnp.float32)]
    y, s, q = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, h, wd, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, h, wd, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bn, h + 2, wd + 2, cin), x.dtype),
            pltpu.VMEM((hc * wd, 9 * cin), x.dtype),
        ],
        interpret=interpret,
    )(x, w, b.reshape(1, cout), inv.reshape(1, cin), shift.reshape(1, cin))
    return y, s.reshape(cout), q.reshape(cout)


# ---------------------------------------------------------------------------
# custom_vjp wrapper — backward in plain XLA (same pass structure as
# autodiff of the unfused chain)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_conv3x3(x, w, b, inv, shift, has_prologue: bool,
                   want_stats: bool, interpret: bool):
    return _fused_conv3x3_fwd_impl(x, w, b, inv, shift,
                                   has_prologue=has_prologue,
                                   want_stats=want_stats,
                                   interpret=interpret)


def _fwd(x, w, b, inv, shift, has_prologue, want_stats, interpret):
    out = _fused_conv3x3_fwd_impl(x, w, b, inv, shift,
                                  has_prologue=has_prologue,
                                  want_stats=want_stats,
                                  interpret=interpret)
    y = out[0]
    return out, (x, y, w, inv, shift)


def _bwd(has_prologue, want_stats, interpret, res, cts):
    x, y, w, inv, shift = res
    gy, gs, gq = cts
    f32 = jnp.float32
    cdt = x.dtype

    # stats cotangents fold into the y cotangent:
    #   d(sum)/dy = 1, d(sumsq)/dy = 2y  (per channel)
    dy = gy.astype(f32)
    if want_stats:
        dy = dy + gs.astype(f32) + 2.0 * y.astype(f32) * gq.astype(f32)
    dy = dy.astype(cdt)

    db = jnp.sum(dy.astype(f32), axis=(0, 1, 2))

    if has_prologue:
        a = x.astype(f32) * inv.astype(f32) + shift.astype(f32)
        z = jnp.maximum(a, 0.0).astype(cdt)
    else:
        z = x

    # dz / dw via jax.linear_transpose of the conv in each argument —
    # traces abstractly (no extra forward) and reuses XLA's native,
    # MXU-efficient conv-gradient lowerings.
    w_c = w.astype(cdt)

    def conv_in_z(z_):
        return lax.conv_general_dilated(
            z_, w_c, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=_DN)

    def conv_in_w(w_):
        return lax.conv_general_dilated(
            z, w_, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=_DN)

    (dz,) = jax.linear_transpose(
        conv_in_z, jax.ShapeDtypeStruct(z.shape, cdt))(dy)
    (dw,) = jax.linear_transpose(
        conv_in_w, jax.ShapeDtypeStruct(w_c.shape, cdt))(dy)
    dw = dw.astype(f32)

    if has_prologue:
        mask = (a > 0.0)
        da = jnp.where(mask, dz.astype(f32), 0.0)
        dx = (da * inv.astype(f32)).astype(cdt)
        dinv = jnp.sum(da * x.astype(f32), axis=(0, 1, 2))
        dshift = jnp.sum(da, axis=(0, 1, 2))
    else:
        dx = dz.astype(cdt)
        dinv = jnp.zeros_like(inv)
        dshift = jnp.zeros_like(shift)
    return dx, dw, db, dinv, dshift


_fused_conv3x3.defvjp(_fwd, _bwd)


def fused_conv3x3(x, w, b=None,
                  pre_inv: Optional[jax.Array] = None,
                  pre_shift: Optional[jax.Array] = None,
                  want_stats: bool = True,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """3x3 SAME conv with optional normalize+ReLU prologue + stats epilogue.

    x: [N,H,W,Cin]; w: [3,3,Cin,Cout] (x's dtype); b: [Cout] or None.
    pre_inv/pre_shift: per-Cin BN affine applied as relu(x*inv+shift)
    before the conv (both or neither). Returns (y [N,H,W,Cout],
    sum [Cout] f32, sumsq [Cout] f32); the stats sums are always accumulated and returned (want_stats exists for API symmetry; callers in eval mode simply ignore them).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_prologue = pre_inv is not None
    cin = x.shape[-1]
    cout = w.shape[-1]
    if b is None:
        b = jnp.zeros((cout,), jnp.float32)
    if not has_prologue:
        pre_inv = jnp.ones((cin,), jnp.float32)
        pre_shift = jnp.zeros((cin,), jnp.float32)
    return _fused_conv3x3(x, w.astype(x.dtype), b, pre_inv, pre_shift,
                          has_prologue, want_stats, interpret)
