"""Pallas TPU kernels (SURVEY §2.9 north-star items).

``instance_norm`` — fused per-sample normalization (+ optional activation
epilogue), forward and custom-VJP backward, each a single VMEM pass per
(sample, channel-tile) block instead of XLA's separate reduce + broadcast
passes over HBM. Replaces the reference's custom Keras layer (utils.py:6-30)
on the hot path of CycleGAN (instance norm sits after every conv in both
generators and discriminators, cycle_gan.py:30-36).

Layout: (N, H, W, C) is viewed as (N, H·W, C) — lane dimension C, sublane
H·W — and the grid runs over (sample, channel-tile). Statistics reduce over
the sublane axis in fp32 on the VPU; blocks are sized to fit comfortably in
VMEM (≤4 MB).

Enable via ``--use-pallas on`` (or auto on TPU backends); every kernel has an
XLA fallback with identical semantics (gan_tpu.ops.norm) and parity tests
(tests/test_pallas.py) run the kernels in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IN_EPS = 1e-5  # reference InstanceNormalization epsilon (utils.py:9)

# Per-block byte budget. The backward kernel holds ~3 blocks (x, dy, dx) plus
# Mosaic's double buffering on a 16 MB VMEM core, so blocks must stay small;
# 1 MB keeps worst-case stack usage ≈ 12 MB (measured: 4 MB blocks OOM'd).
_VMEM_BUDGET = 1024 * 1024


def _interpret() -> bool:
    """Interpreter mode off-TPU so CPU tests exercise the same kernels.

    GAN_TPU_PLATFORM=cpu (the test harness) forces interpretation even when a
    TPU plugin is registered as the default backend, since the arrays then
    live on CPU devices."""
    if os.environ.get("GAN_TPU_PLATFORM", "").startswith("cpu"):
        return True
    return jax.default_backend() != "tpu"


def _channel_tile(hw: int, c: int, itemsize: int) -> int:
    tile = c
    while tile > 128 and hw * tile * itemsize > _VMEM_BUDGET:
        tile //= 2
    return tile


def supported(shape, dtype) -> bool:
    """Can instance_norm run as a Pallas kernel for this activation shape?

    Requires a non-trivial spatial extent (sublane tiling) and a channel-tiled
    block within the VMEM budget — larger activations (e.g. 128²×128 at 256²
    images) fall back to the XLA twin, which handles them fine."""
    n, h, w, c = shape
    hw = h * w
    if hw < 256 or c < 64 or c % 64:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return hw * _channel_tile(hw, c, itemsize) * itemsize <= _VMEM_BUDGET


def enabled() -> bool:
    """Pallas path on? --use-pallas wires GAN_TPU_PALLAS.

    ``auto`` currently resolves to OFF: measured end-to-end on v5e, XLA's own
    fused instance norm beats this kernel inside the CycleGAN train step
    (182 vs 140 image-pairs/sec/chip at 256² — XLA fuses the norm into the
    surrounding conv epilogue/elementwise chains, while the per-(sample,
    channel-tile) grid here launches many small blocks). The kernel is kept
    as the opt-in Pallas path (--use-pallas on) and as the base for future
    fused norm+activation epilogues."""
    mode = os.environ.get("GAN_TPU_PALLAS", "auto")
    return mode == "on"


# ---------------------------------------------------------------------------
# instance norm: forward kernel
# ---------------------------------------------------------------------------

def _in_fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps, act):
    xf = x_ref[0].astype(jnp.float32)                       # (HW, Ct)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    inv = lax.rsqrt(var + eps)
    y = (xf - mean) * inv * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.3 * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    y_ref[0] = y.astype(y_ref.dtype)


def _in_forward(x, scale, offset, *, eps: float, act):
    n, h, w, c = x.shape
    hw = h * w
    x3 = x.reshape(n, hw, c)
    ct = _channel_tile(hw, c, x.dtype.itemsize)
    grid = (n, c // ct)
    out = pl.pallas_call(
        functools.partial(_in_fwd_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x3, scale.reshape(1, c), offset.reshape(1, c))
    return out.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# instance norm: backward kernel (pre-activation dy)
# ---------------------------------------------------------------------------

def _in_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32)                       # (HW, Ct)
    dy = dy_ref[0].astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    inv = lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    # per-sample partials; (8, Ct) blocks because TPU block shapes need the
    # sublane dim divisible by 8 — row 0 carries the value, rows 1-7 are zero
    pad = jnp.zeros((7, xf.shape[1]), jnp.float32)
    dg_ref[0] = jnp.concatenate([jnp.sum(dy * xhat, axis=0, keepdims=True), pad])
    db_ref[0] = jnp.concatenate([jnp.sum(dy, axis=0, keepdims=True), pad])
    dyg = dy * g_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=0, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=0, keepdims=True)
    dx_ref[0] = (inv * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)


def _in_backward(eps, res, dy):
    x, scale = res
    n, h, w, c = x.shape
    hw = h * w
    ct = _channel_tile(hw, c, x.dtype.itemsize)
    grid = (n, c // ct)
    dx, dg_part, db_part = pl.pallas_call(
        functools.partial(_in_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            jax.ShapeDtypeStruct((n, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 8, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x.reshape(n, hw, c), scale.reshape(1, c), dy.reshape(n, hw, c))
    return (dx.reshape(n, h, w, c), jnp.sum(dg_part[:, 0], axis=0),
            jnp.sum(db_part[:, 0], axis=0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm(x, scale, offset, eps: float = IN_EPS):
    """Fused per-sample (H, W) normalization — Pallas twin of
    gan_tpu.ops.norm.instance_norm (same math, one VMEM pass)."""
    return _in_forward(x, scale, offset, eps=eps, act=None)


def _in_vjp_fwd(x, scale, offset, eps):
    return _in_forward(x, scale, offset, eps=eps, act=None), (x, scale)


def _in_vjp_bwd(eps, res, dy):
    return _in_backward(eps, res, dy)


instance_norm.defvjp(_in_vjp_fwd, _in_vjp_bwd)
