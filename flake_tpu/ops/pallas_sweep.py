"""Pallas TPU kernel for the candidate-order sweep.

The order search (optimize.c:224-261 restated batched in
flake_tpu.ops.frame) needs, for every candidate LPC order o, the Rice
partition sums of that order's residual. The pure-XLA formulation
materialises [F, C, n_orders, B] residual/zigzag tensors in HBM; this
kernel keeps the whole per-frame pipeline — lagged int32 taps, the
coef-limb dot product, the quantization shift, zigzag, and the
partition-granular limb sums — resident in VMEM, reading each sample
block exactly once and writing only the tiny per-partition sums.

Layout: each (frame, channel) block of B samples is one grid step,
viewed as [B/128 rows x 128 lanes]; lag-j samples come from a lane
rotate plus a sublane rotate for the row boundary; partitions of
psize <= 128 samples are masked lane reductions. All arithmetic is
native int32 with the same wraparound semantics as the C encoder
(optimize.c:120, rice.c:121-123), so the resulting Rice costs are
bit-identical to the reference's search.

Constraints (callers fall back to the XLA path otherwise):
  - B % 128 == 0 and B >= 256
  - samples fit 17 bits signed (bps <= 16 after mid/side)
  - emit granularity gs = min(psize, 128) >= 16 with
    psize = B >> pmax_static.

Mosaic notes (hard-won): scalars must be explicit i32 (x64 mode turns
weak Python ints into i64 literals, unlowerable); per-program scalar
operands live in SMEM and broadcast from true scalars (vector
[G,1,1]->[G,r,l] broadcasts are unsupported); pltpu.roll shift must be
an i32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _z():
    """index_map zero as i32: weak Python 0 traces to an i64
    constant under x64, which Mosaic cannot return."""
    return jnp.int32(0)


def supports(block_size: int, bps: int, pmax_static: int) -> bool:
    """Whether the kernel covers this configuration."""
    if bps > 16:
        return False
    if block_size % 128 or block_size < 256 or block_size > 8192:
        # >8192 is beyond the hardware-validated VMEM envelope (the
        # whole [rows=B/128, 128] block plus per-order temporaries stay
        # VMEM-resident); legal sizes reach 65535 and must fall back to
        # the XLA sweep rather than fail Mosaic compilation
        return False
    psize = block_size >> pmax_static
    if psize * (1 << pmax_static) != block_size:
        return False
    # partitions must tile the 128-lane rows exactly: either a partition
    # spans whole rows (psize % 128 == 0) or rows split into whole
    # partitions (128 % psize == 0)
    if psize >= 128:
        return psize % 128 == 0
    return 128 % psize == 0 and psize >= 16


def _sweep_kernel(coef_ref, shift_ref, s_ref, lo_ref, hi_ref, *,
                  rows: int, max_order: int, gs: int, group: int,
                  interpret: bool = False):
    """One grid step: ``group`` (frame, channel) blocks of [rows, 128],
    processed sequentially (coefs are per-block scalars, and Mosaic has
    no sublane+lane broadcast to vectorise across blocks)."""
    shape = (rows, 128)
    i32 = jnp.int32
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    idx = row * i32(128) + col
    ppr = 128 // gs                                    # partitions/row
    roll = jnp.roll if interpret else pltpu.roll
    zero = jnp.zeros(shape, jnp.int32)

    # lane-group membership as an f32 0/1 matrix: partition sums become
    # ONE [*, 128] x [128, ppr] matmul per block instead of per-(order,
    # partition) masked lane reductions + strided stores (the v1
    # bottleneck). Exact: limb values <= 0xFFFF and gs <= 128 keep every
    # product/sum below 2^24, and HIGHEST precision pins true f32.
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (128, ppr), 0) // i32(gs)
    part_q = jax.lax.broadcasted_iota(jnp.int32, (128, ppr), 1)
    gmask = (lane_q == part_q).astype(jnp.float32)

    for g in range(group):
        s = s_ref[g]                                   # [rows, 128]
        # lag-j views: rotate lanes by j, fetch the row boundary from
        # the previous row, zero ahead of the stream start
        lags = []
        for j in range(1, max_order + 1):
            a = roll(s, i32(j), 1)
            b = roll(a, i32(1), 0)
            lag = jnp.where(col < i32(j), b, a)
            lag = jnp.where((row == i32(0)) & (col < i32(j)), zero, lag)
            lags.append(lag)

        limbs = []                                     # max_order x 2
        for o in range(1, max_order + 1):
            acc_lo = zero
            acc_hi = zero
            for j in range(o):
                c = coef_ref[g, o - 1, j]              # SMEM scalar
                acc_lo = acc_lo + (c & i32(255)) * lags[j]
                acc_hi = acc_hi + (c >> i32(8)) * lags[j]
            # pred = (acc_hi*256 + acc_lo) >> shift, evaluated mod 2^32
            # via normalised limbs H,L (res wraps to int32 anyway,
            # matching the C (int32_t) cast)
            H = acc_hi + (acc_lo >> i32(8))
            L = acc_lo & i32(255)
            k = shift_ref[g, 0, o - 1]
            shl = jnp.maximum(i32(8) - k, i32(0))
            shr = jnp.maximum(k - i32(8), i32(0))
            pred = jnp.where(k < i32(8),
                             (H << shl) + (L >> jnp.minimum(k, i32(8))),
                             H >> shr)
            res = s - pred
            # zigzag as an int32 bit pattern (== the uint32 value mod
            # 2^32); limb extraction needs no unsigned ops: & 0xFFFF
            # yields 0..65535 either way, and (z>>16)&0xFFFF recovers
            # the logical high half from the arithmetic shift
            z = (i32(2) * res) ^ (res >> i32(31))
            z = jnp.where(idx < i32(o), zero, z)       # warm-up excl.
            limbs.append(z & i32(0xFFFF))
            limbs.append((z >> i32(16)) & i32(0xFFFF))

        # [max_order*2*rows, 128] x [128, ppr] -> per-partition limb sums
        big = jnp.concatenate(limbs, axis=0).astype(jnp.float32)
        sums = jax.lax.dot_general(
            big, gmask, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        sums = sums.reshape(max_order, 2, rows, ppr)
        lo_ref[g] = sums[:, 0]
        hi_ref[g] = sums[:, 1]


@functools.partial(jax.jit, static_argnames=(
    "max_order", "pmax_static", "interpret"))
def sweep_partition_limbs(samples, coefs, shifts, *, max_order: int,
                          pmax_static: int, interpret: bool = False):
    """Partition limb sums of every candidate order's zigzag residual.

    samples int32 [N, B] (17-bit signed), coefs int32 [N, >=max_order,
    32], shifts int32 [N, >=max_order]. Returns (lo, hi) int32
    [N, max_order, B // gs] with gs = min(B >> pmax_static, 128); sums
    are exact (each limb sum <= 128 * 0xFFFF).
    """
    N, B = samples.shape
    rows = B // 128
    psize = B >> pmax_static
    gs = min(psize, 128)
    ppr = 128 // gs
    group = 8
    while N % group:
        group //= 2
    coefs = coefs[:, :max_order, :max_order].astype(jnp.int32)
    shifts = shifts[:, :max_order].astype(jnp.int32)

    kernel = functools.partial(_sweep_kernel, rows=rows,
                               max_order=max_order, gs=gs, group=group,
                               interpret=interpret)
    out_shape = [
        jax.ShapeDtypeStruct((N, max_order, rows, ppr), jnp.int32),
        jax.ShapeDtypeStruct((N, max_order, rows, ppr), jnp.int32),
    ]
    lo, hi = pl.pallas_call(
        kernel,
        grid=(N // group,),
        in_specs=[
            pl.BlockSpec((group, max_order, max_order),
                         lambda i: (i, _z(), _z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, max_order), lambda i: (i, _z(), _z()),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, rows, 128), lambda i: (i, _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, max_order, rows, ppr),
                         lambda i: (i, _z(), _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, max_order, rows, ppr),
                         lambda i: (i, _z(), _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(coefs, shifts.reshape(N, 1, max_order),
      samples.reshape(N, rows, 128))
    return (lo.reshape(N, max_order, rows * ppr),
            hi.reshape(N, max_order, rows * ppr))
