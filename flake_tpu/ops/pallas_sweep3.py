"""Pallas TPU sweep kernel v3: transposed (streams-along-lanes) layout.

Computes, for every candidate LPC order o in 1..max_order, the Rice
partition limb sums of that order's residual — the O(B * order) heart
of the subframe search (optimize.c:224-261) — entirely VMEM-resident.

v2 (ops/pallas_sweep.py) processed one stream at a time with SMEM
scalar coefficients and a tiny per-stream MXU matmul for the partition
reduction; measured 3.96 ms vs 2.38 ms XLA at level 8 (docs/PERF.md).
v3 transposes the layout: samples run along SUBLANES, 128 streams along
LANES, so

- per-(order, tap) coefficient limbs are natural [1, 128] lane vectors
  broadcast over sublanes (the bias-add pattern);
- lag views are sublane-offset static slices of a halo'd block, hoisted
  once per sample-chunk and reused by all orders;
- partition sums are sublane-group reductions (reshape + sum), no MXU.

Same arithmetic as the XLA path: coef-limb int32 accumulation (bps<=16
after mid/side), C int32 wraparound, zigzag mod 2^32, 16-bit limb
partition sums — bit-identical Rice costs.

Constraints (callers fall back to the XLA path otherwise):
  - bps <= 16 (narrow limbs)
  - psize = B >> pmax_static is a multiple of 8 (sublane tiling)
  - B % psize == 0, B >= psize, max_order <= 32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _z():
    return jnp.int32(0)


def supports(block_size: int, bps: int, pmax_static: int,
             max_order: int) -> bool:
    if bps > 16 or max_order > 32:
        return False
    psize = block_size >> pmax_static
    if psize * (1 << pmax_static) != block_size:
        return False
    if psize % 8 != 0 or psize < 8:
        return False
    # VMEM envelope: grid blocks are double-buffered, so the scoped
    # footprint is 2x the input column [halo+B, 128] i32 + 2x both
    # output limb blocks [max_order, parts, 128] + 2x the coef limb
    # blocks, plus ~6 chunk-sized temporaries — all within the ~16
    # MB/core budget. B=8192/order32/parts256 measures 26.1 MB scoped
    # (AOT compiler) and MUST fall back to the XLA sweep; the level-8
    # config (13.7 MB by this estimate) compiles and runs.
    halo = -(-max(max_order, 1) // 8) * 8
    parts = 1 << pmax_static
    ppc = max(1, min(parts, 1024 // psize))
    while parts % ppc:
        ppc -= 1
    chunk = ppc * psize
    est = (2 * (halo + block_size) * LANE * 4
           + 4 * max_order * parts * LANE * 4
           + 4 * max_order * max_order * LANE * 4
           + 6 * chunk * LANE * 4)
    return est <= 15 * 1024 * 1024


def _sweep3_kernel(x_ref, clo_ref, chi_ref, shl_ref, shr_ref, klo_ref,
                   out_lo_ref, out_hi_ref, *, halo: int, b: int,
                   chunk: int, max_order: int, psize: int):
    i32 = jnp.int32
    n_chunks = b // chunk
    ppc = chunk // psize                       # partitions per chunk

    x = x_ref[:]                               # [halo + b, 128] int32

    for c in range(n_chunks):
        base = halo + c * chunk
        cur = x[base:base + chunk, :]          # aligned (halo, chunk % 8 == 0)
        # lag views hoisted once per chunk, shared by every order
        lags = [x[base - 1 - j:base - 1 - j + chunk, :]
                for j in range(max_order)]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (chunk, LANE), 0) \
            + i32(c * chunk)

        for o in range(1, max_order + 1):
            acc_lo = jnp.zeros((chunk, LANE), i32)
            acc_hi = jnp.zeros((chunk, LANE), i32)
            for j in range(o):
                clo = clo_ref[o - 1, j, :][None, :]   # [1, 128] -> bcast
                chi = chi_ref[o - 1, j, :][None, :]
                acc_lo = acc_lo + clo * lags[j]
                acc_hi = acc_hi + chi * lags[j]
            # pred = (acc_hi*256 + acc_lo) >> shift, mod 2^32 via
            # normalised limbs (the int32 cast wraps anyway)
            H = acc_hi + (acc_lo >> i32(8))
            L = acc_lo & i32(255)
            shl = shl_ref[o - 1, :][None, :]          # max(8 - k, 0)
            shr = shr_ref[o - 1, :][None, :]          # max(k - 8, 0)
            klo = klo_ref[o - 1, :][None, :]          # min(k, 8)
            pred = jnp.where(shr == 0, (H << shl) + (L >> klo), H >> shr)
            res = cur - pred
            z = (i32(2) * res) ^ (res >> i32(31))
            z = jnp.where(gidx < i32(o), i32(0), z)   # warm-up excl.
            zlo = z & i32(0xFFFF)
            zhi = (z >> i32(16)) & i32(0xFFFF)
            # partition sums: sublane-group reduction (psize % 8 == 0)
            slo = zlo.reshape(ppc, psize, LANE).sum(axis=1,
                                                    dtype=jnp.int32)
            shi = zhi.reshape(ppc, psize, LANE).sum(axis=1,
                                                    dtype=jnp.int32)
            out_lo_ref[o - 1, c * ppc:(c + 1) * ppc, :] = slo
            out_hi_ref[o - 1, c * ppc:(c + 1) * ppc, :] = shi


@functools.partial(jax.jit, static_argnames=(
    "max_order", "pmax_static", "interpret"))
def sweep_partition_limbs3(samples, coefs, shifts, *, max_order: int,
                           pmax_static: int, interpret: bool = False):
    """Partition limb sums of every candidate order's zigzag residual.

    samples int32 [N, B] (17-bit signed); coefs int32 [N, >=max_order,
    >=max_order] (row o-1 = order o's taps, zero beyond); shifts int32
    [N, >=max_order]. Returns (lo, hi) int32 [N, max_order, parts] with
    parts = 1 << pmax_static; sums are exact (limb sums < 2^24 * psize).
    """
    N, B = samples.shape
    psize = B >> pmax_static
    parts = 1 << pmax_static
    halo = -(-max(max_order, 1) // 8) * 8
    # chunk: a multiple of psize close to 1024 rows (VMEM working set)
    ppc = max(1, min(parts, 1024 // psize))
    while parts % ppc:
        ppc -= 1
    chunk = ppc * psize

    npad = -(-N // LANE) * LANE
    x = samples
    if npad != N:
        x = jnp.pad(x, ((0, npad - N), (0, 0)))
    x_t = jnp.pad(x.T, ((halo, 0), (0, 0)))          # [halo + B, npad]

    c = coefs[:, :max_order, :max_order].astype(jnp.int32)
    if npad != N:
        c = jnp.pad(c, ((0, npad - N), (0, 0), (0, 0)))
        shifts = jnp.pad(shifts[:, :max_order], ((0, npad - N), (0, 0)),
                         constant_values=1)
    sh = shifts[:, :max_order].astype(jnp.int32)
    clo_t = jnp.transpose(c & 255, (1, 2, 0))        # [o, j, npad]
    chi_t = jnp.transpose(c >> 8, (1, 2, 0))
    sh_t = sh.T                                      # [o, npad]
    shl_t = jnp.maximum(8 - sh_t, 0)
    shr_t = jnp.maximum(sh_t - 8, 0)
    klo_t = jnp.minimum(sh_t, 8)

    kernel = functools.partial(_sweep3_kernel, halo=halo, b=B,
                               chunk=chunk, max_order=max_order,
                               psize=psize)
    lo, hi = pl.pallas_call(
        kernel,
        grid=(npad // LANE,),
        in_specs=[
            pl.BlockSpec((halo + B, LANE), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, max_order, LANE),
                         lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, max_order, LANE),
                         lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, LANE), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, LANE), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, LANE), lambda i: (_z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((max_order, parts, LANE),
                         lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_order, parts, LANE),
                         lambda i: (_z(), _z(), i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_order, parts, npad), jnp.int32),
            jax.ShapeDtypeStruct((max_order, parts, npad), jnp.int32),
        ],
        interpret=interpret,
    )(x_t, clo_t, chi_t, shl_t, shr_t, klo_t)

    # [o, parts, npad] -> [N, o, parts]
    lo = jnp.transpose(lo, (2, 0, 1))[:N]
    hi = jnp.transpose(hi, (2, 0, 1))[:N]
    return lo, hi
