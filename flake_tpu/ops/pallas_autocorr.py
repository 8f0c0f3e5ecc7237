"""Pallas TPU kernel for the compensated windowed autocorrelation.

The level-8 analysis cost is dominated by the autocorrelation front-end
(lpc.c:46-71): the pure-XLA compensated formulation (ops/lpc.py
autocorr_dd) is exact-product f32 but accumulates each lag's product
stream with emulated-float64 adds over the full block — measured ~80%
of the whole pipeline (docs/PERF.md). This kernel keeps the windowed
double-float stream VMEM-resident and accumulates with error-free f32
TwoSums instead: per (row, lag) it maintains a 128-lane compensated
accumulator pair and only the tiny [lags, 128] partials leave the chip,
where XLA finishes the reduction in float64 (128 terms instead of B).

Numerics: products are exact (Dekker TwoProd on the pre-split window),
the hi-stream accumulation is error-free (TwoSum), and only the lo
stream rounds — the same ~2^-45 relative error as the XLA autocorr_dd
path, which the byte-parity suite gates. The +2.0 lag bias
(lpc.c:57-67) is added by the caller.

Layout: grid over row blocks of R (frame, channel) streams; each block
loads int32 samples [R, W] once (W = padded block + 128-lane halo so
every lag view is a static in-VMEM slice), converts + windows on the
VPU, and runs the lag/group accumulation loops entirely in VMEM.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_HALO = 128  # supports lags < 128 (MAX_LPC_ORDER is 32)


def _z():
    """index_map zero as i32 (x64-mode weak ints trace to i64)."""
    return jnp.int32(0)


def supports(block_size: int, max_order: int) -> bool:
    """Whether the kernel's VMEM working set fits for this shape.

    The block holds ~10 live f32 [rows, W] streams (input + windowed
    double-float pair + their splits + product temporaries), so the
    footprint grows linearly with the padded block size; legal FLAC
    block sizes reach 65535 (>20 MB working set), which must fall back
    to the XLA paths instead of failing Mosaic compilation at encode
    time. The envelope below (~6 MB at B=8192, the largest preset and
    largest hardware-validated config — docs/RESULTS.md levels 11/12)
    stays well under the ~16 MB/core VMEM budget."""
    if max_order + 1 > MAX_HALO:
        return False
    bp = -(-block_size // LANE) * LANE
    est = 16 * (bp + MAX_HALO) * 4 * 10 \
        + 2 * 16 * (max_order + 1) * LANE * 4
    return est <= 8 * 1024 * 1024


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(v):
    """Dekker 12/12-bit split of f32 v (v == hi + lo exactly)."""
    c = v * jnp.float32(4097.0)
    hi = c - (c - v)
    return hi, v - hi


def _autocorr_kernel(x_ref, wh_ref, wh1_ref, wh2_ref, wl_ref,
                     hi_ref, lo_ref, *, rows: int, bp: int, lags: int,
                     wide: bool):
    f32 = jnp.float32
    G = bp // LANE

    if not wide:
        xf = x_ref[:].astype(f32)                 # [R, W], exact
        # d = x * w as a double-float pair: exact product against the
        # pre-split window halves, plus the low window contribution
        p = xf * wh_ref[:]
        x1, x2 = _split(xf)
        e = ((x1 * wh1_ref[:] - p) + x1 * wh2_ref[:]
             + x2 * wh1_ref[:]) + x2 * wh2_ref[:]
        d_hi = p
        d_lo = e + xf * wl_ref[:]
    else:
        # |x| can exceed 2^24 (24..32-bit content): split the INTEGER
        # into exact f32 limbs x = xa*2^12 + xb (xa <= 2^24, xb < 2^12
        # — both exact, and xa*2^12 is a power-of-two scale so it is
        # exact too), then d = x*w as dd from two exact TwoProds. Only
        # this prologue changes; the per-lag dd loop below is width-
        # agnostic once (d_hi, d_lo) is a faithful double-float.
        xi = x_ref[:]
        xa = (xi >> 12).astype(f32) * f32(4096.0)
        xb = (xi & 4095).astype(f32)   # x == (x>>12)*4096 + (x&4095)
        wh = wh_ref[:]
        pa = xa * wh
        a1, a2 = _split(xa)
        ea = ((a1 * wh1_ref[:] - pa) + a1 * wh2_ref[:]
              + a2 * wh1_ref[:]) + a2 * wh2_ref[:]
        pb = xb * wh
        b1, b2 = _split(xb)
        eb = ((b1 * wh1_ref[:] - pb) + b1 * wh2_ref[:]
              + b2 * wh1_ref[:]) + b2 * wh2_ref[:]
        s, es = _two_sum(pa, pb)
        d_hi = s
        d_lo = (ea + eb + es) + (xa + xb) * wl_ref[:]
    dh1, dh2 = _split(d_hi)

    a_hi = d_hi[:, :bp]
    a_lo = d_lo[:, :bp]
    a1 = dh1[:, :bp]
    a2 = dh2[:, :bp]

    for l in range(lags):
        if l == 0:
            b_hi, b_lo, b1, b2 = a_hi, a_lo, a1, a2
        else:
            b_hi = d_hi[:, l:l + bp]
            b_lo = d_lo[:, l:l + bp]
            b1 = dh1[:, l:l + bp]
            b2 = dh2[:, l:l + bp]
        # exact product pair: p + plo == a*b (TwoProd with both
        # operands' splits already in VMEM)
        p = a_hi * b_hi
        err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
        plo = err + (a_hi * b_lo + a_lo * b_hi)

        # error-free lane-parallel accumulation over the G lane groups:
        # TwoSum keeps the hi stream exact; the lo stream (TwoSum errors
        # + product tails) is itself Kahan-compensated so its f32
        # rounding stays ~2 ulp of the lo total instead of growing with G
        acc_hi = jnp.zeros((rows, LANE), f32)
        acc_lo = jnp.zeros((rows, LANE), f32)
        comp = jnp.zeros((rows, LANE), f32)
        for g in range(G):
            s, e2 = _two_sum(acc_hi, p[:, g * LANE:(g + 1) * LANE])
            acc_hi = s
            y = (e2 + plo[:, g * LANE:(g + 1) * LANE]) - comp
            t = acc_lo + y
            comp = (t - acc_lo) - y
            acc_lo = t
        hi_ref[:, l, :] = acc_hi
        lo_ref[:, l, :] = acc_lo - comp


@functools.partial(jax.jit, static_argnames=("max_order", "interpret",
                                             "wide"))
def autocorr_dd_pallas(x, window_hi, window_lo, *, max_order: int,
                       interpret: bool = False, wide: bool = False):
    """Compensated windowed autocorrelation, lags 0..max_order.

    x int32 [N, B]; window_{hi,lo} f32 [B] from
    :func:`flake_tpu.ops.lpc.split_window_f32`. ``wide`` handles
    |x| >= 2^24 (24..32-bit content) by splitting each sample into
    exact f32 limbs in the kernel prologue (round 5 — the hi-res path
    previously fell back to the emulated-f64 XLA autocorrelation).
    Returns float64 [N, max_order + 1] WITHOUT the +2.0 bias.
    """
    N, B = x.shape
    lags = max_order + 1
    bp = -(-B // LANE) * LANE
    W = bp + MAX_HALO

    # pad the stream axis to a whole number of 16-row blocks (sublane
    # tiling needs rows >= 8; shrinking rows for odd N violates it)
    rows = 16
    Np = -(-N // rows) * rows
    xp = jnp.pad(x, ((0, Np - N), (0, W - B)))
    wh = jnp.pad(window_hi.astype(jnp.float32), (0, W - B))
    wl = jnp.pad(window_lo.astype(jnp.float32), (0, W - B))
    wh1, wh2 = _split(wh)
    wh = wh.reshape(1, W)
    wh1 = wh1.reshape(1, W)
    wh2 = wh2.reshape(1, W)
    wl = wl.reshape(1, W)

    kernel = functools.partial(_autocorr_kernel, rows=rows, bp=bp,
                               lags=lags, wide=wide)
    wspec = pl.BlockSpec((1, W), lambda i: (_z(), _z()),
                         memory_space=pltpu.VMEM)
    hi, lo = pl.pallas_call(
        kernel,
        grid=(Np // rows,),
        in_specs=[
            pl.BlockSpec((rows, W), lambda i: (i, _z()),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec,
        ],
        out_specs=[
            pl.BlockSpec((rows, lags, LANE), lambda i: (i, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, lags, LANE), lambda i: (i, _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, lags, LANE), jnp.float32),
            jax.ShapeDtypeStruct((Np, lags, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wh, wh1, wh2, wl)

    # exact finish: 128 double-float partials per (row, lag) in f64
    return jnp.sum(hi[:N].astype(jnp.float64)
                   + lo[:N].astype(jnp.float64), axis=-1)
