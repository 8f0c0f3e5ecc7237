"""Pallas TPU kernels for bitstream word-merge and stream compaction.

The XLA formulation of the device bitstream merge (ops/bitpack.py) is
algorithmically right but lands on this TPU's two pathological
primitives — per-element gathers (~21 ns/elem) and minor-axis cumsum —
costing ~350 ms per 512-frame batch. These kernels re-express the same
math with only operations the VPU does natively:

merge kernel (grid over frames, sequential):
  Slot payloads arrive pre-aligned from XLA as (word w0, hi, lo) —
  hi OR-ed into word w0, lo into w0+1, with disjoint bit extents so
  ADD == OR. Slots are processed in 128-slot chunks laid out on
  SUBLANES; for each 128-word output row the chunk overlaps, a
  broadcast compare (rel == lane-iota) one-hots every slot against the
  row's 128 word lanes and a sublane reduction sums the contributions
  — no gather, no scatter, no cross-lane shuffle. The row index is a
  scalar, so the read-modify-write into the frame's VMEM-resident word
  block is a dynamic-sublane slice (supported). Leading Rice zeros
  cost nothing (they only advance w0).

Chunk bit boundaries come from XLA as an SMEM table; the per-slot
offsets themselves are computed in XLA with a hierarchical log-shift
prefix (elementwise adds — the jnp.cumsum lowering is what's slow, not
the math).

Stream compaction deliberately has NO kernel: byte-offset placement is
not expressible as TPU DMAs (slices must be tile-aligned — verified:
1-D and 2-D refs both demand 4 KiB-granular offsets), so compaction is
a 4 KiB-granule block gather in plain XLA (ops/bitpack.py
gather_granules_jit, ~memory bandwidth) with byte-exact reassembly on
host during CRC patching.
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


def _merge_kernel(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *,
                  nc: int, wr: int):
    i32 = jnp.int32
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)

    for c in range(nc):
        wcol = w0t_ref[0, :, c:c + 1]              # [128, 1] abs word
        hcol = hit_ref[0, :, c:c + 1]              # [128, 1]
        lcol = lot_ref[0, :, c:c + 1]
        base_bit = cb_ref[f, c]
        end_bit = cb_ref[f, c + 1]
        row0 = base_bit >> i32(12)                 # bit -> word -> row
        # last word any payload of this chunk can touch is the lo
        # spill of a payload ending at end_bit
        last_row = (((end_bit - 1) >> i32(5)) + 1) >> i32(7)
        last_row = jnp.maximum(last_row, row0)

        zero = jnp.zeros((LANE, LANE), i32)

        def body(row, carry):
            rel = wcol - row * LANE                # [128, 1]
            # explicit typed zeros: a weak python 0 in jnp.where under
            # x64 promotes via int64 and trips a runaway weak-type
            # conversion recursion while tracing inside fori_loop
            whi = jnp.where(rel == iota, jnp.broadcast_to(hcol,
                                                          (LANE, LANE)),
                            zero)                  # [128, 128]
            wlo = jnp.where(rel + 1 == iota,
                            jnp.broadcast_to(lcol, (LANE, LANE)), zero)
            # dtype pinned: under x64 jnp.sum(int32) promotes to int64
            # (numpy platform-int semantics), which Mosaic cannot lower
            win = jnp.sum(whi + wlo, axis=0, keepdims=True,
                          dtype=jnp.int32)                   # [1, 128]
            cur = out_ref[0, pl.ds(row, 1), :]
            out_ref[0, pl.ds(row, 1), :] = cur + win
            return carry

        # carry pinned i32: a weak python 0 becomes int64 under x64
        jax.lax.fori_loop(row0, last_row + 1, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("wr", "interpret"))
def merge_words(w0t, hit, lot, chunk_bits, *, wr: int,
                interpret: bool = False):
    """Merge aligned slot payloads into per-frame 32-bit word blocks.

    w0t/hit/lot int32 [F, 128, nc]: slot-in-chunk on the second axis
    (sublanes), chunk on the last; chunk_bits int32 [F, nc + 1]: bit
    cursor at each chunk boundary (last entry = total frame bits).
    Returns int32 [F, wr, 128]; word w of frame f is [f, w >> 7,
    w & 127] (big-endian bit order within the word).
    """
    F, _, nc = w0t.shape
    kernel = functools.partial(_merge_kernel, nc=nc, wr=wr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # chunk_bits rides SMEM whole
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, LANE, nc), lambda i, cb: (i, _z(), _z())),
            pl.BlockSpec((1, LANE, nc), lambda i, cb: (i, _z(), _z())),
            pl.BlockSpec((1, LANE, nc), lambda i, cb: (i, _z(), _z())),
        ],
        out_specs=pl.BlockSpec((1, wr, LANE),
                               lambda i, cb: (i, _z(), _z())),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, wr, LANE), jnp.int32),
        interpret=interpret,
    )(chunk_bits, w0t, hit, lot)


