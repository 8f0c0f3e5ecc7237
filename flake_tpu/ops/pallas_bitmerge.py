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
MASK31 = 2147483647


def _z():
    return jnp.int32(0)


# ---------------------------------------------------------------------------
# v5 merge (round 5): combined <=64-bit slot nodes, MXU one-hot matmuls
# ---------------------------------------------------------------------------
#
# ops/bitpack.py combines adjacent slots twice (pair -> quad, 64-bit
# payload cap, spills to full-capacity side arrays), so the kernel sees
# ~M/4 main nodes whose payloads span <= 3 words. Per 128-node chunk
# and output row, placement is ONE one-hot f32 matmul on the MXU:
# the node payload words are split into 8-bit quarters (12 value rows,
# exact in bf16 since disjoint-field sums stay < 256 per quarter) and
# multiplied against the transposed one-hot (rel == sublane-iota); the
# B/C word contributions are lane-rolled +1/+2 with carries threaded
# across the chunk's static rows. No gathers, no scatters, no fori
# loops, chunk-level pl.when only for the ~empty spill sets.
#
# Static row count per chunk (kmax) is derived from the config's worst
# average code length; content exceeding it (pathological Rice runs
# that still beat verbatim) is detected in XLA (`overflow`) and the
# caller re-packs that batch through the exact XLA formulation.

_f32 = jnp.float32


def _vals12(arow, brow, crow):
    """[16, 128] f32 value rows: 8-bit quarters of the A/B/C words
    (bf16-exact on the MXU), padded to 16 sublanes."""
    i32 = jnp.int32
    m8 = i32(0xFF)
    rows = []
    for w in (arow, brow, crow):
        if w is None:
            z = jnp.zeros_like(rows[0])
            rows += [z, z, z, z]
        else:
            rows += [((w >> 24) & m8).astype(_f32),
                     ((w >> 16) & m8).astype(_f32),
                     ((w >> 8) & m8).astype(_f32),
                     (w & m8).astype(_f32)]
    z = jnp.zeros_like(rows[0])
    return jnp.concatenate(rows + [z] * 4, axis=0)


def _roll(x, k, interpret):
    if interpret:
        return jnp.roll(x, k, axis=1)
    return pltpu.roll(x, jnp.int32(k), axis=1)


def _mxu_chunk(out_ref, fi, wrow, vals, row0, *, kmax, interpret):
    i32 = jnp.int32
    iota0 = jax.lax.broadcasted_iota(i32, (LANE, LANE), 0)
    lane = jax.lax.broadcasted_iota(i32, (1, LANE), 1)
    zrow = jnp.zeros((1, LANE), i32)

    def dorow(dr, prev_rb, prev_rc):
        rel = wrow - (row0 + dr) * LANE           # [1, 128] nodes
        ohT = jnp.where(rel == iota0, _f32(1.0), _f32(0.0))
        mm = jax.lax.dot_general(
            vals, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=_f32)
        r = mm.astype(i32)
        a = (r[0:1] << 24) + (r[1:2] << 16) + (r[2:3] << 8) + r[3:4]
        b = (r[4:5] << 24) + (r[5:6] << 16) + (r[6:7] << 8) + r[7:8]
        cc = (r[8:9] << 24) + (r[9:10] << 16) + (r[10:11] << 8) \
            + r[11:12]
        rb = _roll(b, 1, interpret)
        rc = _roll(cc, 2, interpret)
        win = a + jnp.where(lane >= 1, rb, zrow) \
            + jnp.where(lane >= 2, rc, zrow) \
            + jnp.where(lane < 1, prev_rb, zrow) \
            + jnp.where(lane < 2, prev_rc, zrow)
        cur = out_ref[fi, pl.ds(row0 + dr, 1), :]
        out_ref[fi, pl.ds(row0 + dr, 1), :] = cur + win
        return rb, rc

    rb, rc = dorow(0, zrow, zrow)
    for dr in range(1, kmax):
        rb, rc = dorow(dr, rb, rc)


def _merge_combined_kernel(cb2_ref, cb1_ref,
                           mw_ref, mv_ref,
                           s2w_ref, s2a_ref, s2b_ref, s2c_ref,
                           s1w_ref, s1a_ref, s1b_ref,
                           out_ref, *, nc2, nc1, fb, wr, kmax, kmax1,
                           interpret):
    i32 = jnp.int32
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)

    for fi in range(fb):
        f = g * fb + fi
        for c in range(nc2):
            row0 = (cb2_ref[f, c] & i32(MASK31)) >> i32(12)
            # main-chunk value rows arrive pre-quartered as f32 from
            # XLA (fused into the align prep): building them in-kernel
            # cost ~36 tiny [1,128] VPU ops per chunk, which dominated
            # the kernel (time was ~invariant to kmax)
            vals = mv_ref[fi, c]
            _mxu_chunk(out_ref, fi, mw_ref[fi, c:c + 1, :], vals,
                       row0, kmax=kmax, interpret=interpret)

            @pl.when(cb2_ref[f, c] < 0)
            def _(fi=fi, c=c, row0=row0):
                sv = _vals12(s2a_ref[fi, c:c + 1, :],
                             s2b_ref[fi, c:c + 1, :],
                             s2c_ref[fi, c:c + 1, :])
                _mxu_chunk(out_ref, fi, s2w_ref[fi, c:c + 1, :], sv,
                           row0, kmax=kmax, interpret=interpret)

        for c in range(nc1):
            @pl.when(cb1_ref[f, c] < 0)
            def _(fi=fi, c=c):
                row0 = (cb1_ref[f, c] & i32(MASK31)) >> i32(12)
                sv = _vals12(s1a_ref[fi, c:c + 1, :],
                             s1b_ref[fi, c:c + 1, :], None)
                _mxu_chunk(out_ref, fi, s1w_ref[fi, c:c + 1, :], sv,
                           row0, kmax=kmax1, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("wr", "kmax", "kmax1",
                                             "interpret"))
def merge_combined(mainw, mainr, sp2w, sp2r, sp1w, sp1r, cb2, cb1, *,
                   wr: int, kmax: int, kmax1: int,
                   interpret: bool = False):
    """Merge combined slot nodes into per-frame word blocks.

    mainw/sp2w/sp1w int32 [F, nc, 128]: node target word (w0), row
    layout (node-in-chunk on lanes). mainr/sp2r: (A, B, C) aligned
    word contributions, same layout; sp1r: (A, B) only (<=32-bit
    payloads span 2 words). cb2/cb1 int32 [F, nc+1]: chunk-boundary
    bit cursors with the spill-set activity flag in the sign bit.
    Returns int32 [F, wr, 128] (same contract as :func:`merge_words`).
    """
    F = mainw.shape[0]
    nc2 = mainw.shape[1]
    nc1 = sp1w.shape[1]
    # pre-quarter the main-chunk value rows in XLA (fuses into the
    # align prep; elementwise + bandwidth, vs ~36 tiny per-chunk VPU
    # ops in-kernel): [F, nc2, 16, 128] f32, rows = 8-bit quarters of
    # the A/B/C aligned words, 4 zero pad rows
    mA, mB, mC = mainr
    m8 = jnp.int32(0xFF)
    qrows = [((w >> s) & m8).astype(_f32)
             for w in (mA, mB, mC) for s in (24, 16, 8, 0)]
    qrows += [jnp.zeros_like(qrows[0])] * 4
    mvals = jnp.stack(qrows, axis=2)           # [F, nc2, 16, 128]
    # interpret mode (CPU tests) executes the kernel as one giant XLA
    # graph per program: keep it per-frame so the unrolled body stays
    # small enough for XLA:CPU's JIT code allocator
    fb = 1 if interpret else next(b for b in (8, 4, 2, 1)
                                  if F % b == 0)
    kernel = functools.partial(
        _merge_combined_kernel, nc2=nc2, nc1=nc1, fb=fb, wr=wr,
        kmax=kmax, kmax1=kmax1, interpret=interpret)

    def rspec(ncx):
        return pl.BlockSpec((fb, ncx, LANE),
                            lambda i, *_: (i, _z(), _z()))

    vspec = pl.BlockSpec((fb, nc2, 16, LANE),
                         lambda i, *_: (i, _z(), _z(), _z()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F // fb,),
        in_specs=[rspec(nc2), vspec] + [rspec(nc2)] * 4
        + [rspec(nc1)] * 3,
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, wr, LANE), jnp.int32),
        interpret=interpret,
    )(cb2, cb1, mainw, mvals, sp2w, *sp2r, sp1w, *sp1r)


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


