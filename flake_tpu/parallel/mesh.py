"""Multi-chip encoding: frame data-parallelism + in-frame sequence
parallelism over a jax.sharding.Mesh.

The reference is single-threaded (SURVEY §2.5-2.6); the TPU design
shards *frames* across chips (frames are self-contained: warm-up samples
are in-frame, frame numbers derive from global offsets) and, within a
frame, can shard the O(B*lag) autocorrelation over a second mesh axis
with a ppermute halo exchange + psum — collectives ride ICI, exactly the
pattern the format's independence makes free.

Axes:
  dp — frames (pure data parallel; the throughput axis)
  sp — samples within a frame (sequence parallel for the analysis
       reductions; halo = max LPC order)

Stream assembly needs only: per-frame byte lengths (device->host gather),
a global max-frame-size reduction (lax.pmax here; metadata.c:54), and the
host-side MD5 chain over raw input bytes in shard order (md5.c:281-320 —
inherently sequential, overlapped with device compute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from flake_tpu.ops.frame import FrameConfig, analyze_frames


def make_mesh(n_devices: int | None = None, sp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % sp == 0
    return Mesh(devices.reshape(n_devices // sp, sp), ("dp", "sp"))


def autocorr_sp(chans, max_order: int, window, mesh_axis: str = "sp"):
    """Sequence-parallel windowed autocorrelation.

    Runs inside shard_map with the sample axis sharded over
    ``mesh_axis``: each rank computes lag products over its local
    window plus a halo of ``max_order`` samples fetched from the left
    neighbour via ppermute, then psums partial lag sums. Bitwise
    equality with the single-device version is not guaranteed (float
    summation order) — both produce valid encodings.

    chans: int32 [F, C, Bs] local shard of the sample axis.
    window: float [Bs] local shard of the Welch window.
    Returns [F, C, max_order+1] replicated over ``mesh_axis``.
    """
    axis_size = jax.lax.psum(1, mesh_axis)
    idx = jax.lax.axis_index(mesh_axis)
    d = chans.astype(window.dtype) * window

    # halo: last max_order windowed samples of the left neighbour
    halo = d[..., -max_order:]
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    halo = jax.lax.ppermute(halo, mesh_axis, perm)
    halo = jnp.where(idx == 0, 0.0, halo)  # stream start has no left ctx
    ext = jnp.concatenate([halo, d], axis=-1)  # [F, C, max_order + Bs]

    n_local = d.shape[-1]
    cols = []
    for lag in range(max_order + 1):
        start = max_order - lag
        s = jnp.sum(d * ext[..., start:start + n_local], axis=-1)
        cols.append(s)
    partial = jnp.stack(cols, axis=-1)
    total = jax.lax.psum(partial, mesh_axis)
    # the reference's +2.0 accumulator bias (lpc.c:57-67), added once
    return total + 2.0


def analyze_frames_sharded(samples, cfg: FrameConfig, hdr_bits,
                           mesh: Mesh):
    """Frame-sharded batched analysis under shard_map.

    samples int32 [F, B, C] with F divisible by mesh dp size. Returns the
    host-side analysis pytree plus the globally reduced max frame size.
    Everything per-frame stays local to its dp shard; the only
    collective is the lax.pmax for STREAMINFO's max_frame_size.
    """

    def local(samples_l, hdr_l):
        out = analyze_frames(samples_l, cfg, hdr_l)
        fb = out["frame_bytes"]
        gmax = jax.lax.pmax(jnp.max(fb), "dp") if fb is not None else None
        gmax = jax.lax.pmax(gmax, "sp") if gmax is not None else None
        out["global_max_frame_bytes"] = gmax
        return out

    fb_spec = {k: PS("dp") for k in (
        "ch_mode obits wasted sf_type type_code order coefs shift "
        "porder method rice_params residual frame_bytes").split()}
    fb_spec["global_max_frame_bytes"] = PS()

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(PS("dp"), PS("dp")),
        out_specs=fb_spec,
        check_vma=False)
    return shard(samples, hdr_bits)


def make_sharded_analyzer(cfg: FrameConfig, mesh: Mesh):
    """A reusable jitted multi-chip analysis step: places inputs with
    dp NamedShardings and runs analyze_frames_sharded. Build once per
    (cfg, mesh) and call per batch — the jit cache then hits."""
    dp_sharding = NamedSharding(mesh, PS("dp"))
    step = jax.jit(functools.partial(analyze_frames_sharded, cfg=cfg,
                                     mesh=mesh))

    def run(samples, hdr_bits):
        samples = jax.device_put(samples, dp_sharding)
        hdr_bits = jax.device_put(hdr_bits, dp_sharding)
        return step(samples, hdr_bits=hdr_bits)

    return run


def training_step_sharded(samples, cfg: FrameConfig, hdr_bits,
                          mesh: Mesh):
    """The full jitted multi-chip step: device analysis under real
    shardings (the driver's dry-run target)."""
    return make_sharded_analyzer(cfg, mesh)(samples, hdr_bits)
