"""Quick TPU check: adaptive-kmax merge parity vs XLA + slope timing.

Run from repo root on TPU: python util/prof_adaptive.py [level]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import flake_tpu
flake_tpu._enable_compile_cache_if_tpu()
from flake_tpu import params as P
from flake_tpu.ops import bitpack
from flake_tpu.ops.frame import FrameConfig

level = int(sys.argv[1]) if len(sys.argv) > 1 else 8
F, B, C, bps, sr = 512, 4096, 2, 16, 44100
p = P.set_defaults(level)
cfg = FrameConfig.from_params(p, C, bps, block_size=B)

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
    + 800 * rng.standard_normal(F * B)
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
x = jnp.asarray(np.stack([l, r], -1).reshape(F, B, C))

hdr_bits = jnp.full((F,), 48, jnp.int32)
nums = np.arange(F, dtype=np.int64)
hb, hn = bitpack.frame_header_bytes(
    nums, bs_code=P.blocksize_code(B), sr_code=P.samplerate_code(sr),
    allow_vbs=p.allow_vbs)
hbj, hnj = jnp.asarray(hb), jnp.asarray(hn)

out_k = bitpack.analyze_and_pack_jit(x, cfg, hdr_bits, hbj, hnj,
                                     backend="kernel")
out_x = bitpack.analyze_and_pack_jit(x, cfg, hdr_bits, hbj, hnj,
                                     backend="xla")
wk = np.asarray(out_k["words"])
wx = np.asarray(out_x["words"])
print("parity:", bool((wk == wx).all()),
      "overflow:", bool(out_k["overflow"]))


def rep(K):
    @jax.jit
    def g(xs):
        acc = jnp.zeros((), jnp.int32)
        for i in range(K):
            o = bitpack.analyze_and_pack_jit(
                xs + i, cfg, hdr_bits, hbj, hnj, backend="kernel")
            acc = acc + o["words"][0, 0, 0] + o["total_bits"][0]
        return acc
    return g


def wall(g):
    g(x).block_until_ready()
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        g(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


per = (wall(rep(5)) - wall(rep(1))) / 4
print(f"emit pipeline: {per*1000:.3f} ms/batch -> "
      f"{F*B/per/sr:.0f}x realtime")
