"""Test configuration: force a virtual 8-device CPU mesh for JAX.

Sharding logic is tested on a host-simulated mesh (the driver separately
dry-runs the multi-chip path); kernels are validated on CPU for
determinism and in CI environments without a TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment may pre-set JAX_PLATFORMS to a TPU plugin (e.g. axon)
# in a way the env var alone does not override — force it via config too
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's wall time is dominated by XLA CPU
# compiles of the batched pipeline; caching makes re-runs fast
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def make_test_signal(n: int, channels: int = 2, bps: int = 16,
                     seed: int = 0, kind: str = "music") -> np.ndarray:
    """Deterministic synthetic audio: tonal + noise mix resembling music
    (predictable enough for LPC to bite, noisy enough to exercise Rice)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    amp = (1 << (bps - 1)) - 1
    out = np.zeros((n, channels), dtype=np.float64)
    if kind == "music":
        for c in range(channels):
            f0 = 220.0 * (1 + 0.25 * c)
            env = 0.5 + 0.5 * np.sin(2 * np.pi * t / max(n, 1) * 2.0)
            sig = (0.55 * np.sin(2 * np.pi * f0 * t / 44100.0)
                   + 0.25 * np.sin(2 * np.pi * 2.01 * f0 * t / 44100.0)
                   + 0.05 * rng.standard_normal(n))
            out[:, c] = env * sig * 0.6
    elif kind == "noise":
        out = rng.standard_normal((n, channels)) * 0.8
    elif kind == "silence":
        pass
    elif kind == "constant":
        out[:] = 0.123
    elif kind == "impulse":
        out[n // 2] = 0.9
    return np.clip(np.rint(out * amp), -amp - 1, amp).astype(np.int32)


@pytest.fixture
def test_signal():
    return make_test_signal
