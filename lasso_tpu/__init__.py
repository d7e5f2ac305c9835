"""lasso-tpu: a TPU-native Lasso lookup-argument framework (JAX/XLA/Pallas).

See README.md and SURVEY.md for the architecture map against the a16z/Lasso
reference.
"""

import os

import jax

# Persistent XLA compilation cache: the limb/curve kernels compile once per
# (shape, config) and are reused across processes, proofs and benches.
_cache_dir = os.environ.get(
    "LASSO_TPU_XLA_CACHE", os.path.expanduser("~/.cache/lasso_tpu_xla"))
# Separate namespace per forced platform: XLA:CPU AOT entries embed host
# machine features and cross-load noisily (and riskily) against entries
# written under the default (TPU-tunnel) process configuration.  The CPU
# namespace is further keyed by the host's CPU feature set: this VM can be
# rescheduled onto different hardware between sessions, and stale AOT
# entries from another machine SIGILL/segfault on load (observed: repeated
# hard crashes in compilation-cache read/write during `make ci`).
_plat = os.environ.get("LASSO_TPU_PLATFORM")
if _plat:
    _cache_dir = os.path.join(_cache_dir, _plat)
    if _plat == "cpu":
        import hashlib

        try:
            with open("/proc/cpuinfo") as _f:
                _flags = [ln for ln in _f if ln.startswith("flags")][:1]
            _tag = hashlib.sha256(
                "".join(_flags).encode()).hexdigest()[:12]
        except OSError:
            _tag = "unknown"
        _cache_dir = os.path.join(_cache_dir, _tag)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # Cache EVERYTHING, including sub-second compiles: under the tunneled
    # backend every compile -- even a trivial reshape/broadcast dispatch op --
    # costs a ~0.4s remote-compile round trip, and a prove pass dispatches
    # hundreds of such ops.  With the 1s threshold they were recompiled every
    # process (~150-250s of pure compile overhead per CLI run).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax without these flags
    pass

__version__ = "0.1.0"
