"""lasso-tpu: a TPU-native Lasso lookup-argument framework (JAX/XLA/Pallas).

See README.md and SURVEY.md for the architecture map against the a16z/Lasso
reference.
"""

import os

import jax

# Persistent XLA compilation cache: the limb/curve kernels compile once per
# (shape, config) and are reused across processes, proofs and benches.
_cache_env = os.environ.get("LASSO_TPU_XLA_CACHE")
_plat = os.environ.get("LASSO_TPU_PLATFORM")
if _cache_env in ("off", "0", "disable"):
    _cache_dir = None
elif _cache_env:
    _cache_dir = _cache_env
else:
    _cache_dir = os.path.expanduser("~/.cache/lasso_tpu_xla")
    # Separate namespace per forced platform: XLA:CPU AOT entries embed host
    # machine features and must not cross-load against entries written under
    # the default (TPU-tunnel) process configuration.  The CPU namespace is
    # further keyed by the host's CPU feature set (the VM can be rescheduled
    # onto different hardware between sessions).
    if _plat:
        _cache_dir = os.path.join(_cache_dir, _plat)
        if _plat == "cpu":
            import hashlib

            try:
                with open("/proc/cpuinfo") as _f:
                    _flags = [ln for ln in _f if ln.startswith("flags")][:1]
            except OSError:
                _flags = ["unknown"]
            # XLA:CPU AOT entries also embed tuning pseudo-features
            # (+prefer-no-gather etc.) that vary with XLA_FLAGS and the XLA
            # build — entries written under a different flag set or jax
            # version "cross-load" with E-level machine-type-mismatch errors
            # (MULTICHIP_r04 tail).  Key the namespace by the FULL config
            # fingerprint so each configuration gets its own namespace.
            _fp = "|".join(["".join(_flags), os.environ.get("XLA_FLAGS", ""),
                            jax.__version__])
            _tag = hashlib.sha256(_fp.encode()).hexdigest()[:12]
            _cache_dir = os.path.join(_cache_dir, _tag)
            # An additional caller-supplied tag fully isolates a namespace:
            # the driver dryrun (__graft_entry__) uses this so it only ever
            # loads entries its own configuration wrote -- entries written
            # by other CPU processes (pytest under load) have been observed
            # to carry mismatched AOT tuning features (+prefer-no-gather)
            # that the loader reports as E-level machine-type errors.
            _extra = os.environ.get("LASSO_TPU_XLA_CACHE_TAG")
            if _extra:
                _cache_dir = os.path.join(_cache_dir, _extra)

if _cache_dir is not None:
    # jax's LRUCache.put writes entries with a bare write_bytes -- NOT
    # atomically.  A process killed mid-write leaves a truncated executable
    # blob, and deserializing a truncated XLA:CPU executable SEGFAULTS the
    # next process that gets a cache hit on it (observed repeatedly during
    # `make ci` after abruptly-killed runs).  Patch the cache layer to write
    # via temp file + os.replace so entries are all-or-nothing.
    try:
        from jax._src import lru_cache as _jax_lru

        if not getattr(_jax_lru.LRUCache, "_lasso_atomic_put", False):
            _orig_write_bytes_put = _jax_lru.LRUCache.put

            def _atomic_put(self, key, val):
                if self.eviction_enabled:  # locking/eviction path: keep jax's
                    return _orig_write_bytes_put(self, key, val)
                if not key:
                    raise ValueError("key cannot be empty")
                cache_path = self.path / f"{key}{_jax_lru._CACHE_SUFFIX}"
                if cache_path.exists():
                    return
                tmp = cache_path.with_suffix(f".tmp.{os.getpid()}")
                try:
                    tmp.write_bytes(val)
                    os.replace(tmp, cache_path)
                except OSError:
                    try:
                        tmp.unlink()
                    except OSError:
                        pass

            _jax_lru.LRUCache.put = _atomic_put
            _jax_lru.LRUCache._lasso_atomic_put = True
    except Exception:  # pragma: no cover - jax internals moved
        pass

    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Cache EVERYTHING, including sub-second compiles.  TPU tunnel:
        # every compile, even a trivial reshape/broadcast dispatch op, costs
        # a ~0.4s remote-compile round trip, and a prove pass dispatches
        # hundreds of such ops (with the default 1s threshold they were
        # recompiled every process: ~150-250s overhead per run).  XLA:CPU:
        # the compiler itself segfaults intermittently under sustained
        # compile load on this host, so every avoided recompile is also
        # avoided crash exposure (`make ci` additionally runs one process
        # per test file to bound that exposure).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

__version__ = "0.1.0"
