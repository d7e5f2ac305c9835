import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The host is a 1-core VM; the real compute device is the tunneled TPU chip,
# so tests run on the default (TPU) backend.  Multi-chip sharding tests use a
# separate virtual 8-device CPU mesh (jax.devices("cpu")) alongside it --
# the config knob below must be set before the CPU client initializes.
import jax  # noqa: E402

# Fast-CPU profile: LASSO_TPU_PLATFORM=cpu forces the whole suite onto the
# host CPU backend (the axon plugin ignores JAX_PLATFORMS, so this must be a
# jax.config update before backend init).  Combine with a small
# LASSO_TPU_SUMCHECK_FIX to keep XLA:CPU compiles tractable -- see `make ci`.
_platform = os.environ.get("LASSO_TPU_PLATFORM")
if _platform:
    try:
        jax.config.update("jax_platforms", _platform)
    except Exception:
        pass
    if _platform == "cpu":
        # The CPU profile checks correctness, not CPU codegen quality: turn
        # LLVM optimization off.  The unrolled limb-field graphs otherwise
        # take minutes per program to compile on this 1-core host (same
        # rationale as __graft_entry__.dryrun_multichip).
        _flags = os.environ.get("XLA_FLAGS", "")
        for _f in ("--xla_backend_optimization_level=0",
                   "--xla_llvm_disable_expensive_passes=true"):
            if _f not in _flags:
                _flags = (_flags + " " + _f).strip()
        os.environ["XLA_FLAGS"] = _flags

try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
