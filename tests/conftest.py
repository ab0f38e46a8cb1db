import os

# Protocol/kernel tests run on a virtual 8-device CPU mesh so that multi-chip
# sharding is exercised without TPU hardware (bench runs on the real chip).
# The axon sitecustomize forces JAX_PLATFORMS=axon, so override through the
# jax config instead of the environment.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402


def _cpu_tag() -> str:
    """Fingerprint the host CPU so the persistent cache never serves
    executables compiled on a machine with different features.  XLA:CPU
    loads such AOT results with only a warning ("+prefer-no-gather is not
    supported on the host machine ... could lead to execution errors such
    as SIGILL") and they have crashed the suite (segfaults previously
    attributed to executable (de)serialization)."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine()


jax.config.update("jax_platforms", "cpu")

# The PERSISTENT compilation cache is disabled for the whole CPU suite.
# History: round 1 observed segfaults inside executable.serialize() on
# shard_map programs (worked around with per-module no-cache fixtures);
# round 3 observed a SIGABRT inside _cache_read/get_executable_and_time
# deserializing a cached Pallas-interpret executable (test_bn_pallas) —
# XLA:CPU executable (de)serialization is simply not reliable for the
# program classes this suite compiles, and concurrent writers sharing the
# dir make it worse.  Compiling fresh is slower but deterministic; the TPU
# benches keep their own separate cache dir (enable_compile_cache).
jax.config.update("jax_enable_compilation_cache", False)
_ = _cpu_tag  # retained for callers that want a fingerprinted dir


def pytest_collection_modifyitems(session, config, items):
    """Run the multi-device shard_map modules FIRST.

    Root cause of the round-2 full-suite crashes: XLA:CPU's LLVM JIT
    segfaults while COMPILING the four-step NTT shard_map program
    (faulthandler: Fatal Python error inside
    jax/_src/compiler.py backend_compile_and_load, NOT in the persistent
    cache — the round-2 cache fixtures aimed at the wrong layer) once
    several hundred compilations have accumulated in the process.  The
    same tests pass standalone, i.e. when their compiles happen in a
    near-fresh process.  Ordering them first reproduces that known-good
    state inside the single suite run; the later modules compile only
    single-device programs, which have always been position-independent.
    """
    early = ("test_ntt_mesh", "test_parallel", "test_multichip_prover")
    items.sort(
        key=lambda it: 0 if any(e in it.nodeid for e in early) else 1
    )
