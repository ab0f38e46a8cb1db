"""verifiable_mpc_tpu — TPU-native verifiable-MPC proof framework.

A from-scratch implementation of publicly verifiable secure multi-party
computation with the capabilities of `toonsegers/verifiable_mpc`:

* AC20 compressed Sigma-protocols (pivot / compressed / KoE) and the
  circuit-satisfiability protocol (Protocol 8) over Ed25519, BN256 and
  quadratic-residue groups,
* Pinocchio / Trinocchio QAP-based zk-SNARKs over the BN256 pairing,
* a Shamir-sharing MPC runtime so several parties can jointly produce proofs,
* all heavy primitives (fixed-limb field arithmetic, batched curve ops, MSM,
  NTT) as JAX/XLA/Pallas kernels with `shard_map` multi-chip scaling.
"""

__version__ = "0.1.0"

from . import fields
from . import groups


def _host_cpu_tag() -> str:
    """Host-CPU fingerprint for cache-dir isolation: XLA:CPU loads AOT
    executables compiled on a machine with different features with only a
    warning, and they can SIGILL/segfault (tests/conftest.py has the same
    guard).  TPU executables are target-coded, but CPU-backend programs
    (e.g. the multi-chip dryrun) share the cache dir."""
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


def enable_compile_cache(path: str | None = None):
    """Persistent XLA/Mosaic compile cache — first compile of each kernel
    shape costs 60-100 s on the TPU tunnel; reruns then load from disk."""
    import jax

    if path is None:
        path = f"/root/.cache/jax_vmpc_tpu_{_host_cpu_tag()}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def enable_tpu(min_msm_batch: int = 512, min_poly_len: int = 256,
               fused: bool = True):
    """Install the TPU kernel backends (MSM / generator fold / batch-exp over
    Ed25519, NTT polynomial products) behind the host protocol layer.

    `fused=True` uses the fused limb-major Pallas MSM/fold kernels
    (ops/msm_pallas.py); the plain-XLA kernels (ops/msm.py) remain for
    batch-exp and as the `fused=False` fallback.

    Imports jax lazily; host-only deployments never pay for it.
    """
    from . import native
    from .ops import msm, ntt

    native.enable_scalar_tier()  # host-side vector mod-p glue
    msm.register(min_msm_batch)
    if fused:
        from .ops import bn2_pallas, bn_pallas, msm_pallas

        msm_pallas.register(min_msm_batch)  # overrides msm/fold backends
        bn_pallas.register(min_msm_batch)  # BN256 G1 (Pinocchio MSMs)
        bn2_pallas.register(min_msm_batch)  # BN256 twist (keygen w-terms)
    ntt.register(min_poly_len)


def enable_native(min_batch: int = 8):
    """Install the C++ host tier (Pippenger MSM etc.) as the dispatch backend
    for Ed25519.  Returns False if no toolchain is available."""
    from . import native

    return native.register(min_batch)
