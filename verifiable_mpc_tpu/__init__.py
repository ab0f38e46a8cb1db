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
               fused: bool = True, bn2: bool = False):
    """Install the TPU kernel backends (MSM / generator fold / batch-exp over
    Ed25519, NTT polynomial products) behind the host protocol layer.

    `fused=True` uses the fused limb-major Pallas MSM/fold kernels
    (ops/msm_pallas.py); the plain-XLA kernels (ops/msm.py) remain for
    batch-exp and as the `fused=False` fallback.

    The result is a HYBRID backend — the performance-correct shape for a
    network-attached accelerator: the C++ host tier handles batches below
    ``min_msm_batch`` (the tunnel's ~25 ms round-trip floor exceeds host
    compute there) and serves as the sub-cutover tail of the TPU-resident
    protocol-4 engine (ac20/pivot_tpu.py), while everything at scale runs
    on the TPU kernels.

    Imports jax lazily; host-only deployments never pay for it.
    """
    from . import native
    from .ac20 import pivot_tpu
    from .ops import msm, ntt

    native.register()  # C++ host tier: sub-batch fallback + engine tail
    msm.register(min_msm_batch)
    if fused:
        from .ops import bn2_pallas, bn_pallas, msm_pallas

        msm_pallas.register(min_msm_batch)  # overrides msm/fold backends
        bn_pallas.register(min_msm_batch)  # BN256 G1 (Pinocchio MSMs)
        if bn2:
            # opt-in: the GF(p^2) twist kernels compile for tens of
            # minutes per shape on the tunnel service (the keygen w-terms
            # run in seconds on the C++ comb) — validated on hardware by
            # probes/probe_bn2.py, not part of the default hybrid
            bn2_pallas.register(min_msm_batch)  # BN256 twist
        pivot_tpu.enable()  # TPU-resident protocol-4 engine

        if native.REGISTERED:
            # tiered dispatch: below the TPU batch threshold the C++ tier
            # serves the call (the compression tail, tiny commitments) —
            # otherwise those batches fall to the pure-Python tree
            # reduction, which costs seconds per prove at 2^16
            from .groups.bn256 import BNPoint, BNTwistPoint
            from .groups.edwards import EdwardsPoint
            from .ops import dispatch

            def _tier(table, cls, native_fn, pick):
                if cls not in table:
                    # class not on the TPU (e.g. the twist without bn2=True):
                    # the C++ registration from native.register() stands
                    return
                tpu_fn, tmin = table[cls]

                def fn(*args, _t=tpu_fn, _m=tmin, _n=native_fn, _p=pick):
                    if len(_p(args)) >= _m:
                        return _t(*args)
                    return _n(*args)

                table[cls] = (fn, 8)

            first = lambda a: a[0]
            exps = lambda a: a[1]
            _tier(dispatch._MSM_BACKENDS, EdwardsPoint, native.ed_msm, first)
            _tier(dispatch._FOLD_BACKENDS, EdwardsPoint, native.ed_fold,
                  first)
            _tier(dispatch._BATCH_EXP_BACKENDS, EdwardsPoint,
                  native.ed_batch_exp, exps)
            _tier(dispatch._MSM_BACKENDS, BNPoint, native.bn_msm, first)
            _tier(dispatch._BATCH_EXP_BACKENDS, BNPoint,
                  native.bn_batch_exp, exps)
            _tier(dispatch._MSM_BACKENDS, BNTwistPoint, native.bn2_msm,
                  first)
            _tier(dispatch._BATCH_EXP_BACKENDS, BNTwistPoint,
                  native.bn2_batch_exp, exps)
    ntt.register(min_poly_len)


def enable_multichip(mesh=None, min_msm_batch: int = 64,
                     fused: bool | None = None, chunk: int | None = None,
                     sub: int = 8, axis: str = "shard",
                     min_poly_len: int = 1 << 14):
    """Shard the prover's MSM / generator-fold hot path over a device mesh.

    Registers ``parallel.mesh.sharded_msm[_fused]`` / ``sharded_fold[_fused]``
    as the :mod:`ops.dispatch` backends for Ed25519, so the FULL protocol
    stack — Pedersen commitments (reference pivot.py:139-145), protocol-4
    A/B commitments and generator folds (compressed_pivot.py:29-86) — runs
    partitioned over the mesh with the all_gather + tree-reduce combine.
    Batches below ``min_msm_batch`` (the compression tail) stay on the host
    backend; group-element values are identical either way, so proofs are
    byte-identical to single-device runs (tests/test_multichip_prover.py).

    ``fused`` selects the limb-major Pallas kernels (default on TPU); the
    plain-XLA bit-serial kernels are the default on CPU, where Pallas
    interpret mode is orders of magnitude slower.  Returns the mesh."""
    import jax

    from .groups.edwards import EdwardsPoint
    from .ops import dispatch
    from .parallel import mesh as pmesh

    mesh = mesh or pmesh.default_mesh()
    if fused is None:
        fused = jax.default_backend() != "cpu"

    if fused:
        ck = chunk or 128

        def _msm(pts, ss):
            return pmesh.sharded_msm_fused(
                pts, ss, mesh=mesh, chunk=ck, sub=sub, axis=axis
            )

        def _fold(gl, gr, c):
            return pmesh.sharded_fold_fused(
                gl, gr, c, mesh=mesh, chunk=ck, sub=sub, axis=axis
            )

    else:
        ck = chunk or 8

        def _msm(pts, ss):
            return pmesh.sharded_msm(pts, ss, mesh=mesh, chunk=ck, axis=axis)

        def _fold(gl, gr, c):
            return pmesh.sharded_fold(gl, gr, c, mesh=mesh, axis=axis)

    dispatch.register_msm_backend(EdwardsPoint, _msm, min_msm_batch)
    dispatch.register_fold_backend(EdwardsPoint, _fold, min_msm_batch)

    if fused:
        # BN256 G1 shards through the same curve-generic fused machinery:
        # Pinocchio's eight proof MSMs (reference pynocchio.py:228-273)
        # partition over the mesh exactly like the Pedersen commitments
        from .groups.bn256 import BNPoint
        from .ops import bn_pallas

        def _bn_msm(pts, ss):
            return pmesh.sharded_msm_fused(
                pts, ss, mesh=mesh, chunk=ck, sub=sub, axis=axis,
                curve=bn_pallas.BN,
            )

        dispatch.register_msm_backend(BNPoint, _bn_msm, min_msm_batch)

    # polynomial hot spots (QAP h-computation, subproduct trees): exact
    # integer products >= min_poly_len route through the four-step
    # distributed NTT (two all_to_all transposes per transform)
    from .ops import ntt
    from .parallel import ntt_mesh

    ntt.register_mesh_backend(
        lambda a, b: ntt_mesh.four_step_poly_mul_ints(a, b, mesh=mesh,
                                                      axis=axis),
        min_poly_len,
    )
    return mesh


def enable_native(min_batch: int = 8, min_poly_len: int = 128):
    """Install the C++ host tier (Pippenger MSM etc.) as the dispatch backend
    for Ed25519.  Returns False if no toolchain is available."""
    from . import native

    ok = native.register(min_batch)
    if ok:
        # large polynomial products (KoE's product-polynomial argument,
        # QAP paths) route through the C CRT NTT — previously only
        # enable_tpu registered this, so the native KoE prove ran the
        # O(n^2) gf schoolbook (minutes at 2^12)
        from .ops import ntt

        ntt.register(min_poly_len)
    return ok
