"""Generator / CRS setup for the AC20 protocols.

Behavior parity with ``create_generators`` in reference
/root/reference/verifiable_mpc/ac20/circuit_sat_r1cs.py:47-93 (random-exponent
g/h/k for the (compressed) pivot; KoE trusted setup for the pairing pivot).

The n fixed-base exponentiations dispatch through ``ops.dispatch.batch_exp``
so large setups run as one batched TPU kernel.
"""

from __future__ import annotations

from enum import Enum

from .. import rng
from ..ops.dispatch import batch_exp


class PivotChoice(Enum):
    """Select pivot proof system (reference circuit_sat_r1cs.py:39-44)."""

    pivot = 1
    compressed = 2
    koe = 3


def create_generators(g_length, pivot_choice, group=None, progress_bar=False):
    """Create generators g, h, k (or the KoE public parameters)."""

    def create_g_h():
        assert group is not None
        h = group.generator
        random_exponents = rng.randvector(g_length, group.order, lo=1)
        g = batch_exp(h, random_exponents)
        return g, h

    def prime_encode_cache(g, h):
        """Pre-populate the device encode cache for [g ‖ h] — exactly the
        base list of the z-commitment, protocol 5's A commitment and the
        resident engine (they share one cache entry by element identity).
        One-time setup cost here instead of inside the first prove."""
        import sys

        mp = sys.modules.get("verifiable_mpc_tpu.ops.msm_pallas")
        if mp is None or not mp.REGISTERED or len(g) < 4096:
            return  # TPU backends not active (native/pure runs stay off-device)
        from ..groups.edwards import EdwardsPoint

        if type(h) is EdwardsPoint:
            from .. import native

            if native.fastser() is not None:
                mp.ed_encode_cached(list(g) + [h])

    if pivot_choice == PivotChoice.pivot:
        g, h = create_g_h()
        generators = {"g": g, "h": h}
        prime_encode_cache(g, h)
    elif pivot_choice == PivotChoice.compressed:
        g, h = create_g_h()
        k = group.generator ** rng.randrange(1, group.order)
        generators = {"g": g, "h": h, "k": k}
        prime_encode_cache(g, h)
    elif pivot_choice == PivotChoice.koe and isinstance(group, list):
        from . import knowledge_of_exponent as koe

        group1, group2 = group
        order = group1.order
        generators = koe.trusted_setup(
            group1.generator, group2.generator, g_length, order, progress_bar
        )
    else:
        raise NotImplementedError

    return generators
