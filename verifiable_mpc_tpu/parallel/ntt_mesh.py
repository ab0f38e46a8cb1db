"""Multi-chip NTT: butterfly stages over a sharded coefficient vector.

The BASELINE north star calls for "NTT butterfly stages exchanged
all-to-all".  Rather than hand-scheduling the exchanges, the coefficient
tensor [n, limbs] is sharded over the mesh axis and the existing butterfly
program (gather -> Montgomery multiply -> scatter per stage) is jitted under
GSPMD: XLA partitions each stage's gathers into the collective-permute /
all-to-all traffic the index pattern requires — early stages are
shard-local, the final log2(ndev) stages cross shards.  This is the
"annotate shardings, let XLA insert collectives" recipe.

Verified on the virtual 8-device CPU mesh against the single-device engine.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import ntt
from .mesh import default_mesh


@functools.lru_cache(maxsize=None)
def _sharded_fns(n: int, mesh, axis: str):
    eng = ntt._engine(n)
    sharding = NamedSharding(mesh, P(axis, None))

    fwd = jax.jit(
        lambda x: eng._transform(x, eng.tw),
        in_shardings=(sharding,),
        out_shardings=sharding,
    )
    mul = jax.jit(
        eng.ctx.mul, in_shardings=(sharding, sharding), out_shardings=sharding
    )
    bwd = jax.jit(
        eng._inverse, in_shardings=(sharding,), out_shardings=sharding
    )
    return eng, sharding, fwd, mul, bwd


def sharded_poly_mul_ints(a, b, mesh=None, axis: str = "shard"):
    """Exact integer polynomial product with the NTT sharded over the mesh."""
    mesh = mesh or default_mesh()
    out_len = len(a) + len(b) - 1
    n = ntt._next_pow2(out_len)
    ndev = mesh.shape[axis]
    n = max(n, 2 * ndev)  # at least two rows per shard
    assert (
        min(len(a), len(b)) * max(max(a, default=1), 1) * max(max(b, default=1), 1)
        < ntt.ntt_prime()
    )
    eng, sharding, fwd, mul, bwd = _sharded_fns(n, mesh, axis)

    fa = fwd(jax.device_put(eng.ctx.encode(list(a) + [0] * (n - len(a))), sharding))
    fb = fwd(jax.device_put(eng.ctx.encode(list(b) + [0] * (n - len(b))), sharding))
    fc = mul(fa, fb)
    out = eng.ctx.decode(bwd(fc))
    return out[:out_len]
