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
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import limbs as lb
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


# ---------------------------------------------------------------------------
# Hand-scheduled four-step NTT: exactly TWO all_to_all transposes per
# transform (vs one collective per cross-shard butterfly stage under GSPMD).
#
# n = n1*n2 viewed as a [n1, n2] matrix M[j1, j2] = x[j1*n2 + j2]:
#   A = NTT_n1 down the columns;  B[k1, j2] = A[k1, j2] * w^(k1*j2);
#   C = NTT_n2 along the rows;    X[k2*n1 + k1] = C[k1, k2].
# The digit-transposed output order is never materialized: pointwise
# products are order-agnostic, and the inverse runs the mirrored sequence,
# returning natural order.  Columns (rows) are made shard-local by an
# all_to_all transpose before each local-NTT step — the distributed-FFT
# classic, expressed with shard_map + lax.all_to_all over ICI.
# ---------------------------------------------------------------------------


def _ntt_axis0(ctx, x, rev, idx_a, idx_b, idx_w, tw):
    """DIT butterflies along axis 0 of [m, cols, L] (cols independent)."""
    x = jnp.take(x, rev, axis=0)

    def stage(x, inputs):
        ia, ib, iw = inputs
        u = jnp.take(x, ia, axis=0)
        tws = jnp.broadcast_to(jnp.take(tw, iw, axis=0)[:, None, :], u.shape)
        v = ctx.mul(jnp.take(x, ib, axis=0), tws)
        x = x.at[ia].set(ctx.add(u, v))
        x = x.at[ib].set(ctx.sub(u, v))
        return x, None

    x, _ = jax.lax.scan(stage, x, (idx_a, idx_b, idx_w))
    return x


def _split_factors(n: int, d: int):
    """n = n1 * n2, both powers of two and multiples of d (needs n >= d^2)."""
    log_n = n.bit_length() - 1
    log_d = d.bit_length() - 1
    assert log_n >= 2 * log_d, f"four-step needs n >= ndev^2 (n={n}, d={d})"
    l1 = min(max(log_d, log_n // 2), log_n - log_d)
    return 1 << l1, n >> l1


@functools.lru_cache(maxsize=None)
def _four_step(n: int, mesh, axis: str):
    d = mesh.shape[axis]
    n1, n2 = _split_factors(n, d)
    Pmod = ntt.ntt_prime()
    ctx = lb.mont_ctx(Pmod, ntt.NTT_LIMBS)
    w = ntt._primitive_root_of_unity(Pmod, n)
    w_inv = pow(w, -1, Pmod)

    def powers(base, count):
        out = [1] * count
        for i in range(1, count):
            out[i] = out[i - 1] * base % Pmod
        return ctx.encode(out)

    tw1 = powers(pow(w, n2, Pmod), n1 // 2)
    tw2 = powers(pow(w, n1, Pmod), n2 // 2)
    tw1_inv = powers(pow(w_inv, n2, Pmod), n1 // 2)
    tw2_inv = powers(pow(w_inv, n1, Pmod), n2 // 2)
    # coupling twiddles W[k1, j2] = w^(k1*j2), stored column-sharded (the
    # [n1, n2/d] layout they are consumed in)
    W_ints = [[pow(w, (k1 * j2) % n, Pmod) for j2 in range(n2)] for k1 in range(n1)]
    Winv_ints = [
        [pow(w_inv, (k1 * j2) % n, Pmod) for j2 in range(n2)] for k1 in range(n1)
    ]
    W = ctx.encode([v for row in W_ints for v in row]).reshape(
        n1, n2, ntt.NTT_LIMBS
    )
    Winv = ctx.encode([v for row in Winv_ints for v in row]).reshape(
        n1, n2, ntt.NTT_LIMBS
    )
    n_inv = ctx.encode([pow(n, -1, Pmod)])[0]

    p1 = [jnp.asarray(a) for a in ntt._plan(n1)]
    p2 = [jnp.asarray(a) for a in ntt._plan(n2)]

    def fwd_local(xb, Wb):
        # xb [n1/d, n2, L] row-sharded -> columns local
        y = jax.lax.all_to_all(xb, axis, split_axis=1, concat_axis=0, tiled=True)
        y = _ntt_axis0(ctx, y, p1[0], p1[1], p1[2], p1[3], tw1)
        y = ctx.mul(y, Wb)
        z = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        zt = jnp.swapaxes(z, 0, 1)
        zt = _ntt_axis0(ctx, zt, p2[0], p2[1], p2[2], p2[3], tw2)
        return jnp.swapaxes(zt, 0, 1)  # C, row(k1)-sharded

    def inv_local(cb, Winvb):
        zt = jnp.swapaxes(cb, 0, 1)
        zt = _ntt_axis0(ctx, zt, p2[0], p2[1], p2[2], p2[3], tw2_inv)
        z = jnp.swapaxes(zt, 0, 1)
        y = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=0, tiled=True)
        y = ctx.mul(y, Winvb)
        y = _ntt_axis0(ctx, y, p1[0], p1[1], p1[2], p1[3], tw1_inv)
        x = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        scale = jnp.broadcast_to(n_inv, x.shape)
        return ctx.mul(x, scale)

    row_spec = P(axis, None, None)
    col_spec = P(None, axis, None)
    fwd = jax.jit(
        shard_map(
            fwd_local, mesh=mesh, in_specs=(row_spec, col_spec),
            out_specs=row_spec, check_vma=False,
        )
    )
    inv = jax.jit(
        shard_map(
            inv_local, mesh=mesh, in_specs=(row_spec, col_spec),
            out_specs=row_spec, check_vma=False,
        )
    )
    mul = jax.jit(
        shard_map(
            ctx.mul, mesh=mesh, in_specs=(row_spec, row_spec),
            out_specs=row_spec, check_vma=False,
        )
    )
    row_sharding = NamedSharding(mesh, row_spec)
    col_sharding = NamedSharding(mesh, col_spec)
    W = jax.device_put(W, col_sharding)
    Winv = jax.device_put(Winv, col_sharding)
    return ctx, n1, n2, row_sharding, W, Winv, fwd, inv, mul


def four_step_poly_mul_ints(a, b, mesh=None, axis: str = "shard"):
    """Exact integer polynomial product via the hand-scheduled four-step
    distributed NTT (two all_to_all transposes per transform)."""
    mesh = mesh or default_mesh()
    d = mesh.shape[axis]
    out_len = len(a) + len(b) - 1
    n = max(ntt._next_pow2(out_len), d * d)
    assert (
        min(len(a), len(b))
        * max(max(a, default=1), 1)
        * max(max(b, default=1), 1)
        < ntt.ntt_prime()
    ), "coefficients too large for exact NTT recovery"
    ctx, n1, n2, row_sharding, W, Winv, fwd, inv, mul = _four_step(
        n, mesh, axis
    )

    def load(coeffs):
        enc = ctx.encode(list(coeffs) + [0] * (n - len(coeffs)))
        return jax.device_put(
            enc.reshape(n1, n2, ntt.NTT_LIMBS), row_sharding
        )

    fa = fwd(load(a), W)
    fb = fwd(load(b), W)
    fc = mul(fa, fb)
    out = ctx.decode(inv(fc, Winv).reshape(n, ntt.NTT_LIMBS))
    return out[:out_len]
