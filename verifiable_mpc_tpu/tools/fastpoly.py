"""Quasi-linear polynomial algorithms over GF(p) (host orchestration, NTT
multiplications on device).

Replaces the reference's quadratic kernels at 2^16-gate scale
(SURVEY.md §2 #10 "TPU plan"): Lagrange interpolation O(m^2)
(qap_creator.py:154-164) -> subproduct-tree interpolation O(m log^2 m);
long division O(d^2) (qap_creator.py:96-104) -> reversal + Newton series
inversion O(d log d); plus fast multi-point evaluation for the
h(1..2m) vector (circuit_sat_r1cs.py:427).

All polynomials are lists of ints (lowest degree first), coefficients mod p.
"""

from __future__ import annotations

# below this size the schoolbook/naive paths win
_FAST_THRESHOLD = 64


def _trim(a):
    i = len(a)
    while i > 1 and a[i - 1] == 0:
        i -= 1
    return a[:i]


def poly_mul(a, b, p):
    if min(len(a), len(b)) < _FAST_THRESHOLD:
        o = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    o[i + j] = (o[i + j] + ai * bj) % p
        return o
    from ..ops import ntt  # lazy: keeps jax off the host-only protocol path

    return ntt.poly_mul_mod(a, b, p)


def poly_add(a, b, p):
    n = max(len(a), len(b))
    out = [0] * n
    for i, ai in enumerate(a):
        out[i] = ai
    for i, bi in enumerate(b):
        out[i] = (out[i] + bi) % p
    return out


def poly_scale(a, c, p):
    return [ai * c % p for ai in a]


def poly_inv_series(f, k, p):
    """g with f*g = 1 mod x^k (Newton iteration, f[0] invertible).

    Cached per (f, rounded k): remainder trees divide by the same node
    polynomials repeatedly (once per transform over the shared domain)."""
    import functools as _ft

    k_round = 1 << max(0, (k - 1)).bit_length()  # prefix-stable: compute more
    return list(_inv_series_cached(tuple(f), k_round, p))[:k]


def _inv_series_uncached(f, k, p):
    g = [pow(f[0], -1, p)]
    length = 1
    while length < k:
        length = min(2 * length, k)
        fg = poly_mul(list(f)[:length], g, p)[:length]
        two_minus = [(-c) % p for c in fg]
        two_minus[0] = (2 - fg[0]) % p
        g = poly_mul(g, two_minus, p)[:length]
    return g[:k]


def _inv_series_cached(f_key, k, p):
    key = (f_key, k, p)
    cached = _INV_CACHE.get(key)
    if cached is None:
        cached = _inv_series_uncached(f_key, k, p)
        if len(_INV_CACHE) > 512:
            _INV_CACHE.clear()
        _INV_CACHE[key] = cached
    return cached


_INV_CACHE = {}


def poly_divmod(a, b, p):
    """Quotient and remainder of a/b via the reversal trick."""
    a = _trim(list(a))
    b = _trim(list(b))
    da, db = len(a) - 1, len(b) - 1
    if da < db:
        return [0], a
    if db + 1 < _FAST_THRESHOLD and da - db + 1 < _FAST_THRESHOLD:
        return _naive_divmod(a, b, p)
    k = da - db + 1
    rev_a = a[::-1]
    rev_b = b[::-1]
    q_rev = poly_mul(rev_a[:k], poly_inv_series(rev_b, k, p), p)[:k]
    q = q_rev[::-1]
    bq = poly_mul(b, q, p)
    r = [(x - y) % p for x, y in zip(a, bq[: len(a)])]
    r = _trim(r[:db]) if db > 0 else [0]
    return q, r


def _naive_divmod(a, b, p):
    q = [0] * (len(a) - len(b) + 1)
    r = list(a)
    inv_lead = pow(b[-1], -1, p)
    for i in range(len(a) - len(b), -1, -1):
        coef = r[i + len(b) - 1] * inv_lead % p
        q[i] = coef
        if coef:
            for j, bj in enumerate(b):
                r[i + j] = (r[i + j] - coef * bj) % p
    r = _trim(r[: len(b) - 1]) if len(b) > 1 else [0]
    return q, r


# ---------------------------------------------------------------------------
# subproduct trees: multi-point evaluation and interpolation
# ---------------------------------------------------------------------------


import functools


@functools.lru_cache(maxsize=32)
def _subproduct_tree_cached(points_key, p):
    level = [[(-u) % p, 1] for u in points_key]
    tree = [level]
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(poly_mul(level[i], level[i + 1], p))
        if len(level) % 2 == 1:
            nxt.append(level[-1])
        level = nxt
        tree.append(level)
    return tree


def _subproduct_tree(points, p):
    """tree[0] = [(x - u_i)]; tree[k][j] = product of a 2^k-run of leaves.

    Cached per point set: the protocol reuses the 1..m and m+2..2m domains
    for f, g and h within one proof (and across proofs)."""
    return _subproduct_tree_cached(tuple(points), p)


def multipoint_eval(f, points, p):
    """[f(u) for u in points] via a remainder tree: O(n log^2 n)."""
    n = len(points)
    if n == 0:
        return []
    if n < _FAST_THRESHOLD or len(f) < _FAST_THRESHOLD:
        return [_horner(f, u, p) for u in points]
    tree = _subproduct_tree(points, p)
    # descend with remainders from the root
    rems = [poly_divmod(f, tree[-1][0], p)[1]]
    for k in range(len(tree) - 2, -1, -1):
        level = tree[k]
        nxt = []
        for j, node in enumerate(level):
            parent = rems[j // 2]
            nxt.append(poly_divmod(parent, node, p)[1])
        rems = nxt
    return [r[0] % p if r else 0 for r in rems]


def _horner(f, u, p):
    acc = 0
    for c in reversed(f):
        acc = (acc * u + c) % p
    return acc


def interpolate(points, values, p):
    """Coefficients of the unique poly with f(points[i]) = values[i]
    (subproduct tree + derivative trick): O(n log^2 n)."""
    n = len(points)
    if n < _FAST_THRESHOLD:
        return _naive_interpolate(points, values, p)
    tree = _subproduct_tree(points, p)
    m_poly = tree[-1][0]
    # M'(x), evaluated at all points
    m_prime = [(i + 1) * c % p for i, c in enumerate(m_poly[1:])]
    denoms = multipoint_eval(m_prime, points, p)
    weights = [v * pow(d, -1, p) % p for v, d in zip(values, denoms)]
    # combine up the tree: node value = w_l * M_r + w_r * M_l
    level = [[w] for w in weights]
    for k in range(len(tree) - 1):
        nodes = tree[k]
        nxt = []
        i = 0
        j = 0
        while i + 1 < len(nodes):
            left = poly_mul(level[i], nodes[i + 1], p)
            right = poly_mul(level[i + 1], nodes[i], p)
            nxt.append(poly_add(left, right, p))
            i += 2
        if i < len(nodes):
            nxt.append(level[i])
        level = nxt
    return _trim(level[0])


def _naive_interpolate(points, values, p):
    n = len(points)
    # master polynomial
    m = [1]
    for u in points:
        m = poly_mul(m, [(-u) % p, 1], p)
    out = [0] * n
    for u, v in zip(points, values):
        # basis = m / (x - u) via synthetic division
        basis = [0] * n
        carry = m[n]
        for j in range(n - 1, -1, -1):
            basis[j] = carry
            carry = (m[j] + carry * u) % p
        denom = _horner(basis, u, p)
        scale = v * pow(denom, -1, p) % p
        for j in range(n):
            out[j] = (out[j] + basis[j] * scale) % p
    return out


def batch_inverse(xs, p):
    """Montgomery's trick: n inverses for one pow() + 3n mulmods."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % p
    inv_all = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * xs[i] % p
    return out


def shift_evaluations(vals, base_start, target_start, count, p):
    """[f(target_start + i) for i in range(count)] from consecutive samples
    ``vals`` = [f(base_start), ..., f(base_start + d)] of a degree-<=d poly.

    One convolution (NTT) + factorial/batch-inverse scalings — O(M(d+count))
    vs the O(d log^2 d) subproduct-tree route.  Closed-form Lagrange at
    consecutive nodes: with s = target_start - base_start,

        f(t_i) = W_i * sum_k  delta_k / (s + i - k),
        delta_k = vals[k] / (k! (d-k)! (-1)^(d-k)),
        W_i = prod_j (s + i - j).

    Requires every target to be distinct from every base point as integers
    (s + i - k != 0 mod p for the small-index window) — asserted.
    """
    d = len(vals) - 1
    s = target_start - base_start
    for i in (0, count - 1):
        assert not (0 <= s + i <= d), "target coincides with a base point"

    if d >= _FAST_THRESHOLD and (1 << 192) <= p < (1 << 256):
        from .. import native  # lazy: host-only path stays jax-free

        if native.available():
            return native.shift_evaluations_ints(vals, s, count, p)

    # delta_k = vals[k] * inv(k!) * inv((d-k)!) * (-1)^(d-k)
    fact = [1] * (d + 1)
    for k in range(1, d + 1):
        fact[k] = fact[k - 1] * k % p
    inv_fact_d = pow(fact[d], -1, p)
    inv_fact = [1] * (d + 1)
    inv_fact[d] = inv_fact_d
    for k in range(d, 0, -1):
        inv_fact[k - 1] = inv_fact[k] * k % p
    delta = [0] * (d + 1)
    for k in range(d + 1):
        t = vals[k] * inv_fact[k] % p * inv_fact[d - k] % p
        delta[k] = t if (d - k) % 2 == 0 else (p - t) % p

    # G_j = 1 / (s + j - d) for j = 0..d+count-1
    gs = [(s + j - d) % p for j in range(d + count)]
    G = batch_inverse(gs, p)

    conv = poly_mul(delta, G, p)  # conv[i + d] = sum_k delta_k / (s + i - k)

    # W_i = prod_{j=0..d} (s + i - j), updated incrementally
    out = [0] * count
    w = 1
    for j in range(d + 1):
        w = w * ((s - j) % p) % p
    num_inv = batch_inverse([(s + i - d) % p for i in range(count)], p)
    for i in range(count):
        out[i] = w * conv[i + d] % p
        # W_{i+1} = W_i * (s + i + 1) / (s + i - d)
        w = w * ((s + i + 1) % p) % p * num_inv[i] % p
    return out
