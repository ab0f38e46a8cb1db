"""Shamir-MPC runtime: SPMD parties with an MPyC-parity API.

Replaces the reference's dependency on ``mpyc.runtime.mpc`` (SURVEY.md "MPyC
API surface"): ``start/shutdown/run``, ``SecFld/SecInt/SecGrp``, ``_random``,
``gather``, ``output(raw=)``, ``transfer``, ``schur_prod``, ``if_else``,
``to_bits`` — everything the verifiable-MPC protocol layer consumes.

Execution model
---------------
The same (deterministic) party program runs once per party.  ``mpc.run(coro)``
executes the single-party degenerate mode (m=1, threshold 0) exactly like the
reference's test usage (reference test/test_demo_zkp_mpc_ac20.py runs demos
with no -M flag).  ``run_multi(factory, m)`` runs m party programs
concurrently on one asyncio loop, exchanging messages through an in-process
hub; each communication op is tagged with a program-order id so message
routing is deterministic regardless of task interleaving (the role MPyC's
program counters play).

Secure operations are lazy: ``a * b`` on shares returns immediately with a
pending task; communication drains when the program awaits ``gather`` /
``output`` / ``schur_prod`` — mirroring MPyC so the reference's synchronous
call sites (e.g. circuit_builder gadgets) work unchanged.

Comparison-style gadgets (``to_bits``, zero test) run REAL protocols for
every secure type: statistically-masked bit decomposition when the field
has headroom (``_to_bits_protocol``), the Damgard-style solved-bits
construction at full field width (``_to_bits_full``), and a Fermat zero
test for SecFld (``is_zero``).  The trusted-dealer ideal functionality of
earlier rounds is gone.
"""

from __future__ import annotations

import asyncio
import contextvars
import functools
import hashlib
import os as _os
import random as _random
import types

from ..fields import GF, FiniteFieldElement
from . import shamir

_sysrand = _random.SystemRandom()
_OPCOUNT = bool(_os.environ.get("VMPC_MPC_OPCOUNT"))

_ctx_runtime: contextvars.ContextVar = contextvars.ContextVar("vmpc_runtime")


class Hub:
    """In-process message router."""

    def __init__(self, m):
        self.m = m
        self._boxes = {}  # (dst, src, op_id) -> Future

    def _box(self, dst, src, op_id):
        key = (dst, src, op_id)
        fut = self._boxes.get(key)
        if fut is None:
            fut = asyncio.get_running_loop().create_future()
            self._boxes[key] = fut
        return fut

    def send(self, src, dst, op_id, payload):
        fut = self._box(dst, src, op_id)
        fut.set_result(payload)

    async def recv(self, dst, src, op_id):
        fut = self._box(dst, src, op_id)
        value = await fut
        del self._boxes[(dst, src, op_id)]
        return value


class SecureNumber:
    """Shamir-shared number (SecFld/SecInt style).

    ``share`` is a field element (resolved) or an asyncio Task producing one.
    Public constants embed as degree-0 sharings.
    """

    __slots__ = ("df",)

    is_secure_object = True
    field = None  # GF class
    bit_length = None  # set for SecInt-style types

    def __init__(self, value=0):
        cls = type(self)
        if isinstance(value, SecureNumber):
            self.df = value.df
        elif isinstance(value, FiniteFieldElement):
            self.df = cls.field(value.value)
        elif isinstance(value, int):
            self.df = cls.field(value)
        else:
            self.df = value  # Task / coroutine handle

    # -- resolution --------------------------------------------------------
    def _resolved(self):
        return isinstance(self.df, FiniteFieldElement)

    async def _value(self):
        if self._resolved():
            return self.df
        value = await self.df
        self.df = value
        return value

    # -- local (linear) arithmetic ----------------------------------------
    def _lift2(self, other, fn):
        cls = type(self)
        if isinstance(other, SecureNumber):
            if self._resolved() and other._resolved():
                return cls(fn(self.df, other.df))
            rt = _runtime()

            async def later(a=self, b=other):
                return fn(await a._value(), await b._value())

            return cls(rt._task(later()))
        if isinstance(other, (int, FiniteFieldElement)):
            o = cls.field(other if isinstance(other, int) else other.value)
            if self._resolved():
                return cls(fn(self.df, o))
            rt = _runtime()

            async def later(a=self, o=o):
                return fn(await a._value(), o)

            return cls(rt._task(later()))
        return NotImplemented

    def __add__(self, other):
        return self._lift2(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._lift2(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._lift2(other, lambda a, b: b - a)

    def __neg__(self):
        return self._lift2(0, lambda a, b: -a)

    def __mul__(self, other):
        if isinstance(other, SecureNumber):
            return _runtime().mul(self, other)
        return self._lift2(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __pow__(self, exponent):
        if exponent == -1:
            return _runtime().reciprocal(self)
        if exponent == 0:
            return type(self)(1)
        if exponent == 1:
            return self
        if exponent < -1:
            raise NotImplementedError
        result = self
        for _ in range(exponent - 1):
            result = result * self
        return result

    # -- comparisons (secure outputs) -------------------------------------
    def __eq__(self, other):
        diff = self - other
        return _runtime().is_zero(diff)

    def __ne__(self, other):
        diff = self - other
        one = type(self)(1)
        return one - _runtime().is_zero(diff)

    def __repr__(self):
        return f"{type(self).__name__}({self.df!r})"

    def __hash__(self):
        return id(self)


@functools.lru_cache(maxsize=None)
def _sec_number_type(modulus: int, bit_length):
    field = GF(modulus)
    name = f"SecFld({modulus})" if bit_length is None else f"SecInt({bit_length})"
    cls = type(name, (SecureNumber,), {"__slots__": ()})
    cls.field = field
    cls.bit_length = bit_length
    return cls


class Runtime:
    """One party's runtime state."""

    def __init__(self, pid: int, m: int, hub: Hub):
        self.pid = pid
        self.m = m
        self.threshold = (m - 1) // 2
        self.hub = hub
        self._pc = 0
        self.parties = [f"Party({i})" for i in range(m)]
        self.op_counts = {}

    # -- program-order op ids ---------------------------------------------
    def _next_pc(self):
        self._pc += 1
        return self._pc

    def _task(self, coro):
        return asyncio.get_running_loop().create_task(coro)

    # -- round accounting (VMPC_MPC_OPCOUNT=1: per-kind message-round
    # counters, printed by probes — the round-count vs gate-count evidence
    # for the TCP prover scaling work) -------------------------------------
    def _count(self, op_id):
        if not _OPCOUNT:
            return
        kind = op_id
        while isinstance(kind, tuple) and kind:
            kind = kind[0]
        self.op_counts[str(kind)] = self.op_counts.get(str(kind), 0) + 1

    # -- transport ---------------------------------------------------------
    async def _exchange(self, op_id, payload):
        self._count(op_id)
        """All-to-all: send payload, receive everyone's (list by pid)."""
        if self.m == 1:
            return [payload]
        for dst in range(self.m):
            if dst != self.pid:
                self.hub.send(self.pid, dst, op_id, payload)
        out = []
        for src in range(self.m):
            if src == self.pid:
                out.append(payload)
            else:
                out.append(await self.hub.recv(self.pid, src, op_id))
        return out

    async def _scatter_gather(self, op_id, per_dst_payloads):
        """Send per_dst_payloads[j] to party j; receive one payload from each."""
        self._count(op_id)
        if self.m == 1:
            return [per_dst_payloads[0]]
        for dst in range(self.m):
            if dst != self.pid:
                self.hub.send(self.pid, dst, op_id, per_dst_payloads[dst])
        out = []
        for src in range(self.m):
            if src == self.pid:
                out.append(per_dst_payloads[self.pid])
            else:
                out.append(await self.hub.recv(self.pid, src, op_id))
        return out

    # -- lifecycle ---------------------------------------------------------
    async def start(self):
        await self.barrier()

    async def shutdown(self):
        await self.barrier()
        self.report_op_counts()

    def report_op_counts(self):
        if _OPCOUNT and self.op_counts:
            total = sum(self.op_counts.values())
            print(
                f"[mpc pid={self.pid}] message rounds: {total} — "
                + ", ".join(
                    f"{k}={v}"
                    for k, v in sorted(
                        self.op_counts.items(), key=lambda kv: -kv[1]
                    )
                ),
                flush=True,
            )

    async def barrier(self):
        op_id = ("barrier", self._next_pc())
        await self._exchange(op_id, None)

    # -- sectype factories -------------------------------------------------
    def SecFld(self, modulus=None):
        return _sec_number_type(modulus, None)

    def SecInt(self, l=32, p=None):
        assert p is not None, "SecInt requires an explicit prime p here"
        return _sec_number_type(p, l)

    def SecGrp(self, group):
        return types.SimpleNamespace(group=group)

    # -- randomness --------------------------------------------------------
    def _random(self, sectype):
        base = ("rand", self._next_pc())
        field = sectype.field

        async def coro():
            if self.m == 1:
                return field(_sysrand.randrange(field.modulus))
            # each party contributes a random sharing; sum is uniform
            contrib = shamir.share(
                field, _sysrand.randrange(field.modulus), self.m, self.threshold
            )
            received = await self._scatter_gather(base, contrib)
            acc = 0
            for r in received:
                acc += r
            return field(acc)

        return sectype(self._task(coro()))

    def random_vec(self, sectype, count: int) -> list:
        """count uniform random shared elements in ONE message round.

        The per-element ``_random`` costs one scatter-gather each — the
        MPC generator setup and the protocol-5 blinding vector drew O(n)
        rounds that way (measured 8197 of 10404 total rounds at 2^10,
        probes/probe_mpc_tcp.py)."""
        base = ("randvec", self._next_pc())
        field = sectype.field
        task = self._task(self._random_vec(base, field, count))

        def _pick(j):
            async def coro():
                return (await task)[j]

            return coro()

        return [sectype(self._task(_pick(j))) for j in range(count)]

    # -- multiplication / reciprocal / zero test --------------------------
    def mul(self, a: SecureNumber, b: SecureNumber):
        base = ("mul", self._next_pc())
        cls = type(a)

        async def coro():
            av = await a._value()
            bv = await b._value()
            return await self._reduce_degree(base, av * bv)

        return cls(self._task(coro()))

    async def _reduce_degree(self, op_id, product_share):
        """GRR degree reduction of a degree-2t product share."""
        if self.m == 1:
            return product_share
        field = type(product_share)
        sub = shamir.share(field, product_share.value, self.m, self.threshold)
        received = await self._scatter_gather(op_id, sub)
        lam = shamir.recombination_vector(field, self.m)
        acc = 0
        for r, l in zip(received, lam):
            acc += int(r) * l
        return field(acc)

    def reciprocal(self, a: SecureNumber):
        """Secure inverse via random masking: open r*a = c, a^-1 = r/c."""
        base = ("inv", self._next_pc())
        cls = type(a)
        field = cls.field

        async def coro():
            attempt = 0
            while True:
                if self.m == 1:
                    av = await a._value()
                    return av.reciprocal()
                r = self._random(cls)
                rv = await r._value()
                av = await a._value()
                d = await self._reduce_degree(("inv-mul", base, attempt), rv * av)
                opened = await self._open_share(("inv-open", base, attempt), d)
                if opened.value != 0:
                    return rv * opened.reciprocal()
                attempt += 1

        return cls(self._task(coro()))

    # -- batched vector primitives (one message round each) ----------------
    async def _random_vec(self, base, field, count):
        """count uniform random shared field elements; every party adds a
        random degree-t sharing, the sum is a uniform secret nobody knows."""
        if self.m == 1:
            return [field(_sysrand.randrange(field.modulus)) for _ in range(count)]
        contribs = [
            shamir.share(
                field, _sysrand.randrange(field.modulus), self.m, self.threshold
            )
            for _ in range(count)
        ]
        per_dst = [
            [contribs[j][dst] for j in range(count)] for dst in range(self.m)
        ]
        received = await self._scatter_gather(base, per_dst)
        out = []
        for j in range(count):
            acc = 0
            for i in range(self.m):
                acc += int(received[i][j])
            out.append(field(acc))
        return out

    async def _open_vec(self, base, shares):
        """Open a vector of share values (public output at every party)."""
        field = type(shares[0])
        received = await self._exchange(base, [int(s) for s in shares])
        if self.m == 1:
            return list(shares)
        lam = shamir.recombination_vector(field, self.m)
        out = []
        for j in range(len(shares)):
            acc = 0
            for i in range(self.m):
                acc += int(received[i][j]) * lam[i]
            out.append(field(acc))
        return out

    async def _schur_vec(self, base, a, b):
        """Element-wise secure product of two share-value vectors with GRR
        degree reduction; one batched message round."""
        prods = [x * y for x, y in zip(a, b)]
        if self.m == 1:
            return prods
        field = type(prods[0])
        subs = [
            shamir.share(field, p.value, self.m, self.threshold) for p in prods
        ]
        per_dst = [
            [subs[j][dst] for j in range(len(prods))] for dst in range(self.m)
        ]
        received = await self._scatter_gather(base, per_dst)
        lam = shamir.recombination_vector(field, self.m)
        out = []
        for j in range(len(prods)):
            acc = 0
            for i in range(self.m):
                acc += int(received[i][j]) * lam[i]
            out.append(field(acc))
        return out

    async def _random_bit_shares(self, base, field, count):
        """count shared uniform bits via the square trick (Damgard et al.,
        "Unconditionally secure constant-rounds MPC"): draw [r], open
        s = r^2, then [b] = ([r]/sqrt(s) + 1)/2 — r/sqrt(s) is uniform in
        {-1, +1} and s reveals nothing about its sign."""
        inv2 = field((field.modulus + 1) // 2)
        one = field(1)
        bits = []
        attempt = 0
        while len(bits) < count:
            need = count - len(bits)
            rs = await self._random_vec((base, "r", attempt), field, need)
            sq = await self._schur_vec((base, "sq", attempt), rs, rs)
            opened = await self._open_vec((base, "open", attempt), sq)
            for r, s in zip(rs, opened):
                if int(s) == 0:
                    continue  # r was 0 (probability 1/p); retry that slot
                t = shamir.sqrt_mod(int(s), field.modulus)
                bits.append((r * field(t).reciprocal() + one) * inv2)
            attempt += 1
        return bits

    _STAT_SEC = 40  # statistical masking parameter (kappa)

    async def _to_bits_protocol(self, base, av, field, l):
        """Real bit decomposition of the signed l-bit representative.

        Shift to unsigned a' = a + 2^(l-1) in [0, 2^l); mask with an
        (l+kappa)-bit random r built from shared bits, open c = a' + r
        (statistically hiding, no field wraparound since p >> 2^(l+kappa)),
        then recover the low l bits of a' = c - r with a shared-bit ripple
        borrow — one secure multiplication per bit.  The two's-complement
        bits of a are those of a' with the top bit flipped."""
        kappa = min(self._STAT_SEC, field.modulus.bit_length() - l - 2)
        assert kappa >= 8, "field too small for statistical bit decomposition"
        nb = l + kappa
        b = await self._random_bit_shares((base, "bits"), field, nb)
        r_acc = field(0)
        for i, bi in enumerate(b):
            r_acc = r_acc + bi * field(1 << i)
        a_shift = av + field(1 << (l - 1))
        c = (await self._open_vec((base, "mask"), [a_shift + r_acc]))[0]
        cint = int(c)
        one = field(1)
        beta = field(0)  # borrow share
        out = []
        for i in range(l):
            bb = (await self._schur_vec((base, "borrow", i), [b[i]], [beta]))[0]
            if (cint >> i) & 1:
                bit = one - b[i] - beta + bb + bb
                beta = bb
            else:
                bit = b[i] + beta - bb - bb
                beta = b[i] + beta - bb
            out.append(bit)
        out[l - 1] = one - out[l - 1]  # undo the 2^(l-1) shift (flip MSB)
        return out

    # -- full-field-width protocols (no statistical masking headroom) ------
    # These replace the hub's ideal-functionality dealer that earlier
    # rounds used for SecFld: everything below is built from the real
    # primitives only (random shared bits, GRR products, openings).

    async def _pow_public_exp(self, base, av, e: int):
        """Share ** public exponent, square-and-multiply (one GRR product
        per step, sequential rounds)."""
        field = type(av)
        result = None
        acc = av
        i = 0
        while e:
            if e & 1:
                result = (
                    acc
                    if result is None
                    else (
                        await self._schur_vec((base, "m", i), [result], [acc])
                    )[0]
                )
            e >>= 1
            if e:
                acc = (await self._schur_vec((base, "s", i), [acc], [acc]))[0]
            i += 1
        return result if result is not None else field(1)

    async def _bits_lt_public(self, base, bits, K: int, field):
        """[sum bits_i 2^i < K] as a secret bit share (bits LSB-first).

        Ripple borrow of (K-1) - b with K public: one GRR product per bit
        (b_i AND borrow for K_i=1 slots, b_i OR borrow for K_i=0)."""
        Km1 = K - 1
        if Km1 < 0:
            return field(0)
        if (Km1 >> len(bits)) > 0:
            return field(1)  # K-1 has a set bit above every shared bit
        borrow = field(0)
        for i, b in enumerate(bits):
            prod = (await self._schur_vec((base, "bw", i), [b], [borrow]))[0]
            if (Km1 >> i) & 1:
                borrow = prod  # borrow iff b_i AND borrow_in
            else:
                borrow = b + borrow - prod  # borrow iff b_i OR borrow_in
        return field(1) - borrow

    async def _solved_random_bits(self, base, field, k: int):
        """k shared bits of a uniform secret in [0, modulus): random bits
        plus rejection on the OPENED comparison bit [r < p] (Damgard et al.
        '06 solved-bits; the rejection bit is public by design and leaks
        nothing about the surviving r)."""
        attempt = 0
        while True:
            b = await self._random_bit_shares((base, "b", attempt), field, k)
            lt = await self._bits_lt_public(
                (base, "lt", attempt), b, field.modulus, field
            )
            ok = (await self._open_vec((base, "ok", attempt), [lt]))[0]
            if ok.value == 1:
                return b
            attempt += 1

    async def _bitadd_public(self, base, C: int, bits, field, out_len: int):
        """Shared bits of (C + sum bits_i 2^i) mod 2**out_len, C public and
        0 <= C < 2**out_len: ripple carry, one GRR product per bit."""
        one = field(1)
        carry = field(0)
        out = []
        for i in range(out_len):
            b = bits[i] if i < len(bits) else field(0)
            prod = (await self._schur_vec((base, "c", i), [b], [carry]))[0]
            if (C >> i) & 1:
                out.append(one - (b + carry - prod - prod))  # 1 XOR b XOR c
                carry = b + carry - prod  # OR
            else:
                out.append(b + carry - prod - prod)  # b XOR c
                carry = prod  # AND
        return out

    async def _to_bits_full(self, base, av, field, l: int):
        """Real bit decomposition without masking headroom (SecFld /
        explicit l near the field width) — the construction the dealer
        previously simulated:

        1. solved random bits r in [0, p) (rejection-sampled);
        2. open c = a - r (uniform: leaks nothing);
        3. d = c + r over the integers via a public+shared addition chain;
           q = [d >= p]; v_bits = q ? bits(c - p + r) : bits(c + r) — the
           reduced candidate is ANOTHER public+shared chain, merged with
           one batched product round;
        4. convert to the signed-representative two's complement the
           statistical path emits: s = [v > p//2], low l bits of v - s*p
           selected the same way."""
        k = field.modulus.bit_length()
        p = field.modulus
        r_bits = await self._solved_random_bits((base, "rb"), field, k)
        r_acc = field(0)
        for i, bi in enumerate(r_bits):
            r_acc = r_acc + bi * field(1 << i)
        c = (await self._open_vec((base, "mask"), [av - r_acc]))[0]
        cint = c.value % p
        # v = (c + r) mod p, with c + r < 2p < 2^(k+1)
        d0 = await self._bitadd_public((base, "d0"), cint, r_bits, field, k + 1)
        q = field(1) - await self._bits_lt_public((base, "q"), d0, p, field)
        # candidate with the modular reduction applied: c - p + r >= 0 when
        # q = 1; two's complement constant keeps the chain non-negative
        d1 = await self._bitadd_public(
            (base, "d1"), (cint - p) % (1 << (k + 1)), r_bits, field, k + 1
        )
        diffs = [d1[i] - d0[i] for i in range(k)]
        sel = await self._schur_vec((base, "sel"), [q] * k, diffs)
        v_bits = [d0[i] + sel[i] for i in range(k)]  # bits of v in [0, p)
        # signed representative: subtract p iff v > p//2, then mask to l
        s = field(1) - await self._bits_lt_public(
            (base, "s"), v_bits, p // 2 + 1, field
        )
        e0 = v_bits[:l]
        e1 = await self._bitadd_public(
            (base, "e1"), (-p) % (1 << l), v_bits[:l], field, l
        )
        diffs = [e1[i] - e0[i] for i in range(l)]
        sel = await self._schur_vec((base, "sel2"), [s] * l, diffs)
        return [e0[i] + sel[i] for i in range(l)]

    def is_zero(self, a: SecureNumber):
        """Secure zero test with secret output.

        SecInt types bit-decompose and take 1 - OR(bits) with a log-depth
        product tree.  SecFld types (full field width, no statistical
        masking headroom) use the Fermat test 1 - a^(p-1): real GRR
        products only, ~1.5 * log2(p) sequential rounds — fine for the
        in-process hub, a documented cost over TCP."""
        base = ("iszero", self._next_pc())
        cls = type(a)

        async def coro():
            av = await a._value()
            if cls.bit_length is None:
                pw = await self._pow_public_exp(
                    (base, "fermat"), av, cls.field.modulus - 1
                )
                return cls.field(1) - pw
            # l+1 bits: a difference of two signed l-bit values occupies
            # l+1 bits, and x == 0 iff all l+1 two's-complement bits vanish
            l = cls.bit_length + 1
            bits = await self._to_bits_protocol((base, "dec"), av, cls.field, l)
            one = cls.field(1)
            terms = [one - d for d in bits]  # AND-tree of NOT bits
            rnd = 0
            while len(terms) > 1:
                half = len(terms) // 2
                prods = await self._schur_vec(
                    (base, "and", rnd), terms[:half], terms[half : 2 * half]
                )
                terms = prods + terms[2 * half :]
                rnd += 1
            return terms[0]

        return cls(self._task(coro()))

    def to_bits(self, a: SecureNumber, l=None):
        """Secure bit decomposition: l secure bits, LSB first, of the signed
        representative in two's complement (parity with MPyC's to_bits usage
        in the gadgets, reference circuit_builder.py:320-326).

        Calls with statistical masking headroom run
        :meth:`_to_bits_protocol`; full-width calls (SecFld / explicit l
        near the field size) run the solved-bits construction
        (:meth:`_to_bits_full`) — both are real protocols; the
        ideal-functionality dealer is gone."""
        cls = type(a)
        l = l if l is not None else cls.bit_length
        if l is None:
            l = cls.field.modulus.bit_length()
        base = ("tobits", self._next_pc())

        async def coro():
            av = await a._value()
            kappa_room = cls.field.modulus.bit_length() - l - 2
            if kappa_room >= 8:
                return await self._to_bits_protocol(base, av, cls.field, l)
            return await self._to_bits_full(base, av, cls.field, l)

        task = self._task(coro())

        bits = []
        for i in range(l):

            async def bit_i(i=i):
                res = await task
                return res[i]

            bits.append(cls(self._task(bit_i())))
        return bits

    def if_else(self, c, a, b):
        if isinstance(c, SecureNumber):
            return c * (a - b) + b
        return a if c else b

    # -- opening / gathering / transfer ------------------------------------
    async def _open_share(self, op_id, share_value):
        received = await self._exchange(op_id, share_value)
        if self.m == 1:
            return received[0]
        field = type(share_value)
        return shamir.recombine_at_zero(field, received)

    def output(self, x, raw=False):
        single = not isinstance(x, list)
        xs = [x] if single else list(x)
        base = ("output", self._next_pc())

        async def coro():
            out = []
            for i, xi in enumerate(xs):
                if not isinstance(xi, SecureNumber):
                    out.append(xi)
                    continue
                val = await xi._value()
                opened = await self._open_share((base, i), val)
                if raw or type(xi).bit_length is None:
                    out.append(opened)
                else:
                    out.append(int(opened))
            return out[0] if single else out

        return self._task(coro())

    def gather(self, *args):
        async def resolve(obj):
            if isinstance(obj, SecureNumber):
                return await obj._value()
            if isinstance(obj, list):
                return [await resolve(o) for o in obj]
            if isinstance(obj, asyncio.Task):
                return await obj
            return obj

        async def coro():
            out = [await resolve(a) for a in args]
            return out[0] if len(args) == 1 else out

        return self._task(coro())

    def schur_prod(self, a, b):
        """Element-wise secure product of share vectors; awaiting yields raw
        field share values (parity with reference mpc_ac20.py:338 usage)."""
        base = ("schur", self._next_pc())

        async def coro():
            av = []
            for x in a:
                av.append(await x._value() if isinstance(x, SecureNumber) else x)
            bv = []
            for x in b:
                bv.append(await x._value() if isinstance(x, SecureNumber) else x)
            prods = [x * y for x, y in zip(av, bv)]
            if self.m == 1:
                return prods
            field = type(prods[0])
            # batch resharing: one message round for the whole vector
            subs = [
                shamir.share(field, p.value, self.m, self.threshold)
                for p in prods
            ]
            per_dst = [
                [subs[j][dst] for j in range(len(prods))] for dst in range(self.m)
            ]
            received = await self._scatter_gather(base, per_dst)
            lam = shamir.recombination_vector(field, self.m)
            out = []
            for j in range(len(prods)):
                acc = 0
                for i in range(self.m):
                    acc += int(received[i][j]) * lam[i]
                out.append(field(acc))
            return out

        return self._task(coro())

    def transfer(self, obj, senders=None):
        base = ("transfer", self._next_pc())

        async def coro():
            if senders is None:
                return await self._exchange(base, obj)
            if self.m == 1:
                return obj
            if self.pid == senders:
                for dst in range(self.m):
                    if dst != self.pid:
                        self.hub.send(self.pid, dst, base, obj)
                return obj
            return await self.hub.recv(self.pid, senders, base)

        return self._task(coro())

    # -- driver -------------------------------------------------------------
    def run(self, coro):
        """Single-party degenerate mode (parity with reference tests)."""
        assert self.m == 1

        async def driver():
            token = _ctx_runtime.set(self)
            try:
                return await coro
            finally:
                _ctx_runtime.reset(token)

        return asyncio.run(driver())


def _runtime() -> Runtime:
    rt = _ctx_runtime.get(None)
    if rt is None:
        # default single-party runtime for ad-hoc use
        rt = Runtime(0, 1, Hub(1))
        _ctx_runtime.set(rt)
    return rt


class _RuntimeProxy:
    """Module-level ``mpc`` singleton delegating to the current party's
    runtime (parity with ``from mpyc.runtime import mpc``)."""

    def __getattr__(self, name):
        return getattr(_runtime(), name)

    def run(self, coro):
        rt = _ctx_runtime.get(None)
        if rt is not None and rt.m == 1:
            return rt.run(coro)
        fresh = Runtime(0, 1, Hub(1))
        return fresh.run(coro)


mpc = _RuntimeProxy()


def run_multi(party_program_factory, m: int):
    """Run m party programs concurrently on one loop (in-process SPMD).

    ``party_program_factory()`` must return a fresh coroutine; it runs once
    per party, each under its own runtime context.  Returns the list of
    per-party results.
    """

    async def driver():
        hub = Hub(m)

        async def run_party(pid):
            rt = Runtime(pid, m, hub)
            token = _ctx_runtime.set(rt)
            try:
                return await party_program_factory()
            finally:
                _ctx_runtime.reset(token)

        tasks = [
            asyncio.get_running_loop().create_task(run_party(pid))
            for pid in range(m)
        ]
        return await asyncio.gather(*tasks)

    return asyncio.run(driver())
