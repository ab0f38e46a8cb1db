"""Oracle tests: the C extension (native/_fastser.c) must emit bytes
identical to the pure-Python serialization/conversion paths it replaces."""

import io
import random

import numpy as np
import pytest

from verifiable_mpc_tpu import native, serialization
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups.bn256 import BNPoint
from verifiable_mpc_tpu.groups.edwards import ELL, EdwardsPoint

fs = native.fastser()
pytestmark = pytest.mark.skipif(fs is None, reason="no C toolchain")

rng = random.Random(5150)
gf = GF(ELL)


def _py_fallback(buf, obj):
    """Run the pure-Python loop by hiding the extension."""
    saved = native._fastser
    native._fastser = None
    native._fastser_tried = True
    try:
        return serialization._hash_list_fast(buf, obj)
    finally:
        native._fastser = saved


def _c_hash_bytes(obj):
    buf = io.BytesIO()
    assert serialization._hash_list_fast(buf, obj)
    return buf.getvalue()


def test_encode_ints_and_fields_match_python():
    vals = [rng.randrange(-(1 << 300), 1 << 300) for _ in range(50)]
    vals += [0, -1, 1, ELL, -ELL, 255, 256, -256]
    mixed = list(vals)
    for _ in range(40):
        mixed.insert(rng.randrange(len(mixed)), gf(rng.randrange(ELL)))
    mixed += [gf(0), gf(ELL - 1), gf(ELL // 2), gf(ELL // 2 + 1)]
    for obj in (vals, mixed, [gf(i) for i in range(20)]):
        pybuf = io.BytesIO()
        assert _py_fallback(pybuf, obj)
        assert _c_hash_bytes(obj) == pybuf.getvalue()


def test_encode_unsigned_field_type():
    gfu = GF(ELL)

    class Unsigned(gfu):
        is_signed = False

    obj = [Unsigned(rng.randrange(ELL)) for _ in range(10)]
    pybuf = io.BytesIO()
    assert _py_fallback(pybuf, obj)
    assert _c_hash_bytes(obj) == pybuf.getvalue()


def test_encode_points_match_python():
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(12)]
    pybuf = io.BytesIO()
    assert _py_fallback(pybuf, pts)
    assert _c_hash_bytes(pts) == pybuf.getvalue()

    gb = BNPoint.generator
    bpts = [gb ** rng.randrange(1, BNPoint.order) for _ in range(6)]
    pybuf = io.BytesIO()
    assert _py_fallback(pybuf, bpts)
    assert _c_hash_bytes(bpts) == pybuf.getvalue()


def test_encode_rejects_foreign_elements():
    obj = [1, 2, "nope"]
    buf = io.BytesIO()
    pybuf = io.BytesIO()
    assert serialization._hash_list_fast(buf, obj) == _py_fallback(pybuf, obj)


def test_vals_to_u64x4_matches_python():
    xs = [rng.randrange(ELL) for _ in range(64)]
    xs += [0, ELL - 1, ELL + 5, -3, 1 << 300]
    got = native._ints_to_u64x4(xs, ELL)
    saved = native._fastser
    native._fastser = None
    try:
        expect = native._ints_to_u64x4(xs, ELL)
    finally:
        native._fastser = saved
    assert np.array_equal(got, expect)
    assert native._u64x4_to_ints(got) == [x % ELL for x in xs]


def test_scalars_to_u64_field_elements():
    sc = [gf(rng.randrange(ELL)) for _ in range(16)]
    got = native._scalars_to_u64(sc, ELL)
    saved = native._fastser
    native._fastser = None
    try:
        expect = native._scalars_to_u64(sc, ELL)
    finally:
        native._fastser = saved
    assert np.array_equal(got, expect)


def test_points_roundtrip():
    g = EdwardsPoint.generator
    pts = [g ** rng.randrange(1, ELL) for _ in range(9)]
    arr = native._pts_to_u64(pts)
    saved = native._fastser
    native._fastser = None
    try:
        expect = native._pts_to_u64(pts)
    finally:
        native._fastser = saved
    assert np.array_equal(arr, expect)
    back = native._u64_to_pts(arr)
    assert back == pts
    assert all(type(p) is EdwardsPoint for p in back)


def test_circuit_encoding_memoized():
    import verifiable_mpc_tpu.ac20.circuit_builder as cb

    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    y = x * x + 1
    y.label_output("y")
    buf1 = io.BytesIO()
    serialization._encode(buf1, circuit)
    assert circuit._enc_cache[0] == len(circuit.gates)
    buf2 = io.BytesIO()
    serialization._encode(buf2, circuit)
    assert buf1.getvalue() == buf2.getvalue()
    # growing the circuit invalidates the cache
    z = y * y
    z.label_output("z")
    buf3 = io.BytesIO()
    serialization._encode(buf3, circuit)
    assert buf3.getvalue() != buf1.getvalue()
    assert circuit._enc_cache[0] == len(circuit.gates)


def test_encode_gates_c_path_matches_python():
    """The C encode_gates path must fire for DSL-built circuits (Gate.op is
    an `op` Enum member, not a str) and emit bytes identical to the Python
    loop's per-gate records."""
    import verifiable_mpc_tpu.ac20.circuit_builder as cb

    circuit = cb.Circuit()
    x = cb.CircuitVar(gf(3), circuit, "x")
    y = cb.CircuitVar(gf(5), circuit, "y")
    z = (x * y + 2) * x - y * 7
    w = z != 0  # gadget: mixes scalar_mul / add / mul gates + aux inputs
    w.label_output("w")

    raw_c = fs.encode_gates(circuit.gates, cb.CircuitVar)
    assert raw_c is not None, "C path must support every DSL-built circuit"

    # Python fallback bytes for the same circuit (full-circuit record is
    # T_CIRCUIT + u32(len) + gate body; compare the gate body).
    if hasattr(circuit, "_enc_cache"):
        del circuit._enc_cache
    pybuf = io.BytesIO()
    saved = serialization._fastser
    try:
        serialization._fastser = lambda: None
        serialization._encode(pybuf, circuit)
    finally:
        serialization._fastser = saved
    py_raw = pybuf.getvalue()
    import struct

    assert py_raw[0] == serialization.T_CIRCUIT
    (n_gates,) = struct.unpack(">I", py_raw[1:5])
    assert n_gates == len(circuit.gates)
    assert raw_c == py_raw[5:]

    # and the full _encode dispatch actually uses the C bytes
    if hasattr(circuit, "_enc_cache"):
        del circuit._enc_cache
    cbuf = io.BytesIO()
    serialization._encode(cbuf, circuit)
    assert cbuf.getvalue() == py_raw


def test_bn_point_converters_roundtrip():
    """C converters for BN G1/twist points: object-identical to the Python
    loops (reduced coords, skipped __init__s)."""
    import random

    import numpy as np

    from verifiable_mpc_tpu import native
    from verifiable_mpc_tpu.groups.bn256 import (
        ORDER,
        BNPoint,
        BNTwistPoint,
    )

    rng = random.Random(77)
    g = BNPoint.generator
    pts = [g * rng.randrange(1, ORDER) for _ in range(9)] + [BNPoint.identity]
    arr = native._bn_pts_to_u64(pts)
    assert arr.shape == (10, 12) and arr.dtype == np.uint64
    back = native._u64_to_bn_pts(arr)
    for p, q in zip(pts, back):
        assert type(q) is BNPoint and q == p
        assert (q.x.value, q.y.value, q.z.value) == (
            p.x.value,
            p.y.value,
            p.z.value,
        )

    g2 = BNTwistPoint.generator
    pts2 = [g2 * rng.randrange(1, ORDER) for _ in range(5)] + [
        BNTwistPoint.identity
    ]
    arr2 = native._bn2_pts_to_u64(pts2)
    assert arr2.shape == (6, 24)
    back2 = native._u64_to_bn2_pts(arr2)
    for p, q in zip(pts2, back2):
        assert type(q) is BNTwistPoint and q == p
        assert (q.x.c0, q.x.c1, q.y.c0, q.z.c1) == (
            p.x.c0,
            p.x.c1,
            p.y.c0,
            p.z.c1,
        )
