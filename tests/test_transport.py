"""TCP transport tests: serialization roundtrips and real 3-process MPC."""

import os
import random
import subprocess
import sys

import pytest

from verifiable_mpc_tpu import serialization as ser
from verifiable_mpc_tpu.fields import GF
from verifiable_mpc_tpu.groups import EllipticCurve, QuadraticResidues
from verifiable_mpc_tpu.groups.bn256 import BNPoint, BNTwistPoint

rng = random.Random(17)


class TestSerialization:
    def test_primitives(self):
        for obj in [
            None,
            True,
            False,
            0,
            -1,
            1 << 300,
            "hello",
            b"\x00\xff",
            [1, "a", [2, 3]],
            (1, 2),
            {"k": 1, "nested": {"x": [1]}},
        ]:
            assert ser.loads(ser.dumps(obj)) == obj

    def test_field_elements(self):
        gf = GF(2**61 - 1)
        x = gf(rng.randrange(2**61 - 1))
        y = ser.loads(ser.dumps(x))
        assert y == x and type(y) is type(x)

    def test_group_elements(self):
        ed = EllipticCurve("Ed25519")
        p = ed.generator ** rng.randrange(1, ed.order)
        assert ser.loads(ser.dumps(p)) == p

        bn = BNPoint.generator ** 12345
        assert ser.loads(ser.dumps(bn)) == bn
        assert ser.loads(ser.dumps(BNPoint.identity)) == BNPoint.identity

        tw = BNTwistPoint.generator ** 777
        assert ser.loads(ser.dumps(tw)) == tw

        qr = QuadraticResidues(l=64)
        q = qr.generator ** 99
        assert ser.loads(ser.dumps(q)) == q

    def test_forms_and_poly(self):
        from verifiable_mpc_tpu.ac20.pivot import AffineForm, LinearForm
        from verifiable_mpc_tpu.tools.poly import Poly

        gf = GF(101)
        lf = LinearForm([1, gf(2), 3])
        out = ser.loads(ser.dumps(lf))
        assert isinstance(out, LinearForm) and out.coeffs == lf.coeffs
        af = AffineForm([gf(1)], gf(5))
        out = ser.loads(ser.dumps(af))
        assert out.coeffs == af.coeffs and out.constant == af.constant
        poly = Poly([1, 2, gf(3)])
        assert ser.loads(ser.dumps(poly)).coeffs == poly.coeffs

    def test_proof_dict(self):
        ed = EllipticCurve("Ed25519")
        proof = {
            "z_commitment": ed.generator ** 5,
            "t": 123,
            "z_prime": [1, 2],
            "A0": ed.generator ** 7,
        }
        out = ser.loads(ser.dumps(proof))
        assert out == proof


def _run_parties(m, port, extra=()):
    script = os.path.join(os.path.dirname(__file__), "tcp_party_main.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(m), str(port), *extra],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(m)
    ]
    outs = []
    for proc in procs:
        out, err = proc.communicate(timeout=120)
        outs.append((proc.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"party failed: {out}\n{err}"
        assert "True" in out


def test_tcp_three_process_mpc():
    """Spawn three real OS processes exchanging Shamir shares over TCP."""
    _run_parties(3, 24650 + random.Random().randrange(200))


def test_tcp_reconnect_replay():
    """Party 0 forcibly drops every connection mid-protocol; the dialing
    peers must reconnect and replay unacknowledged frames."""
    _run_parties(3, 24900 + random.Random().randrange(200), ("--chaos",))


def _make_certs(tmpdir):
    """One self-signed CA certificate shared as the party identity (the
    transport authenticates by CA membership, not hostname)."""
    crt = os.path.join(tmpdir, "party.crt")
    key = os.path.join(tmpdir, "party.key")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", crt, "-days", "1",
            "-subj", "/CN=vmpc-party",
        ],
        check=True,
        capture_output=True,
    )
    import shutil

    shutil.copy(crt, os.path.join(tmpdir, "ca.crt"))
    return tmpdir


def test_tcp_tls_mutual_auth(tmp_path):
    """Three parties over mutually-authenticated TLS."""
    import shutil

    if shutil.which("openssl") is None:
        import pytest

        pytest.skip("no openssl binary")
    certdir = _make_certs(str(tmp_path))
    _run_parties(
        3, 25150 + random.Random().randrange(200), ("--tls", certdir)
    )
