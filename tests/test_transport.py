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


def _make_pinned_certs(tmpdir, m=3, wrong_pid=None):
    """A CA plus per-party certificates with CN=vmpc-party-<pid>.
    wrong_pid: issue that party a certificate claiming a different id."""
    ca_crt = os.path.join(tmpdir, "ca.crt")
    ca_key = os.path.join(tmpdir, "ca.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", ca_key, "-out", ca_crt, "-days", "1",
         "-subj", "/CN=vmpc-ca"],
        check=True, capture_output=True,
    )
    for pid in range(m):
        cn = pid if pid != wrong_pid else (pid + 1) % m
        key = os.path.join(tmpdir, f"party{pid}.key")
        csr = os.path.join(tmpdir, f"party{pid}.csr")
        crt = os.path.join(tmpdir, f"party{pid}.crt")
        subprocess.run(
            ["openssl", "req", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key, "-out", csr, "-subj", f"/CN=vmpc-party-{cn}"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["openssl", "x509", "-req", "-in", csr, "-CA", ca_crt,
             "-CAkey", ca_key, "-CAcreateserial", "-out", crt, "-days", "1"],
            check=True, capture_output=True,
        )
    return tmpdir


def test_tcp_tls_pinned_parties(tmp_path):
    """Three parties with per-party pinned certificates."""
    import shutil

    if shutil.which("openssl") is None:
        pytest.skip("no openssl binary")
    certdir = _make_pinned_certs(str(tmp_path))
    _run_parties(
        3, 25400 + random.Random().randrange(200), ("--pin", certdir)
    )


def test_tcp_pin_rejects_wrong_identity(tmp_path):
    """A CA-signed certificate claiming the wrong party id must be refused
    at connect time (in-process: two hubs, one mislabeled)."""
    import asyncio
    import shutil

    if shutil.which("openssl") is None:
        pytest.skip("no openssl binary")
    from verifiable_mpc_tpu.mpc.transport import TcpHub

    certdir = _make_pinned_certs(str(tmp_path), m=2, wrong_pid=1)
    port = 25700 + random.Random().randrange(200)

    def tls_for(pid):
        return dict(
            certfile=os.path.join(certdir, f"party{pid}.crt"),
            keyfile=os.path.join(certdir, f"party{pid}.key"),
            cafile=os.path.join(certdir, "ca.crt"),
            pin=True,
        )

    async def main():
        hub0 = TcpHub(0, 2, port, tls=tls_for(0))
        hub1 = TcpHub(1, 2, port, tls=tls_for(1))  # cert claims party 0
        t0 = asyncio.create_task(hub0.ensure_started())
        # party 1 dials party 0; its mislabeled cert must be rejected by
        # hub0's server and hub1 must never attach a link
        t1 = asyncio.create_task(hub1.ensure_started())
        done, pending = await asyncio.wait({t0, t1}, timeout=8)
        attached = any(
            l.writer is not None for l in hub0._links.values()
        ) and any(l.writer is not None for l in hub1._links.values())
        for t in (t0, t1):
            t.cancel()
        await hub0.close()
        await hub1.close()
        return attached

    assert asyncio.run(main()) is False


def test_replay_buffer_bounded():
    """Past max_unacked_bytes the sender requests an immediate ack (PING),
    keeping the replay buffer bounded on one-directional streams."""
    import asyncio

    from verifiable_mpc_tpu.mpc.transport import TcpHub

    port = 25900 + random.Random().randrange(200)

    async def main():
        hub0 = TcpHub(0, 2, port, max_unacked_bytes=4096)
        hub1 = TcpHub(1, 2, port, max_unacked_bytes=4096)
        await asyncio.gather(hub0.ensure_started(), hub1.ensure_started())
        payload = list(range(64))  # ~few hundred wire bytes per frame
        for i in range(512):
            hub1.send(1, 0, ("op", i), payload)
            if i % 64 == 0:
                await asyncio.sleep(0.01)  # let acks flow
        for _ in range(200):
            await asyncio.sleep(0.01)
            if hub1._links[0].unacked_bytes <= 4096 * 2:
                break
        bounded = hub1._links[0].unacked_bytes <= 4096 * 2
        # the receiver got everything exactly once
        got = 0
        for i in range(512):
            val = await asyncio.wait_for(hub0.recv(0, 1, ("op", i)), 10)
            assert val == payload
            got += 1
        await hub0.close()
        await hub1.close()
        return bounded and got == 512

    assert asyncio.run(main()) is True
