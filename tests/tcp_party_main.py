"""Subprocess entry for the TCP transport test: one MPC party.

Usage: python tcp_party_main.py <pid> <m> <port> [--tls CERTDIR]
       [--pin CERTDIR] [--chaos]
Runs a secure multiplication, a comparison gadget, and a secure-group
commitment over TCP, then prints the opened results.  ``--tls`` enables
mutually-authenticated TLS using CERTDIR/party.crt|party.key|ca.crt;
``--chaos`` forcibly drops every live connection mid-protocol to exercise
reconnection + frame replay.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from verifiable_mpc_tpu.groups import QuadraticResidues
from verifiable_mpc_tpu.mpc.runtime import mpc
from verifiable_mpc_tpu.mpc.secgroups import secure_repeat
from verifiable_mpc_tpu.mpc.transport import run_tcp_party


async def party(chaos=False):
    await mpc.start()
    group = QuadraticResidues(l=64)
    sectype = mpc.SecInt(l=16, p=group.order)

    a = sectype(6)
    b = sectype(7)
    prod = await mpc.output(a * b)

    if chaos and mpc.pid == 0:
        # drop every live connection mid-protocol: the dialing peers must
        # reconnect and replay unacknowledged frames
        hub = mpc.hub
        for peer in hub._links:
            hub.inject_disconnect(peer)

    r = mpc._random(sectype)
    masked = await mpc.output(r * sectype(0) + sectype(5))

    bits = mpc.to_bits(sectype(5), 4)
    bit_vals = await mpc.output(bits)

    com = await secure_repeat([group.generator], [sectype(3)])
    expected_com = group.generator ** 3

    transferred = await mpc.transfer(mpc.pid)

    await mpc.shutdown()
    ok = (
        prod == 42
        and masked == 5
        and bit_vals == [1, 0, 1, 0]
        and com == expected_com
        and transferred == list(range(mpc.m))
    )
    print("PARTY_RESULT", mpc.pid if hasattr(mpc, "pid") else -1, ok)
    return 0 if ok else 1


if __name__ == "__main__":
    pid, m, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    tls = None
    if "--tls" in sys.argv:
        certdir = sys.argv[sys.argv.index("--tls") + 1]
        tls = dict(
            certfile=os.path.join(certdir, "party.crt"),
            keyfile=os.path.join(certdir, "party.key"),
            cafile=os.path.join(certdir, "ca.crt"),
        )
    if "--pin" in sys.argv:
        # per-party certificates with CN=vmpc-party-<pid>, pinning on
        certdir = sys.argv[sys.argv.index("--pin") + 1]
        tls = dict(
            certfile=os.path.join(certdir, f"party{pid}.crt"),
            keyfile=os.path.join(certdir, f"party{pid}.key"),
            cafile=os.path.join(certdir, "ca.crt"),
            pin=True,
        )
    chaos = "--chaos" in sys.argv
    rc = run_tcp_party(lambda: party(chaos), pid, m, base_port=port, tls=tls)
    sys.exit(rc)
