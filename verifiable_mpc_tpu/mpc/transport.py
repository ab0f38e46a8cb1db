"""TCP transport: real multi-process MPC parties over localhost/network.

The in-process hub (runtime.Hub) simulates the party plane on one event
loop; this module provides the production topology the reference gets from
MPyC (SURVEY.md §5.8 "asyncio TCP point-to-point connections between m party
processes"): every party is its own OS process, pairwise TCP streams carry
length-prefixed frames of canonically-serialized payloads
(:mod:`verifiable_mpc_tpu.serialization`), and messages are demultiplexed by
the same deterministic program-order op ids the in-process hub uses.

Beyond the reference (which has no transport hardening at all — a dropped
party aborts the run, SURVEY.md §5.3):

* **TLS**: pass ``tls=dict(certfile=..., keyfile=..., cafile=...)`` for
  mutually-authenticated TLS between parties (one shared CA; hostname
  checking is off because parties are addressed by pid/port).
* **Per-party certificate pinning**: add ``pin=True`` to the tls dict (and
  issue each party a certificate whose CN is ``<pin_prefix><pid>``,
  default prefix ``vmpc-party-``).  Without pinning, any CA-signed
  certificate can claim any party id in the hello frame; with it, both
  sides verify the TLS identity matches the claimed/ dialed pid before
  attaching the link.
* **Reconnection with replay**: every frame carries a per-peer sequence
  number; receivers dedup and acknowledge periodically, senders buffer
  unacknowledged frames and replay them after re-establishing a dropped
  connection (the higher pid reconnects; the listener accepts the
  replacement).  A transient network failure mid-protocol is therefore
  survivable instead of fatal.
* **Bounded replay buffers**: senders track unacknowledged bytes; past
  ``max_unacked_bytes`` they request an immediate acknowledgement (PING
  frame) instead of waiting for the receiver's every-N cadence, so
  long one-directional streams cannot grow the replay buffer without
  bound while the peer is alive.
"""

from __future__ import annotations

import asyncio
import logging
import struct

from .. import serialization
from . import shamir
from .runtime import Runtime, _ctx_runtime

logger = logging.getLogger("mpc_transport")

_ACK_EVERY = 256  # receiver acks every N frames (and on reconnect)
_RECONNECT_TRIES = 100
_RECONNECT_DELAY = 0.1
_MAX_UNACKED_BYTES = 64 * 1024 * 1024

_F_DATA = 0
_F_ACK = 1
_F_HELLO = 2
_F_PING = 3  # "ack me now" — bounds the sender's replay buffer


def _peer_common_name(writer) -> str | None:
    """CN of the peer's TLS certificate, None without TLS."""
    cert = writer.get_extra_info("peercert")
    if not cert:
        return None
    for rdn in cert.get("subject", ()):
        for key, value in rdn:
            if key == "commonName":
                return value
    return None


def make_tls_contexts(certfile: str, keyfile: str, cafile: str):
    """(server_ctx, client_ctx) for mutually-authenticated party links."""
    import ssl

    server = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server.load_cert_chain(certfile, keyfile)
    server.load_verify_locations(cafile)
    server.verify_mode = ssl.CERT_REQUIRED
    client = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    client.load_cert_chain(certfile, keyfile)
    client.load_verify_locations(cafile)
    client.check_hostname = False  # parties are addressed by pid/port
    return server, client


class _PeerLink:
    """Send/receive state for one peer: sequence numbers, replay buffer."""

    __slots__ = ("writer", "send_seq", "unacked", "recv_seq", "since_ack",
                 "unacked_bytes", "ping_sent")

    def __init__(self):
        self.writer = None
        self.send_seq = 0  # next sequence number to assign
        self.unacked = {}  # seq -> wire bytes (replayed on reconnect)
        self.recv_seq = 0  # next expected sequence from the peer
        self.since_ack = 0
        self.unacked_bytes = 0
        self.ping_sent = False


class TcpHub:
    def __init__(self, pid: int, m: int, base_port: int = 23265,
                 host: str = "127.0.0.1", tls: dict | None = None,
                 max_unacked_bytes: int = _MAX_UNACKED_BYTES):
        self.pid = pid
        self.m = m
        self.base_port = base_port
        self.host = host
        self.max_unacked_bytes = max_unacked_bytes
        self._boxes = {}  # (src, op_key) -> Future
        self._links = {p: _PeerLink() for p in range(m) if p != pid}
        self._server = None
        self._reader_tasks = {}
        self._started = False
        self._ssl_server = None
        self._ssl_client = None
        self._pin_prefix = None
        if tls is not None:
            self._ssl_server, self._ssl_client = make_tls_contexts(
                tls["certfile"], tls["keyfile"], tls["cafile"]
            )
            if tls.get("pin"):
                self._pin_prefix = tls.get("pin_prefix", "vmpc-party-")

    def _check_pin(self, peer: int, writer) -> bool:
        """Verify the TLS peer identity matches the party id (pin mode)."""
        if self._pin_prefix is None:
            return True
        cn = _peer_common_name(writer)
        expect = f"{self._pin_prefix}{peer}"
        if cn != expect:
            logger.warning(
                "party %d: rejecting link claiming pid %d with TLS CN %r "
                "(expected %r)", self.pid, peer, cn, expect,
            )
            writer.transport.abort()
            return False
        return True

    # -- connection management --------------------------------------------
    async def ensure_started(self):
        if self._started:
            return
        self._started = True
        if self.m == 1:
            return

        async def on_connect(reader, writer):
            peer = struct.unpack(">I", await reader.readexactly(4))[0]
            if peer not in self._links or not self._check_pin(peer, writer):
                writer.transport.abort()
                return
            self._attach(peer, reader, writer)

        self._server = await asyncio.start_server(
            on_connect, self.host, self.base_port + self.pid,
            ssl=self._ssl_server,
        )
        for peer in range(self.pid):
            await self._connect(peer)
        while any(l.writer is None for l in self._links.values()):
            await asyncio.sleep(0.02)

    async def _connect(self, peer: int):
        """Dial a lower-pid peer (with retries) and say hello."""
        for _ in range(_RECONNECT_TRIES):
            try:
                reader, writer = await asyncio.open_connection(
                    self.host, self.base_port + peer, ssl=self._ssl_client
                )
                break
            except OSError:
                await asyncio.sleep(_RECONNECT_DELAY)
        else:
            raise ConnectionError(
                f"party {self.pid} cannot reach party {peer}"
            )
        if not self._check_pin(peer, writer):
            raise ConnectionError(
                f"party {self.pid}: peer {peer} failed certificate pinning"
            )
        writer.write(struct.pack(">I", self.pid))
        self._attach(peer, reader, writer)

    def _attach(self, peer: int, reader, writer):
        link = self._links[peer]
        old = self._reader_tasks.pop(peer, None)
        if old is not None:
            old.cancel()
        link.writer = writer
        # replay everything the peer hasn't acknowledged (dedup by seq
        # on the receiving side makes duplicates harmless)
        for seq in sorted(link.unacked):
            writer.write(link.unacked[seq])
        self._reader_tasks[peer] = asyncio.get_running_loop().create_task(
            self._read_loop(peer, reader, writer)
        )

    async def _read_loop(self, peer: int, reader, my_writer):
        link = self._links[peer]
        try:
            while True:
                kind, seq, n = struct.unpack(
                    ">BQI", await reader.readexactly(13)
                )
                frame = await reader.readexactly(n)
                if kind == _F_ACK:
                    for s in list(link.unacked):
                        if s < seq:
                            link.unacked_bytes -= len(link.unacked.pop(s))
                    link.ping_sent = False
                    if link.unacked_bytes > self.max_unacked_bytes:
                        # still over the cap (frames landed after the acked
                        # prefix): keep the ping/ack loop going until drained
                        self._send_ping(link)
                    continue
                if kind == _F_PING:
                    self._send_ack(peer)
                    continue
                if seq < link.recv_seq:
                    continue  # replayed duplicate
                link.recv_seq = seq + 1
                op_key, payload = serialization.loads(frame)
                self._box(peer, op_key).set_result(payload)
                link.since_ack += 1
                if link.since_ack >= _ACK_EVERY:
                    self._send_ack(peer)
        except (asyncio.IncompleteReadError, ConnectionResetError, OSError):
            # connection dropped: the dialing side (higher pid) re-dials;
            # the listening side waits for the replacement connection
            if link.writer is my_writer:  # not already replaced
                link.writer = None
                if peer < self.pid:
                    asyncio.get_running_loop().create_task(
                        self._reconnect(peer)
                    )

    async def _reconnect(self, peer: int):
        try:
            await self._connect(peer)
            self._send_ack(peer)  # tell the peer what we have
        except ConnectionError:
            pass  # unreachable: pending recv futures keep the run blocked

    def _send_ping(self, link):
        if link.writer is None or link.ping_sent:
            return
        try:
            link.writer.write(struct.pack(">BQI", _F_PING, 0, 0))
            link.ping_sent = True
        except (ConnectionResetError, OSError):
            pass

    def _send_ack(self, peer: int):
        link = self._links[peer]
        link.since_ack = 0
        if link.writer is not None:
            try:
                link.writer.write(struct.pack(">BQI", _F_ACK, link.recv_seq, 0))
            except (ConnectionResetError, OSError):
                pass

    def _box(self, src, op_key):
        key = (src, op_key)
        fut = self._boxes.get(key)
        if fut is None:
            fut = asyncio.get_running_loop().create_future()
            self._boxes[key] = fut
        return fut

    @staticmethod
    def _key(op_id):
        return serialization.dumps(op_id)

    # -- fault injection (tests) -------------------------------------------
    def inject_disconnect(self, peer: int):
        """Forcibly drop the link to ``peer`` (reconnect/replay test hook)."""
        link = self._links[peer]
        if link.writer is not None:
            link.writer.transport.abort()

    # -- hub interface (same shape as runtime.Hub) --------------------------
    def send(self, src, dst, op_id, payload):
        frame = serialization.dumps((self._key(op_id), payload))
        link = self._links[dst]
        seq = link.send_seq
        link.send_seq += 1
        wire = struct.pack(">BQI", _F_DATA, seq, len(frame)) + frame
        link.unacked[seq] = wire
        link.unacked_bytes += len(wire)
        writer = link.writer
        if writer is not None:
            try:
                writer.write(wire)
            except (ConnectionResetError, OSError):
                return  # replayed after reconnect
            if link.unacked_bytes > self.max_unacked_bytes:
                # request an immediate ack so the replay buffer stays
                # bounded on long one-directional streams
                self._send_ping(link)

    async def recv(self, dst, src, op_id):
        fut = self._box(src, self._key(op_id))
        value = await fut
        del self._boxes[(src, self._key(op_id))]
        return value

    async def close(self):
        for t in self._reader_tasks.values():
            t.cancel()
        for link in self._links.values():
            if link.writer is not None:
                link.writer.close()
        if self._server is not None:
            self._server.close()


class TcpRuntime(Runtime):
    async def start(self):
        await self.hub.ensure_started()
        await self.barrier()

    async def shutdown(self):
        await self.barrier()
        self.report_op_counts()
        await asyncio.sleep(0.05)  # let in-flight frames drain
        await self.hub.close()


def run_tcp_party(party_program, pid: int, m: int, base_port: int = 23265,
                  tls: dict | None = None):
    """Run one party process over TCP; call in m separate processes with
    pid = 0..m-1 (the analogue of MPyC's -M/-I flags).  ``tls`` enables
    mutually-authenticated TLS (see :func:`make_tls_contexts`)."""

    async def driver():
        hub = TcpHub(pid, m, base_port, tls=tls)
        rt = TcpRuntime(pid, m, hub)
        token = _ctx_runtime.set(rt)
        try:
            return await party_program()
        finally:
            _ctx_runtime.reset(token)

    return asyncio.run(driver())
