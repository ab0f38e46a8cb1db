"""TCP transport: real multi-process MPC parties over localhost/network.

The in-process hub (runtime.Hub) simulates the party plane on one event
loop; this module provides the production topology the reference gets from
MPyC (SURVEY.md §5.8 "asyncio TCP point-to-point connections between m party
processes"): every party is its own OS process, pairwise TCP streams carry
length-prefixed frames of canonically-serialized payloads
(:mod:`verifiable_mpc_tpu.serialization`), and messages are demultiplexed by
the same deterministic program-order op ids the in-process hub uses.

The comparison-gadget ideal functionality is realized by a designated dealer
(party 0): shares travel to the dealer, which recombines, evaluates the
predicate and deals fresh Shamir shares back.
"""

from __future__ import annotations

import asyncio
import struct

from .. import serialization
from . import shamir
from .runtime import Runtime, _ctx_runtime


class TcpHub:
    def __init__(self, pid: int, m: int, base_port: int = 23265, host: str = "127.0.0.1"):
        self.pid = pid
        self.m = m
        self.base_port = base_port
        self.host = host
        self._boxes = {}  # (src, op_key) -> Future
        self._writers = {}  # peer pid -> StreamWriter
        self._server = None
        self._reader_tasks = []
        self._started = False

    # -- connection management --------------------------------------------
    async def ensure_started(self):
        if self._started:
            return
        self._started = True
        if self.m == 1:
            return

        async def on_connect(reader, writer):
            peer = struct.unpack(">I", await reader.readexactly(4))[0]
            self._writers[peer] = writer
            self._reader_tasks.append(
                asyncio.get_running_loop().create_task(self._read_loop(peer, reader))
            )

        self._server = await asyncio.start_server(
            on_connect, self.host, self.base_port + self.pid
        )
        # connect to all lower pids (they are already listening or will be)
        for peer in range(self.pid):
            reader, writer = None, None
            for _ in range(600):
                try:
                    reader, writer = await asyncio.open_connection(
                        self.host, self.base_port + peer
                    )
                    break
                except OSError:
                    await asyncio.sleep(0.05)
            if writer is None:
                raise ConnectionError(f"party {self.pid} cannot reach party {peer}")
            writer.write(struct.pack(">I", self.pid))
            self._writers[peer] = writer
            self._reader_tasks.append(
                asyncio.get_running_loop().create_task(self._read_loop(peer, reader))
            )
        # wait until every peer is connected
        while len(self._writers) < self.m - 1:
            await asyncio.sleep(0.02)

    async def _read_loop(self, peer: int, reader):
        try:
            while True:
                (n,) = struct.unpack(">I", await reader.readexactly(4))
                frame = await reader.readexactly(n)
                op_key, payload = serialization.loads(frame)
                self._box(peer, op_key).set_result(payload)
        except (asyncio.IncompleteReadError, ConnectionResetError):
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

    # -- hub interface (same shape as runtime.Hub) --------------------------
    def send(self, src, dst, op_id, payload):
        frame = serialization.dumps((self._key(op_id), payload))
        writer = self._writers[dst]
        writer.write(struct.pack(">I", len(frame)) + frame)

    async def recv(self, dst, src, op_id):
        fut = self._box(src, self._key(op_id))
        value = await fut
        del self._boxes[(src, self._key(op_id))]
        return value

    async def ideal_call(self, pid, op_id, payload, fn, field):
        """Dealer-based ideal functionality (party 0 is the dealer)."""
        if self.m == 1:
            results = fn(payload)
            return [field(int(r)) for r in results]
        up = ("idealup", op_id)
        down = ("idealdown", op_id)
        if pid == 0:
            collected = [payload]
            for src in range(1, self.m):
                collected.append(await self.recv(0, src, up))
            secrets = []
            for j in range(len(payload)):
                secrets.append(
                    shamir.recombine_at_zero(
                        field, [collected[i][j] for i in range(self.m)]
                    )
                )
            results = fn(secrets)
            t = (self.m - 1) // 2
            dealt = [shamir.share(field, int(r), self.m, t) for r in results]
            for dst in range(1, self.m):
                self.send(0, dst, down, [row[dst] for row in dealt])
            return [field(row[0]) for row in dealt]
        self.send(pid, 0, up, payload)
        rows = await self.recv(pid, 0, down)
        return [field(v) for v in rows]

    async def close(self):
        for t in self._reader_tasks:
            t.cancel()
        for w in self._writers.values():
            w.close()
        if self._server is not None:
            self._server.close()


class TcpRuntime(Runtime):
    async def start(self):
        await self.hub.ensure_started()
        await self.barrier()

    async def shutdown(self):
        await self.barrier()
        await asyncio.sleep(0.05)  # let in-flight frames drain
        await self.hub.close()


def run_tcp_party(party_program, pid: int, m: int, base_port: int = 23265):
    """Run one party process over TCP; call in m separate processes with
    pid = 0..m-1 (the analogue of MPyC's -M/-I flags)."""

    async def driver():
        hub = TcpHub(pid, m, base_port)
        rt = TcpRuntime(pid, m, hub)
        token = _ctx_runtime.set(rt)
        try:
            return await party_program()
        finally:
            _ctx_runtime.reset(token)

    return asyncio.run(driver())
