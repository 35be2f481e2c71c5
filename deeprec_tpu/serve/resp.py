"""Minimal RESP (REdis Serialization Protocol) client + test server.

The reference's redis feature store links hiredis
(serving/processor/storage/redis_feature_store.cc); this module speaks the
same wire protocol from the stdlib so ``RedisFeatureStore`` executes against
any real Redis server with zero third-party dependencies, and
``MiniRedisServer`` provides an in-process RESP endpoint so the code path is
exercised in tests (this image has no redis server or client library).

Only the RESP2 subset the feature store needs is implemented:
inline arrays-of-bulk-strings requests; simple-string / error / integer /
bulk / array replies; request pipelining (concatenate N commands, read N
replies on one socket round trip).
"""

from __future__ import annotations

import socket
import threading
from typing import List, Optional, Sequence, Tuple
from urllib.parse import urlparse


def encode_command(*args: bytes) -> bytes:
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        out.append(b"$%d\r\n%s\r\n" % (len(a), a))
    return b"".join(out)


class _Reader:
    """Buffered RESP reply reader over a socket."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def _readline(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(1 << 16)
            if not chunk:
                raise ConnectionError("redis connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _readn(self, n: int) -> bytes:
        while len(self._buf) < n + 2:  # payload + trailing \r\n
            chunk = self._sock.recv(1 << 16)
            if not chunk:
                raise ConnectionError("redis connection closed")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2:]
        return data

    def read_reply(self):
        line = self._readline()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest
        if kind == b"-":
            raise RedisError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            return None if n < 0 else self._readn(n)
        if kind == b"*":
            n = int(rest)
            return None if n < 0 else [self.read_reply() for _ in range(n)]
        raise RedisError(f"bad RESP type byte {kind!r}")


class RedisError(Exception):
    pass


class RespClient:
    """Pipelining RESP client. Thread-safe via a per-call lock."""

    def __init__(self, host: str = "localhost", port: int = 6379,
                 timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._reader = _Reader(self._sock)
        self._lock = threading.Lock()

    @classmethod
    def from_url(cls, url: str, timeout: float = 30.0) -> "RespClient":
        u = urlparse(url)
        return cls(u.hostname or "localhost", u.port or 6379, timeout)

    def execute(self, *args) -> object:
        return self.pipeline([args])[0]

    def pipeline(self, commands: Sequence[Tuple]) -> List[object]:
        """Send N commands in one write, read N replies.

        ALL N replies are consumed before any error reply is raised —
        raising mid-read would leave the remaining replies buffered on
        the connection and permanently desync every later command
        (round-4 review: a -MOVED in the middle of a cluster mset made
        subsequent GETs read stale leftover replies)."""

        payload = b"".join(
            encode_command(*[_as_bytes(a) for a in cmd]) for cmd in commands)
        with self._lock:
            try:
                self._sock.sendall(payload)
                out = []
                first_err = None
                for _ in commands:
                    try:
                        out.append(self._reader.read_reply())
                    except RedisError as e:
                        out.append(e)
                        if first_err is None:
                            first_err = e
            except (OSError, socket.timeout):
                # A transport failure mid-pipeline (server stall, partial
                # recv) leaves unread replies in flight; reusing this
                # connection would hand those stale replies to the NEXT
                # command and misalign every later lookup (round-5
                # review).  Poison the socket so any further use fails
                # loudly instead of silently desyncing.
                try:
                    self._sock.close()
                finally:
                    raise
        if first_err is not None:
            raise first_err
        return out

    def execute_pair(self, first: Tuple, second: Tuple) -> object:
        """Two commands under ONE lock hold; returns the second's reply.
        Needed for ASKING + command, whose one-shot flag a concurrent
        command on the shared connection could otherwise consume."""

        replies = self.pipeline([first, second])
        return replies[1]

    # convenience verbs used by the feature store
    def ping(self) -> bool:
        return self.execute("PING") == b"PONG"

    def set(self, key, value) -> None:
        self.execute("SET", key, value)

    def get(self, key) -> Optional[bytes]:
        return self.execute("GET", key)

    def mget(self, keys: Sequence) -> List[Optional[bytes]]:
        if not keys:
            return []
        return self.execute("MGET", *keys)

    def mset(self, pairs: Sequence[Tuple]) -> None:
        """Pipelined SETs (chunked so one call can't exhaust server buffers)."""
        CHUNK = 4096
        for i in range(0, len(pairs), CHUNK):
            self.pipeline([("SET", k, v) for k, v in pairs[i:i + CHUNK]])

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


def _as_bytes(x) -> bytes:
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return x.encode()
    return str(x).encode()


# ---------------------------------------------------------------------------
# Redis Cluster (the reference's cluster_redis feature_store_type,
# serving/processor/storage/redis_feature_store.h:85 ClusterRedis*)


NUM_SLOTS = 16384

_CRC16_TAB = []


def _crc16_tab():
    if not _CRC16_TAB:
        for i in range(256):
            crc = i << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x1021 if crc & 0x8000 else crc << 1) \
                    & 0xFFFF
            _CRC16_TAB.append(crc)
    return _CRC16_TAB


def crc16(data: bytes) -> int:
    """CRC16-CCITT (XMODEM) — the Redis Cluster key-slot hash."""

    tab = _crc16_tab()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tab[((crc >> 8) ^ b) & 0xFF]
    return crc


def key_slot(key) -> int:
    """Redis Cluster slot of a key, honoring {hash tags}."""

    k = _as_bytes(key)
    i = k.find(b"{")
    if i >= 0:
        j = k.find(b"}", i + 1)
        if j > i + 1:
            k = k[i + 1:j]
    return crc16(k) % NUM_SLOTS


class ClusterRespClient:
    """Slot-routed RESP client for a Redis Cluster.

    Discovers the slot map with CLUSTER SLOTS from any seed node, routes
    every key to its owner, groups multi-key batches per node, and follows
    -MOVED redirects (refreshing the map) and -ASK redirects (one-shot
    ASKING) — the client-side contract hiredis-cluster implements for the
    reference's ClusterRedis feature store."""

    def __init__(self, seeds: Sequence[Tuple[str, int]],
                 timeout: float = 30.0):
        self._timeout = timeout
        self._conns = {}
        self._slot_map: List[Optional[Tuple[str, int]]] = [None] * NUM_SLOTS
        self._lock = threading.Lock()
        last = None
        for host, port in seeds:
            try:
                self._refresh_slots((host, port))
                return
            except (OSError, RedisError) as e:
                last = e
        raise ConnectionError(f"no cluster seed answered: {last}")

    @classmethod
    def from_url(cls, url: str, timeout: float = 30.0) -> "ClusterRespClient":
        """redis://h1:p1[,h2:p2,...] — comma-separated seed list."""

        u = urlparse(url)
        netloc = u.netloc or url
        seeds = []
        for part in netloc.split(","):
            host, _, port = part.partition(":")
            seeds.append((host or "localhost", int(port or 6379)))
        return cls(seeds, timeout)

    def _conn(self, node: Tuple[str, int]) -> RespClient:
        with self._lock:
            c = self._conns.get(node)
            if c is None:
                c = RespClient(node[0], node[1], self._timeout)
                self._conns[node] = c
            return c

    def _refresh_slots(self, seed: Tuple[str, int]) -> None:
        ranges = self._conn(seed).execute("CLUSTER", "SLOTS")
        for r in ranges:
            lo, hi, master = int(r[0]), int(r[1]), r[2]
            node = (bytes(master[0]).decode(), int(master[1]))
            for s in range(lo, hi + 1):
                self._slot_map[s] = node

    def _node_of(self, key) -> Tuple[str, int]:
        node = self._slot_map[key_slot(key)]
        if node is None:
            raise RedisError(f"no node covers slot of {key!r}")
        return node

    def execute(self, *args, key=None) -> object:
        """Run one command routed by ``key`` (default: first key arg)."""

        k = key if key is not None else args[1]
        node = self._node_of(k)
        for _ in range(4):
            try:
                return self._conn(node).execute(*args)
            except RedisError as e:
                msg = str(e)
                if msg.startswith("MOVED "):
                    _, _, addr = msg.split(" ", 2)
                    host, _, port = addr.partition(":")
                    node = (host, int(port))
                    self._slot_map[key_slot(k)] = node
                    continue
                if msg.startswith("ASK "):
                    _, _, addr = msg.split(" ", 2)
                    host, _, port = addr.partition(":")
                    c = self._conn((host, int(port)))
                    try:
                        # atomic ASKING+command (one lock hold): a
                        # concurrent command must not consume the one-shot
                        # ASKING flag (round-4 review)
                        return c.execute_pair(("ASKING",), tuple(args))
                    except RedisError as e2:
                        # the importing node may answer -MOVED once the
                        # migration completes — retry through the loop
                        if str(e2).startswith("MOVED "):
                            _, _, addr2 = str(e2).split(" ", 2)
                            h2, _, p2 = addr2.partition(":")
                            # update the local retry target too, not just
                            # the slot map — retrying the stale node burns
                            # one of the 4 bounded attempts on a
                            # guaranteed extra redirect (round-5 advice)
                            node = (h2, int(p2))
                            self._slot_map[key_slot(k)] = node
                            continue
                        raise
                raise
        raise RedisError("MOVED redirect loop")

    def ping(self) -> bool:
        return all(self._conn(n).execute("PING") == b"PONG"
                   for n in set(filter(None, self._slot_map)))

    def set(self, key, value) -> None:
        self.execute("SET", key, value)

    def get(self, key) -> Optional[bytes]:
        return self.execute("GET", key)

    def mget(self, keys: Sequence) -> List[Optional[bytes]]:
        """Per-node grouped MGETs, results in request order."""

        if not keys:
            return []
        by_node: dict = {}
        for i, k in enumerate(keys):
            by_node.setdefault(self._node_of(k), []).append((i, k))
        out: List[Optional[bytes]] = [None] * len(keys)
        for node, items in by_node.items():
            try:
                vals = self._conn(node).execute(
                    "MGET", *[k for _, k in items])
                for (i, k), v in zip(items, vals):
                    out[i] = v
            except RedisError:
                # mid-reshard: fall back to per-key routing w/ redirects
                for i, k in items:
                    out[i] = self.execute("GET", k)
        return out

    def mset(self, pairs: Sequence[Tuple]) -> None:
        by_node: dict = {}
        for k, v in pairs:
            by_node.setdefault(self._node_of(k), []).append((k, v))
        for node, items in by_node.items():
            try:
                self._conn(node).mset(items)
            except RedisError:
                for k, v in items:
                    self.execute("SET", k, v)

    def close(self) -> None:
        with self._lock:
            for c in self._conns.values():
                c.close()
            self._conns.clear()


class MiniRedisServer:
    """In-process RESP server (PING/SET/GET/MGET/DEL/DBSIZE/FLUSHDB).

    Stands in for a real Redis in tests; the client half is identical either
    way. One thread per connection; a plain dict + lock store.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 slot_range: Optional[Tuple[int, int]] = None,
                 topology: Optional[list] = None):
        """``slot_range``/``topology`` make this node part of a
        MiniRedisCluster: keys outside [lo, hi] answer -MOVED, and CLUSTER
        SLOTS reports the full topology ([(lo, hi, host, port), ...])."""

        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self._data = {}
        self._slot_range = slot_range
        self._topology = topology
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self) -> "MiniRedisServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    @property
    def url(self) -> str:
        return f"redis://{self.host}:{self.port}"

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        reader = _Reader(conn)
        try:
            while not self._stop.is_set():
                try:
                    cmd = reader.read_reply()
                except (ConnectionError, OSError):
                    return
                if not isinstance(cmd, list) or not cmd:
                    conn.sendall(b"-ERR protocol\r\n")
                    continue
                conn.sendall(self._dispatch([bytes(c) for c in cmd]))
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _moved(self, key: bytes) -> Optional[bytes]:
        """Cluster mode: -MOVED reply for keys this node does not own."""

        if self._slot_range is None:
            return None
        s = key_slot(key)
        lo, hi = self._slot_range
        if lo <= s <= hi:
            return None
        for tlo, thi, host, port in self._topology:
            if tlo <= s <= thi:
                return b"-MOVED %d %s:%d\r\n" % (s, host.encode(), port)
        return b"-CLUSTERDOWN no node for slot %d\r\n" % s

    def _dispatch(self, cmd: List[bytes]) -> bytes:
        verb = cmd[0].upper()
        if verb in (b"SET", b"GET", b"DEL") and len(cmd) >= 2:
            m = self._moved(cmd[1])
            if m is not None:
                return m
        if verb == b"MGET":
            for k in cmd[1:]:
                m = self._moved(k)
                if m is not None:
                    return m
        if verb == b"CLUSTER" and len(cmd) >= 2 \
                and cmd[1].upper() == b"SLOTS":
            if self._topology is None:
                return b"-ERR This instance has cluster support disabled\r\n"
            out = [b"*%d\r\n" % len(self._topology)]
            for lo, hi, host, port in self._topology:
                h = host.encode()
                out.append(b"*3\r\n:%d\r\n:%d\r\n" % (lo, hi))
                out.append(b"*3\r\n$%d\r\n%s\r\n:%d\r\n$2\r\nid\r\n"
                           % (len(h), h, port))
            return b"".join(out)
        if verb == b"ASKING":
            return b"+OK\r\n"
        with self._lock:
            if verb == b"PING":
                return b"+PONG\r\n"
            if verb == b"SET" and len(cmd) >= 3:
                self._data[cmd[1]] = cmd[2]
                return b"+OK\r\n"
            if verb == b"GET" and len(cmd) == 2:
                v = self._data.get(cmd[1])
                return b"$-1\r\n" if v is None else \
                    b"$%d\r\n%s\r\n" % (len(v), v)
            if verb == b"MGET":
                out = [b"*%d\r\n" % (len(cmd) - 1)]
                for k in cmd[1:]:
                    v = self._data.get(k)
                    out.append(b"$-1\r\n" if v is None else
                               b"$%d\r\n%s\r\n" % (len(v), v))
                return b"".join(out)
            if verb == b"DEL":
                n = sum(1 for k in cmd[1:] if self._data.pop(k, None)
                        is not None)
                return b":%d\r\n" % n
            if verb == b"DBSIZE":
                return b":%d\r\n" % len(self._data)
            if verb == b"FLUSHDB":
                self._data.clear()
                return b"+OK\r\n"
        return b"-ERR unknown command\r\n"


class MiniRedisCluster:
    """N MiniRedisServers splitting the 16384 slots evenly — an in-process
    stand-in for a real Redis Cluster (this image has no redis); the client
    half (ClusterRespClient) is identical against either."""

    def __init__(self, n_nodes: int = 3, host: str = "127.0.0.1"):
        bounds = [NUM_SLOTS * i // n_nodes for i in range(n_nodes + 1)]
        # two passes: ports are only known after bind
        self.nodes = [MiniRedisServer(host) for _ in range(n_nodes)]
        topology = [(bounds[i], bounds[i + 1] - 1, host, self.nodes[i].port)
                    for i in range(n_nodes)]
        for i, node in enumerate(self.nodes):
            node._slot_range = (bounds[i], bounds[i + 1] - 1)
            node._topology = topology

    def start(self) -> "MiniRedisCluster":
        for n in self.nodes:
            n.start()
        return self

    def stop(self) -> None:
        for n in self.nodes:
            n.stop()

    @property
    def seeds(self):
        return [(n.host, n.port) for n in self.nodes]

    @property
    def url(self) -> str:
        return "redis://" + ",".join(f"{h}:{p}" for h, p in self.seeds)
