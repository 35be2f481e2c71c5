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
        """Send N commands in one write, read N replies."""
        payload = b"".join(
            encode_command(*[_as_bytes(a) for a in cmd]) for cmd in commands)
        with self._lock:
            self._sock.sendall(payload)
            return [self._reader.read_reply() for _ in commands]

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


class MiniRedisServer:
    """In-process RESP server (PING/SET/GET/MGET/DEL/DBSIZE/FLUSHDB).

    Stands in for a real Redis in tests; the client half is identical either
    way. One thread per connection; a plain dict + lock store.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self._data = {}
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

    def _dispatch(self, cmd: List[bytes]) -> bytes:
        verb = cmd[0].upper()
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
