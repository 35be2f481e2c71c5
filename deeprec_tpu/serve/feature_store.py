"""Serving feature stores: in-memory tables or a shared Redis cluster.

The reference's ``feature_store_type`` (serving/processor model_config:
"memory" | "redis" | "cluster_redis"; storage/redis_feature_store.{h,cc})
lets many serving instances share one parameter store.  Here:

  * ``MemoryFeatureStore`` — the default: the Processor's own restored
    tables (zero-copy; what test_serving exercises).
  * ``RedisFeatureStore`` — key/value rows in Redis over a stdlib RESP
    client (serve/resp.py; no third-party package needed).  Row encoding
    matches the delta-file layout so a training job can publish deltas
    straight into Redis; tests run it against an in-process MiniRedisServer.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class MemoryFeatureStore:
    """Thin view over restored EmbeddingTables (feature_store_type=memory)."""

    def __init__(self, tables: Dict):
        self.tables = tables

    def lookup(self, table: str, ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from deeprec_tpu.embedding import table as ev

        t = self.tables[table]
        rows = np.asarray(ev.lookup(t, jnp.asarray(ids)))
        found = np.asarray(ev.contains(t, jnp.asarray(ids)))
        return rows, found


class RedisFeatureStore:
    """EV rows in Redis (feature_store_type=redis/cluster_redis).

    Keys: ``{prefix}:{table}:{id}`` -> row bytes (float32 little-endian).
    """

    def __init__(self, url: str = "redis://localhost:6379", prefix: str = "ev",
                 cluster: bool = False):
        # cluster=True speaks Redis Cluster: CLUSTER SLOTS discovery,
        # CRC16 key-slot routing, MOVED/ASK redirects
        # (feature_store_type="cluster_redis", redis_feature_store.h:85);
        # the url may list several seed nodes (redis://h1:p1,h2:p2).
        if cluster:
            from deeprec_tpu.serve.resp import ClusterRespClient

            self._r = ClusterRespClient.from_url(url)
        else:
            from deeprec_tpu.serve.resp import RespClient

            self._r = RespClient.from_url(url)
        if not self._r.ping():
            raise ConnectionError(f"redis at {url} did not answer PING")
        self.prefix = prefix

    def publish_table(self, name: str, keys: np.ndarray, rows: np.ndarray):
        rows = np.ascontiguousarray(rows, np.float32)
        self._r.mset([(f"{self.prefix}:{name}:{k}", row.tobytes())
                      for k, row in zip(keys.tolist(), rows)])

    def lookup(self, table: str, ids: np.ndarray, dim: int):
        vals = self._r.mget([f"{self.prefix}:{table}:{i}" for i in ids.tolist()])
        out = np.zeros((len(ids), dim), np.float32)
        found = np.zeros((len(ids),), bool)
        bad = 0
        for j, v in enumerate(vals):
            if v is not None:
                row = np.frombuffer(v, np.float32)
                if row.shape[0] != dim:
                    # wrong-layout value (stale publish after a dim
                    # change, or value+slot bytes): treat as MISSING
                    # instead of raising a broadcast error inside predict
                    # — one poisoned key must not 400 every request that
                    # touches it (round-5 review)
                    bad += 1
                    continue
                out[j] = row
                found[j] = True
        if bad:
            import logging

            logging.getLogger(__name__).warning(
                "feature store %s:%s returned %d value(s) whose byte "
                "length does not match dim=%d — treated as missing "
                "(stale publish layout?)", self.prefix, table, bad, dim)
        return out, found

    def close(self):
        self._r.close()
