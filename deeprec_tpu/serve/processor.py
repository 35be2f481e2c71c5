"""Serving processor: low-latency inference with zero-downtime model updates.

TPU-native rebuild of the reference's standalone serving stack
(serving/processor/serving/processor.h — ``initialize()/process()/
get_serving_model_info()``, model_instance.h:44-46, model_session.cc):

  * **Model lifecycle**: ``initialize`` discovers the newest full checkpoint,
    loads it, then a background poller ingests *incremental* delta dumps
    (incr_<step>/ from CheckpointSaverHook) into the live tables with an
    atomic swap — the FullModelUpdate / DeltaModelUpdate path that gives the
    reference sub-minute online updates.
  * **SessionGroup**: ``session_num`` worker lanes batch requests
    concurrently; on TPU one compiled program serves all lanes (XLA streams
    serialize device-side, but host pre/post-processing and transfers
    overlap), with padding buckets to bound compilation.
  * **Config surface**: a JSON/dict mirroring the Processor's model_config
    keys that apply on TPU (session_num, bucket_sizes, warmup,
    feature_store_type="memory").

Request format: {"cat": {col: np.ndarray}, "dense": np.ndarray} → scores
(sigmoid of primary logits).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import queue
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse as sparse_opt
from deeprec_tpu.train import saver
from deeprec_tpu.train.loop import Trainer

import optax

DEFAULT_CONFIG = {
    "session_num": 2,
    "bucket_sizes": [64, 256, 1024],
    "version_poll_secs": 2.0,
    "warmup": True,
    # Replay recorded requests at startup (the reference's warmup_file_name,
    # model_config.cc): a JSONL file of {"dense": [[..]], "cat": {..}}.
    "warmup_file_name": None,
    "feature_store_type": "memory",
    # redis / cluster_redis: a shared parameter store consulted per request
    # for ids MISSING from the local tables (redis_feature_store.{h,cc}
    # role); a training job publishes rows via
    # feature_store.RedisFeatureStore.publish_table.
    "feature_store_url": "redis://localhost:6379",
    # Lane dispatch (select_session_policy, model_config.cc): "shared" = one
    # queue drained by all lanes (least-loaded by construction); "round_robin"
    # = requests assigned to lanes in turn (per-lane FIFO ordering).
    "select_session_policy": "shared",
    # Serve with a bounded device tier + host cold store (ev_storage,
    # model_config.cc EV storage keys): {"dram_rows": N, "ssd_path": ...,
    # "ssd_capacity_mb": M}.  None = everything device-resident.
    "ev_storage": None,
    # Accepted for config-file compatibility; scheduling is XLA's on TPU, so
    # these are recorded in get_serving_model_info and otherwise inert.
    "cpusets": None,
    "omp_num_threads": None,
    "serialize_protocol": "json",
    # Cross-instance embedding sharding (graph_optimizer.h:132-147 +
    # model_config.cc shard_embedding/embedding_names/shard_instance_count):
    # this instance holds only logical-partition slice
    # [shard_instance_index] of [shard_instance_count] for the named tables
    # (None = all); a ShardedServingGroup routes lookups between instances.
    "shard_embedding": False,
    "shard_instance_count": 1,
    "shard_instance_index": 0,
    "embedding_names": None,
}


def cast_cat(arr) -> "np.ndarray":
    """Wire-decode dtype rule shared by every serving frame (HTTP v2, gRPC
    v2, warmup replay): FP-typed cat inputs are per-position combiner
    weights and stay float32 (truncating them to int would corrupt the
    combine — ADVICE r3); integer inputs are ids and become int32."""

    arr = np.asarray(arr)
    if arr.dtype.kind == "f":
        return arr.astype(np.float32)
    # ids: int32 wire default, but NEVER truncate — int64/uint64 inputs
    # (and uint32, whose top half exceeds int32) keep 64-bit width so
    # models built with key_dtype=int64 serve ids >= 2^31 correctly; the
    # lookup path casts to the table's key dtype (round-5 review).
    if arr.dtype.itemsize > 4 or arr.dtype == np.uint32:
        return arr.astype(np.int64)
    return arr.astype(np.int32)


def request_schema(model) -> Dict[str, Tuple[str, Optional[int]]]:
    """{column: (kind, seq_len or None)} for every cat-plane wire input of
    ``model`` — kind is "int" (ids) or "float" (combiner weights), seq_len
    is set for sequence/multivalent-shaped columns.

    SINGLE source of truth for the request column layout, consumed by
    warmup shape priming, the HTTP v2 model-metadata endpoint, and the
    gRPC metadata (round-5 review: the walk used to be duplicated in
    processor._warmup and http_server._v2_metadata, and any drift
    reintroduces the first-request compile stall warmup exists to hide).
    Bucketized specs read the dense plane only; crossed specs consume
    their component columns; a column that is sequence-shaped for ANY
    spec reports the wide shape (requests must send the widest form)."""

    out: Dict[str, Tuple[str, Optional[int]]] = {}
    for name, spec in model.table_specs.items():
        wide = (spec.sequence or getattr(spec, "multivalent", False))
        if not getattr(spec, "bucket_boundaries", ()):
            cols = (list(spec.cross) if getattr(spec, "cross", ())
                    else [spec.feature or name])
            shared = set(spec.shared_features)
            for c in cols + list(shared):
                # a SHARED feature of a spec declaring seq_len > 1 is
                # sequence-shaped by declaration (DIN's hist_item pattern
                # — the spec's seq_len exists to size it); previously only
                # the 'hist' name prefix triggered this, so a shared
                # behavior column with any other name was mistyped scalar
                # on the wire (round-5 review).  The PRIMARY column stays
                # scalar unless sequence/multivalent say otherwise (DIN's
                # target 'item' is scalar at seq_len=30).
                is_wide = (wide or c.startswith("hist")
                           or (c in shared and spec.seq_len > 1))
                seq = spec.seq_len if is_wide else None
                cur = out.get(c)
                if cur is None or (cur[1] is None and seq is not None):
                    out[c] = ("int", seq)
        w = getattr(spec, "weight_feature", None)
        if w is not None:
            out[w] = ("float", spec.seq_len if wide else None)
    return out


class Processor:
    def __init__(self, model, config: Optional[Dict] = None,
                 table_templates: Optional[Dict] = None):
        if isinstance(model, str):
            model = get_model(model)
        self.model = model
        self.config = {**DEFAULT_CONFIG, **(config or {})}
        fst = self.config["feature_store_type"]
        if fst in ("redis", "cluster_redis"):
            from deeprec_tpu.serve.feature_store import RedisFeatureStore

            self._fstore = RedisFeatureStore(
                url=self.config["feature_store_url"],
                cluster=(fst == "cluster_redis"))
        elif fst == "memory":
            self._fstore = None
        else:
            raise ValueError(
                f"unknown feature_store_type {fst!r} "
                "(memory | redis | cluster_redis)")
        self._trainer = Trainer(
            model=model,
            tables=table_templates or base.make_tables(model),
            sparse_optimizer=sparse_opt.sgd(0.0),
            dense_tx=optax.set_to_zero(),
        )
        self._state = None
        self._state_lock = threading.Lock()
        self._loaded_version: Optional[str] = None
        self._applied_deltas: set = set()
        self._stop = threading.Event()
        self._poller: Optional[threading.Thread] = None
        self._sessions: List[threading.Thread] = []
        # "shared": one queue, all lanes drain it (least-loaded).
        # "round_robin": one queue per lane, process() deals in turn.
        self._policy = self.config["select_session_policy"]
        n_lanes = int(self.config["session_num"])
        if self._policy == "round_robin":
            self._lane_queues = [queue.Queue() for _ in range(n_lanes)]
        else:
            self._lane_queues = [queue.Queue()] * n_lanes
        self._rr = itertools.count()  # GIL-atomic next(): thread-safe RR
        self._tiers = None

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def from_saved(cls, model_dir: str, model=None,
                   config: Optional[Dict] = None) -> "Processor":
        """Build a Processor from the checkpoint artifact alone.

        Reads model_meta.json (written by save_checkpoint) for the registry
        model name and the exact table schema — the reference's
        SavedModel+config self-description (model_config.cc); ``model``
        overrides for models not in the registry."""

        path = saver.latest_checkpoint(model_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}")
        meta = saver.load_model_meta(path)
        if model is None:
            if meta is None or not meta.get("model_name"):
                raise ValueError(
                    f"{path} has no model_meta.json model_name — pass "
                    "model= explicitly (train-side: save_checkpoint/"
                    "CheckpointSaverHook model_name=...)")
            model = get_model(meta["model_name"])
        templates = None
        if meta is not None:
            templates = {
                name: saver.build_template_table(name, tmeta)
                for name, tmeta in meta["tables"].items()
            }
        proc = cls(model, config=config, table_templates=templates)
        proc.initialize(model_dir)
        return proc

    def initialize(self, model_dir: str) -> None:
        """Load the latest full checkpoint + any newer deltas; start the
        version poller and the session workers."""

        self.model_dir = model_dir
        path = saver.latest_checkpoint(model_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}")
        self._load_full(path)
        self._apply_new_deltas()
        if self.config["warmup"]:
            self._warmup()
        if self.config["warmup_file_name"]:
            self._warmup_from_file(self.config["warmup_file_name"])
        self._poller = threading.Thread(target=self._poll_loop, daemon=True)
        self._poller.start()
        for i in range(int(self.config["session_num"])):
            t = threading.Thread(target=self._session_loop, args=(i,),
                                 daemon=True)
            t.start()
            self._sessions.append(t)

    def shutdown(self):
        self._stop.set()
        # Drain queued-but-unserved requests with a clear error: a caller
        # blocked in out.get() must never hang forever because its request
        # was abandoned mid-queue (round-4 review).
        for q in getattr(self, "_lane_queues", ()):
            while True:
                try:
                    _req, out = q.get_nowait()
                except queue.Empty:
                    break
                try:
                    out.put_nowait(RuntimeError("processor shut down"))
                except queue.Full:
                    pass

    def get_serving_model_info(self) -> Dict:
        with self._state_lock:   # the poller mutates these during ingest
            version = self._loaded_version
            deltas = sorted(self._applied_deltas)
        return {
            "model": self.model.name,
            "version": version,
            "deltas_applied": deltas,
            "session_num": self.config["session_num"],
            "select_session_policy": self._policy,
            "ev_storage": bool(self._tiers),
            # recorded for config parity; scheduling is XLA's on TPU
            "cpusets": self.config["cpusets"],
            "omp_num_threads": self.config["omp_num_threads"],
            "serialize_protocol": self.config["serialize_protocol"],
        }

    # -- model updates ------------------------------------------------------

    def _load_full(self, path: str) -> None:
        template = self._trainer.init_state(jax.random.PRNGKey(0))
        tiers = None
        ev_cfg = self.config["ev_storage"]
        if ev_cfg is not None:
            # Bounded-HBM serving (the reference's ev_storage config keys):
            # cold rows live in the host KV and are read through per request.
            from deeprec_tpu.embedding.tiered import TieredTable

            tiers = {
                name: TieredTable(
                    t,
                    ssd_path=ev_cfg.get("ssd_path"),
                    max_dram_rows=int(ev_cfg.get("dram_rows", -1)),
                    hot_watermark=float(ev_cfg.get("hot_watermark", 0.85)),
                )
                for name, t in template.tables.items()
            }
        table_shards = None
        if self.config["shard_embedding"]:
            i = int(self.config["shard_instance_index"])
            n = int(self.config["shard_instance_count"])
            names = (self.config["embedding_names"]
                     or list(template.tables))
            table_shards = {t: (i, n) for t in names}
        self._table_shards = table_shards
        state = saver.restore_checkpoint(path, template, tiers=tiers,
                                         table_shards=table_shards)
        with self._state_lock:
            self._state = state
            self._tiers = tiers
            self._trainer.tiers = tiers
            self._loaded_version = os.path.basename(path)
            self._applied_deltas.clear()

    def _apply_new_deltas(self) -> int:
        """Ingest incr_<step> dirs newer than the loaded full version."""

        if self._state is None:
            return 0

        def incr_step(s):
            # Tolerate non-integer suffixes: MirroredModelStore stages
            # copies as "incr_N.tmp" in this very directory, and a crashed
            # copy can leave one behind permanently — int("N.tmp") used to
            # raise here, killing initialize or silently stopping the
            # poller's delta ingest forever (round-5 review).
            if not s.startswith("incr_"):
                return None
            try:
                return int(s.split("_", 1)[1])
            except ValueError:
                return None

        base_step = int(self._loaded_version.split("_")[1])
        applied = 0
        for d in sorted(os.listdir(self.model_dir),
                        key=lambda s: (incr_step(s) is None,
                                       incr_step(s) or -1)):
            step = incr_step(d)
            if step is None:
                continue
            if step <= base_step or d in self._applied_deltas:
                continue
            full = os.path.join(self.model_dir, d)
            if not os.path.exists(os.path.join(full, "DONE")):
                continue
            with open(os.path.join(full, "meta.json")) as f:
                meta = json.load(f)
            with self._state_lock:
                tables = dict(self._state.tables)
                for name, fname in meta["tables"].items():
                    si, ns = (getattr(self, "_table_shards", None)
                              or {}).get(name, (0, 1))
                    tables[name] = saver.apply_table_delta(
                        tables[name], os.path.join(full, fname),
                        shard_index=si, num_shards=ns)
                self._state = self._state.replace(tables=tables)
                self._applied_deltas.add(d)
            applied += 1
        return applied

    def _poll_loop(self):
        while not self._stop.is_set():
            time.sleep(float(self.config["version_poll_secs"]))
            try:
                latest = saver.latest_checkpoint(self.model_dir)
                if latest and os.path.basename(latest) != self._loaded_version:
                    self._load_full(latest)          # FullModelUpdate
                self._apply_new_deltas()             # DeltaModelUpdate
            except Exception:
                pass  # poller must never die; next tick retries

    # -- inference ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.config["bucket_sizes"]:
            if n <= b:
                return b
        return int(np.ceil(n / self.config["bucket_sizes"][-1])
                   * self.config["bucket_sizes"][-1])

    def _pad(self, req: Dict, b: int) -> Dict:
        n = len(req["dense"])
        pad = b - n

        def p(x):
            x = np.asarray(x)
            if pad == 0:
                return x
            return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])

        out = {"dense": p(req["dense"]),
               "cat": {k: p(v) for k, v in req["cat"].items()}}
        out["label"] = np.zeros((b,), np.float32)
        if self.model.tasks:
            out["labels"] = {t: np.zeros((b,), np.float32)
                             for t in self.model.tasks}
        return out

    def lookup_rows(self, table: str, keys: np.ndarray):
        """(rows [N, D], found [N]) for composed physical-table keys this
        instance holds — the peer-lookup surface of cross-instance sharded
        serving (the FeatureStore-lookup rewrite, graph_optimizer.h:163)."""

        from deeprec_tpu.embedding import table as ev

        with self._state_lock:
            t = self._state.tables[table]
        ids = jnp.asarray(keys, t.key_dtype)
        rows = np.asarray(ev.lookup(t, ids))
        found = np.asarray(ev.contains(t, ids))
        return rows, found

    def predict(self, request: Dict,
                remote_rows: Optional[Dict] = None) -> np.ndarray:
        """Synchronous scoring: [N] probabilities of the primary task.

        ``remote_rows`` ({physical table: (keys, rows)}) transiently upserts
        rows fetched from peer shard instances before the forward pass —
        the live tables are NOT modified (read-through, like tiered eval)."""

        n = len(request["dense"])
        if n == 0:
            return np.zeros((0,), np.float32)
        b = self._bucket(n)
        batch = self._pad(request, b)
        with self._state_lock:
            state = self._state
        if self._fstore is not None:
            remote_rows = self._merge_store_rows(state, request, remote_rows)
        if remote_rows:
            tables = dict(state.tables)
            for pname, (keys, rows) in remote_rows.items():
                if len(keys) == 0:
                    continue
                tables[pname] = saver.upsert_table_rows(
                    tables[pname], {"keys": np.asarray(keys),
                                    "values": np.asarray(rows)})
            state = state.replace(tables=tables)
        logits, _ = self._trainer.eval_step(state, batch)
        return np.asarray(jax.nn.sigmoid(
            jnp.asarray(logits, jnp.float32)))[:n]

    def _merge_store_rows(self, state, request: Dict,
                          remote_rows: Optional[Dict]) -> Dict:
        """Fetch this request's locally-MISSING ids from the shared feature
        store (feature_store_type=redis/cluster_redis) and merge them into
        ``remote_rows`` — the multi-instance shared-parameter serving mode
        (redis_feature_store.cc): instances hold hot rows locally and read
        the long tail through Redis."""

        from deeprec_tpu.embedding import table as ev
        from deeprec_tpu.train.loop import host_group_keys

        trainer = self._trainer
        any_t = next(iter(state.tables.values()))
        empty = int(np.iinfo(np.dtype(any_t.key_dtype.name)).min)
        gk = host_group_keys(self.model, trainer.plan, request, empty)
        merged = dict(remote_rows or {})
        for pname, keys in gk.items():
            t = state.tables[pname]
            uids = np.unique(np.asarray(keys)[np.asarray(keys) != empty])
            if len(uids) == 0:
                continue
            have = np.asarray(jax.device_get(
                ev.contains(t, jnp.asarray(uids, t.key_dtype))))
            need = uids[~have]
            if len(need) == 0:
                continue
            rows, found = self._fstore.lookup(pname, need, t.dim)
            if not found.any():
                continue
            add_k, add_r = need[found], rows[found]
            if pname in merged and len(merged[pname][0]):
                pk, pr = merged[pname]
                add_k = np.concatenate([np.asarray(pk), add_k])
                add_r = np.concatenate([np.asarray(pr), add_r])
            merged[pname] = (add_k, add_r)
        return merged

    def _warmup(self):
        for b in self.config["bucket_sizes"]:
            fake = {
                "dense": np.zeros((b, self.model.dense_dim), np.float32),
                "cat": {},
            }
            for c, (kind, seq) in request_schema(self.model).items():
                shape = (b, seq) if seq else (b,)
                fake["cat"][c] = (np.ones(shape, np.float32)
                                  if kind == "float"
                                  else np.zeros(shape, np.int32))
            self.predict(fake)

    def _warmup_from_file(self, path: str) -> None:
        """Replay recorded requests (warmup_file_name): JSONL of
        {"dense": [[...]], "cat": {col: [...]}}."""

        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                req = json.loads(line)
                self.predict({
                    "dense": np.asarray(req["dense"], np.float32),
                    "cat": {k: cast_cat(v) for k, v in req["cat"].items()},
                })

    # -- async session-group API -------------------------------------------

    def process(self, request: Dict) -> "queue.Queue":
        """Enqueue a request; returns a single-item result queue (the C API's
        async process()).  Lane choice follows select_session_policy."""

        out: "queue.Queue" = queue.Queue(maxsize=1)
        if self._stop.is_set():
            out.put(RuntimeError("processor shut down"))
            return out
        if self._policy == "round_robin":
            lane = next(self._rr) % len(self._lane_queues)
        else:
            lane = 0  # shared queue: all lanes drain the same one
        self._lane_queues[lane].put((request, out))
        if self._stop.is_set():
            # shutdown raced the enqueue: the drain may already have run
            # and no session thread will ever read this lane again — empty
            # it ourselves so no caller blocks forever on out.get()
            # (round-5 review).
            try:
                while True:
                    _, out2 = self._lane_queues[lane].get_nowait()
                    try:
                        out2.put_nowait(RuntimeError("processor shut down"))
                    except queue.Full:
                        pass
            except queue.Empty:
                pass
        return out

    def _session_loop(self, lane: int):
        q = self._lane_queues[lane]
        while not self._stop.is_set():
            try:
                req, out = q.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                out.put(self.predict(req))
            except Exception as e:
                out.put(e)
