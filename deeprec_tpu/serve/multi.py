"""Multi-model serving: several Processors behind one frontend.

The reference's Processor hosts multiple models from one config
(model_config.cc multi-model entries, each with its own model_dir/session
settings); ModelManager is that registry — construct from a config dict,
route by model name, share nothing between models.

Config shape (JSON-compatible):

    {"models": [
        {"name": "ctr", "model_dir": "/ckpts/ctr", "session_num": 2},
        {"name": "cvr", "model_dir": "/ckpts/cvr", "model": "dlrm"},
     ]}

``model`` names a registry architecture; omitted, the checkpoint's
model_meta.json self-description is used (Processor.from_saved).
"""

from __future__ import annotations

import itertools

from typing import Dict, Optional

from deeprec_tpu.serve.processor import Processor


class ModelManager:
    def __init__(self):
        self._models: Dict[str, Processor] = {}

    @classmethod
    def from_config(cls, config: Dict) -> "ModelManager":
        mgr = cls()
        for entry in config["models"]:
            entry = dict(entry)
            name = entry.pop("name")
            model_dir = entry.pop("model_dir")
            model = entry.pop("model", None)
            store = entry.pop("store", None)
            if store is not None:
                store.start()
                model_dir = store.local_dir
            proc = Processor.from_saved(model_dir, model=model,
                                        config=entry or None)
            mgr.add(name, proc)
        return mgr

    def add(self, name: str, processor: Processor) -> None:
        self._models[name] = processor

    def get(self, name: str) -> Processor:
        if name not in self._models:
            raise KeyError(
                f"unknown model {name!r}; serving: {sorted(self._models)}")
        return self._models[name]

    def names(self):
        return sorted(self._models)

    def info(self) -> Dict:
        return {n: p.get_serving_model_info()
                for n, p in self._models.items()}

    def shutdown(self):
        for p in self._models.values():
            p.shutdown()


class ShardedServingGroup:
    """Cross-instance embedding sharding: N Processor instances each hold
    1/N of the embedding tables (logical-partition slices — the same
    ``shard_of`` routing training uses), and every request's lookups are
    routed to their owners before one instance runs the dense graph.

    The reference shards big EVs across serving instances with
    ``shard_embedding`` + ``embedding_names`` + ``shard_instance_count``
    (serving/processor/framework/graph_optimizer.h:132-147, rewriting EV
    ops into remote FeatureStore lookups); here the peer-lookup surface is
    ``Processor.lookup_rows`` and the fetched rows are injected
    transiently into the serving instance's tables (bit-identical scores
    to an unsharded Processor — test_serving covers it).
    """

    def __init__(self, model_dir: str, num_instances: int, model=None,
                 config: Optional[Dict] = None):
        cfg = dict(config or {})
        cfg["shard_embedding"] = True
        cfg["shard_instance_count"] = num_instances
        self.num_instances = num_instances
        self.procs = [
            Processor.from_saved(
                model_dir, model=model,
                config={**cfg, "shard_instance_index": i})
            for i in range(num_instances)
        ]
        self._rr = itertools.count()  # GIL-atomic next(): thread-safe RR

    def predict(self, request) -> "np.ndarray":
        import numpy as np

        from deeprec_tpu.parallel.tiers import shard_of_np
        from deeprec_tpu.train.loop import host_group_keys

        proc = self.procs[next(self._rr) % self.num_instances]
        trainer = proc._trainer
        # compose this request's physical keys exactly like the lookup will
        any_t = next(iter(trainer.tables.values()))
        empty = int(np.iinfo(np.dtype(any_t.key_dtype.name)).min)
        gk = host_group_keys(proc.model, trainer.plan, request, empty)
        remote = {}
        my = int(proc.config["shard_instance_index"])
        for pname, keys in gk.items():
            uids = np.unique(keys[keys != empty])
            if len(uids) == 0:
                continue
            owner = shard_of_np(
                uids.astype(np.dtype(any_t.key_dtype.name)),
                self.num_instances)
            got_keys, got_rows = [], []
            for s in range(self.num_instances):
                if s == my:
                    continue  # locally-owned ids resolve natively
                need = uids[owner == s]
                if len(need) == 0:
                    continue
                rows, found = self.procs[s].lookup_rows(pname, need)
                got_keys.append(need[found])
                got_rows.append(rows[found])
            if got_keys:
                remote[pname] = (np.concatenate(got_keys),
                                 np.concatenate(got_rows))
        return proc.predict(request, remote_rows=remote)

    def get_serving_model_info(self):
        return {"shard_instance_count": self.num_instances,
                "instances": [p.get_serving_model_info()
                              for p in self.procs]}

    def shutdown(self):
        for p in self.procs:
            p.shutdown()
