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
