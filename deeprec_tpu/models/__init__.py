"""Model zoo registry — the 16 reference models (modelzoo/README.md:1-25)
rebuilt TPU-native.

Use ``get_model(name)`` or iterate ``REGISTRY``.
"""

from __future__ import annotations

import importlib
from typing import Dict

_SPECS = {
    # name -> (module, attribute)
    "wdl": ("deeprec_tpu.models.wdl", "MODEL"),
    "dlrm": ("deeprec_tpu.models.dlrm", "MODEL"),
    "dlrm_mlperf": ("deeprec_tpu.models.dlrm", "MLPERF"),
    "deepfm": ("deeprec_tpu.models.deepfm", "MODEL"),
    "dcn": ("deeprec_tpu.models.dcn", "MODEL"),
    "dcnv2": ("deeprec_tpu.models.dcn", "MODEL_V2"),
    "din": ("deeprec_tpu.models.din", "MODEL"),
    "dien": ("deeprec_tpu.models.dien", "MODEL"),
    "bst": ("deeprec_tpu.models.bst", "MODEL"),
    "dssm": ("deeprec_tpu.models.dssm", "MODEL"),
    "masknet": ("deeprec_tpu.models.masknet", "MODEL"),
    "mmoe": ("deeprec_tpu.models.multitask", "MMOE"),
    "esmm": ("deeprec_tpu.models.multitask", "ESMM"),
    "ple": ("deeprec_tpu.models.multitask", "PLE"),
    "dbmtl": ("deeprec_tpu.models.multitask", "DBMTL"),
    "simplemultitask": ("deeprec_tpu.models.multitask", "SIMPLE_MULTITASK"),
}

MODEL_NAMES = tuple(_SPECS)


def get_model(name: str):
    mod, attr = _SPECS[name]
    return getattr(importlib.import_module(mod), attr)
