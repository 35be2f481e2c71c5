"""deeprec_tpu — TPU-native sparse recommendation engine.

Public API surface (the reference's `tf.*` entry points, re-homed):

  Embedding variables:   deeprec_tpu.embedding.table (create/lookup/...)
  Options:               deeprec_tpu.config (EmbeddingVariableOption tree)
  Sparse optimizers:     deeprec_tpu.optimizers.sparse
  Dense optimizers:      deeprec_tpu.optimizers.dense
  Training:              deeprec_tpu.train.loop.Trainer, train.hooks
  Distributed:           deeprec_tpu.parallel.trainer.DistributedTrainer
  Checkpoints:           deeprec_tpu.train.saver
  Serving:               deeprec_tpu.serve.processor.Processor
  Models:                deeprec_tpu.models.get_model
  Data:                  deeprec_tpu.data (criteo, prefetch, work_queue, ...)
"""

from deeprec_tpu import config
from deeprec_tpu.config import (
    CBFFilterOption,
    Combiner,
    CounterFilterOption,
    EmbeddingVariableOption,
    GlobalStepEvictOption,
    InitializerOption,
    L2WeightEvictOption,
    StorageOption,
    StorageType,
)

__version__ = "0.1.0"
__all__ = [
    "config",
    "CBFFilterOption",
    "Combiner",
    "CounterFilterOption",
    "EmbeddingVariableOption",
    "GlobalStepEvictOption",
    "InitializerOption",
    "L2WeightEvictOption",
    "StorageOption",
    "StorageType",
]
