"""BASELINE config 5: large-scale DLRM with tiered EV storage (HBM budget +
host DRAM + SSD), TTL eviction, incremental checkpoints, and a serving
processor consuming the deltas — the full production loop in one script.

On a pod, combine with examples/03 (DistributedTrainer + multihost).
"""

import os
import tempfile

import jax
import optax

from deeprec_tpu import config as cfg
from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.embedding.tiered import TieredTable
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.serve.processor import Processor
from deeprec_tpu.train.hooks import CheckpointSaverHook
from deeprec_tpu.train.loop import Trainer


def main(steps=300, hbm_rows=2 ** 19):
    work = tempfile.mkdtemp(prefix="deeprec_pod_")
    model = get_model("dlrm")
    option = cfg.EmbeddingVariableOption(
        global_step_evict=cfg.GlobalStepEvictOption(steps_to_live=500_000),
        record_touched=True,
    )
    tiers = {}
    trainer = Trainer(
        model=model,
        tables=base.make_tables(model, option=option, capacity=hbm_rows),
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        tiers=tiers,
        bf16=True,
        # Fail-fast HBM budgeting (round 5): the growth-rebuild peak and
        # any staleness FIFO are checked against this per-device budget
        # BEFORE allocating and raise MemoryBudgetError with remedies —
        # production jobs should always set it (utils/budget.py).
        budget_bytes=12 << 30,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    for n, t in state.tables.items():
        tiers[n] = TieredTable(
            t, ssd_path=os.path.join(work, f"{n}.log"),
            max_dram_rows=hbm_rows, hot_watermark=0.8, evict_fraction=0.25)

    ckpt = os.path.join(work, "ckpt")
    hooks = [CheckpointSaverHook(ckpt, save_steps=100,
                                 incremental_save_secs=5.0)]
    state = trainer.fit(state,
                        iter(SyntheticCriteo(batch_size=2048,
                                             num_ids_per_col=500_000, seed=1)),
                        steps=steps, log_every=100, hooks=hooks)

    # serving: full ckpt + online deltas
    proc = Processor(model, {"session_num": 2, "warmup": False,
                             "version_poll_secs": 1.0})
    proc.initialize(ckpt)
    print("serving:", proc.get_serving_model_info())
    proc.shutdown()


if __name__ == "__main__":
    main()
