"""BASELINE config 2: DeepFM with full dynamic-EmbeddingVariable semantics —
counter-filter admission, TTL eviction, freq/version tracking, incremental
checkpoints (modelzoo/features/embedding_variable/deepfm equivalent)."""

import jax
import optax

from deeprec_tpu import config as cfg
try:
    from examples.common import make_data
except ImportError:  # run as a script
    from common import make_data
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.hooks import CheckpointSaverHook, LoggingHook
from deeprec_tpu.train.loop import Trainer


def main(steps=500, ckpt_dir="/tmp/deepfm_ckpt"):
    model = get_model("deepfm")
    option = cfg.EmbeddingVariableOption(
        counter_filter=cfg.CounterFilterOption(filter_freq=2),
        global_step_evict=cfg.GlobalStepEvictOption(steps_to_live=100_000),
        record_touched=True,
    )
    trainer = Trainer(
        model=model,
        tables=base.make_tables(model, option=option, capacity=2 ** 21),
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    hooks = [
        LoggingHook(100, batch_size=2048),
        CheckpointSaverHook(ckpt_dir, save_steps=200,
                            incremental_save_secs=10.0),
    ]
    state = trainer.fit(state, make_data(2048),
                        steps=steps, log_every=0, hooks=hooks)


if __name__ == "__main__":
    main()
