"""BASELINE config 1: WDL on Criteo-format data, single host.

Real Criteo-Kaggle files: ``--data tsv:/path/train.txt`` (see
examples/common.py; modelzoo/wide_and_deep equivalent run).
"""

import jax
import optax

from deeprec_tpu.data.prefetch import smart_stage
try:
    from examples.common import make_data, make_eval_data
except ImportError:  # run as a script
    from common import make_data, make_eval_data
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.hooks import LoggingHook
from deeprec_tpu.train.loop import Trainer


def main(steps=500, batch_size=2048):
    model = get_model("wdl")
    trainer = Trainer(
        model=model,
        tables=base.make_tables(model, capacity=2 ** 21),
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        bf16=True,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = smart_stage(make_data(batch_size))
    state = trainer.fit(state, data, steps=steps, log_every=0,
                        hooks=[LoggingHook(100, batch_size=batch_size)])
    print(trainer.evaluate(state, make_eval_data(batch_size), 10))


if __name__ == "__main__":
    main()
