"""BASELINE config 1: WDL on Criteo-format data, single host.

Swap ``SyntheticCriteo`` for ``CriteoTSV([...paths], loop=True)`` when real
Criteo-Kaggle files are available (modelzoo/wide_and_deep equivalent run).
"""

import jax
import optax

from deeprec_tpu.data.prefetch import smart_stage
from deeprec_tpu.data.synthetic import SyntheticCriteo
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
    data = smart_stage(SyntheticCriteo(batch_size=batch_size, seed=1))
    state = trainer.fit(state, data, steps=steps, log_every=0,
                        hooks=[LoggingHook(100, batch_size=batch_size)])
    print(trainer.evaluate(
        state, iter(SyntheticCriteo(batch_size=batch_size, seed=99)), 10))


if __name__ == "__main__":
    main()
