"""BASELINE config 4: DIN sequence-attention ranking on behavior logs
(modelzoo/din equivalent; swap SyntheticBehavior for a TailStream/Kafka
source of real Taobao/Amazon logs)."""

import jax
import optax

from deeprec_tpu.data.behavior import SyntheticBehavior
from deeprec_tpu.models import base, get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer


def main(steps=600):
    model = get_model("din")
    trainer = Trainer(
        model=model,
        tables=base.make_tables(model),
        sparse_optimizer=sparse.adagrad(lr=0.1),
        dense_tx=optax.adam(1e-3),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    gen = SyntheticBehavior(batch_size=512, seed=1)
    state = trainer.fit(state, iter(gen), steps=steps, log_every=100)
    print(trainer.evaluate(state, iter(SyntheticBehavior(batch_size=512,
                                                         seed=9)), 10))


if __name__ == "__main__":
    main()
