"""Performance regression guards (TODO testing-debt 3).

Wall-clock asserts are useless on a noisy shared host, so these guard the
*deterministic* compiler-visible quantities instead: XLA's flops / bytes-
accessed cost model and the buffer-donation accounting of the compiled
train step.  The engine-v2 wins (PERF.md: cond-gated insert machinery, no
per-batch dedup, reused collect gathers, dense-masked apply) all move these
numbers if regressed:

  * re-adding jnp.unique dedup or a second row gather -> bytes jump
  * losing state donation -> alias_size collapses, temp memory doubles
  * un-gating the fresh-row init scatters -> bytes + flops jump

Anchors measured on the CPU backend (same HLO structure as TPU for these
guards); ceilings carry ~35% headroom so legitimate small changes pass.
"""

import jax
import numpy as np
import optax
import pytest

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.models import base, dlrm
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer

BATCH = 512
CAP = 2 ** 14

# anchors (2026-08, engine v2): flops 1.55e9, bytes 1.63e8
FLOPS_CEILING = 2.1e9
BYTES_CEILING = 2.2e8
TEMP_CEILING = 28_000_000  # anchor 13.6 MB


@pytest.fixture(scope="module")
def compiled():
    model = dlrm.MODEL
    tables = base.make_tables(model, capacity=CAP)
    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05), bf16=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=BATCH, num_ids_per_col=5000, seed=1)
    b = jax.device_put(gen.sample(np.random.RandomState(7)))
    comp = tr._train_step.lower(state, b).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca, comp.memory_analysis()


def test_train_step_flops_budget(compiled):
    ca, _ = compiled
    assert ca["flops"] < FLOPS_CEILING, (
        f"train step flops {ca['flops']:.3g} blew the budget "
        f"{FLOPS_CEILING:.3g} — did dedup/insert machinery come back on the "
        "steady-state path? (PERF.md engine v2)")


def test_train_step_bytes_budget(compiled):
    ca, _ = compiled
    assert ca["bytes accessed"] < BYTES_CEILING, (
        f"train step bytes {ca['bytes accessed']:.3g} blew the budget "
        f"{BYTES_CEILING:.3g} — extra table-sized passes on the hot path?")


def test_train_step_donation_intact(compiled):
    """State buffers must be donated through the step: the table arrays
    (capacity-sized) alias input->output instead of being copied."""
    _, mem = compiled
    assert mem.alias_size_in_bytes > 0.9 * mem.output_size_in_bytes, (
        f"donation regressed: alias {mem.alias_size_in_bytes} vs output "
        f"{mem.output_size_in_bytes}")


def test_train_step_temp_memory_budget(compiled):
    _, mem = compiled
    assert mem.temp_size_in_bytes < TEMP_CEILING, (
        f"temp buffers {mem.temp_size_in_bytes} exceed {TEMP_CEILING} — "
        "lost a fusion or materializing the one-hot/dedup intermediates?")
