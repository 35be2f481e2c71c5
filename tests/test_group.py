"""Group-embedding planning, incl. mixed-dim groups (round 3).

Reference: ``tf.nn.group_embedding_lookup_sparse`` batches N lookups of
arbitrary per-table dims into one kernel launch
(python/ops/group_embedding_lookup_ops.py, core/kernels/group_embedding/).
Here a group compiles to one lookup subgraph per DISTINCT dim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprec_tpu.data.synthetic import SyntheticCriteo
from deeprec_tpu.embedding import group as grp
from deeprec_tpu.models import base, nn
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train.loop import Trainer


def test_plan_groups_uniform_dim_single_physical():
    specs = {f"C{i}": base.TableSpec(name=f"C{i}", dim=8, group="g",
                                     initial_capacity=1024)
             for i in range(4)}
    plan = grp.plan_groups(specs)
    assert list(plan.physical) == ["__group_g"]
    assert len(plan.physical["__group_g"].members) == 4


def test_plan_groups_mixed_dims_partitions_by_dim():
    """8/16/32-dim tables in one group -> 3 physical tables (compile units),
    not 6; members keep stable per-physical feature indices."""

    dims = [8, 8, 16, 16, 32, 8]
    specs = {f"C{i}": base.TableSpec(name=f"C{i}", dim=d, group="g",
                                     initial_capacity=1024)
             for i, d in enumerate(dims)}
    plan = grp.plan_groups(specs)
    assert sorted(plan.physical) == [
        "__group_g_d16", "__group_g_d32", "__group_g_d8"]
    assert [n for n, _ in plan.physical["__group_g_d8"].members] == \
        ["C0", "C1", "C5"]
    assert [n for n, _ in plan.physical["__group_g_d16"].members] == \
        ["C2", "C3"]
    # feature indices are per-physical-table (key composition space)
    assert [i for _, i in plan.physical["__group_g_d8"].members] == [0, 1, 2]
    # logical map routes every spec to its dim bucket
    assert plan.logical["C4"] == ("__group_g_d32", 0)
    # capacity is the pow2-rounded union of the bucket's members
    assert plan.physical["__group_g_d8"].initial_capacity == 4096


def test_mixed_dim_group_trains():
    """A model mixing 8/16-dim grouped tables compiles to 2 lookup
    subgraphs and learns the planted signal."""

    dims = {"C1": 8, "C2": 8, "C3": 16, "C4": 16}
    specs = {c: base.TableSpec(name=c, dim=d, group="g",
                               initial_capacity=2 ** 10)
             for c, d in dims.items()}
    cols = list(specs)

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 13 + sum(dims.values()), [32, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([batch["dense"]] + [acts[c] for c in cols],
                            axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    model = base.RecModel(name="mixed_group", table_specs=specs,
                          init_params=init_params, forward=forward)
    tables = base.make_tables(model)
    assert sorted(tables) == ["__group_g_d16", "__group_g_d8"]

    tr = Trainer(model=model, tables=tables,
                 sparse_optimizer=sparse.adagrad(lr=0.05),
                 dense_tx=optax.adagrad(0.05))
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=512, num_ids_per_col=500, seed=1)
    it = iter(gen)
    losses = []
    for _ in range(60):
        state, m = tr.train_step(state, next(it))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05, f"{losses[:2]} -> {losses[-2:]}"
    # both dim buckets actually hold keys
    assert int(state.tables["__group_g_d8"].size) > 0
    assert int(state.tables["__group_g_d16"].size) > 0


def test_mixed_dim_group_sharded():
    """Same model on the 8-device mesh (DistributedTrainer handles grouped
    lookups per physical table — one all_to_all pair per dim bucket)."""

    from jax.sharding import Mesh

    from deeprec_tpu.parallel.trainer import DistributedTrainer

    dims = {"C1": 8, "C2": 16}
    specs = {c: base.TableSpec(name=c, dim=d, group="g",
                               initial_capacity=2 ** 10)
             for c, d in dims.items()}
    cols = list(specs)

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 13 + sum(dims.values()), [32, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate([batch["dense"]] + [acts[c] for c in cols],
                            axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    model = base.RecModel(name="mixed_group_sh", table_specs=specs,
                          init_params=init_params, forward=forward)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    tr = DistributedTrainer(model=model, mesh=mesh,
                            sparse_optimizer=sparse.adagrad(lr=0.05),
                            dense_tx=optax.adagrad(0.05),
                            per_shard_capacity=2 ** 10)
    state = tr.init_state(jax.random.PRNGKey(0))
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=500, seed=2)
    it = iter(gen)
    losses = []
    for _ in range(40):
        state, m = tr.train_step(state, next(it))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05
