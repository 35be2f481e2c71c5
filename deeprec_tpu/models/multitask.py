"""Multi-task model family: SimpleMultiTask, MMoE, ESMM, PLE, DBMTL.

All five share the Criteo embedding layout and two tasks (ctr, ctcvr) with
labels from ``batch['labels']`` (the SyntheticMultiTask generator); they
differ in how the shared representation is routed:

  * SimpleMultiTask (modelzoo/simplemultitask): shared bottom MLP + one
    head per task.
  * MMoE (modelzoo/mmoe): N expert MLPs, per-task softmax gates.
  * ESMM (modelzoo/esmm): CTR tower + CVR tower; pCTCVR = pCTR * pCVR
    (the entire-space trick — CVR is supervised only through the product).
  * PLE (modelzoo/ple): task-specific + shared experts, per-task gates over
    [own experts, shared experts] (one extraction layer).
  * DBMTL (modelzoo/dbmtl): shared bottom, ctr head; the cvr head consumes
    the shared repr AND the ctr hidden output (bayesian target chain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.models import base, nn

EMB_DIM = 16
TASKS = ("ctr", "ctcvr")


def _specs():
    return {
        c: base.TableSpec(name=c, dim=EMB_DIM, combiner=cfg.Combiner.MEAN,
                          group="emb")
        for c in base.CATEGORICAL_COLUMNS
    }


def _in_dim():
    return 13 + EMB_DIM * len(base.CATEGORICAL_COLUMNS)


def _input(batch, acts):
    return jnp.concatenate(
        [batch["dense"]] + [acts[c] for c in base.CATEGORICAL_COLUMNS], axis=1)


def _logit_of_product(p1_logit, p2_logit):
    """logit(sigmoid(a) * sigmoid(b)) computed stably in f32."""

    a = p1_logit.astype(jnp.float32)
    b = p2_logit.astype(jnp.float32)
    logp = jax.nn.log_sigmoid(a) + jax.nn.log_sigmoid(b)
    # logit(p) = log(p) - log(1-p);  log(1-p) = log1p(-exp(logp))
    logp = jnp.minimum(logp, -1e-7)
    return logp - jnp.log1p(-jnp.exp(logp))


# -- SimpleMultiTask --------------------------------------------------------

def _smt_init(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "bottom": nn.mlp_init(k1, _in_dim(), [512, 256]),
        "ctr": nn.mlp_init(k2, 256, [64, 1]),
        "ctcvr": nn.mlp_init(k3, 256, [64, 1]),
    }


def _smt_forward(params, batch, acts, train=True):
    h = nn.mlp_apply(params["bottom"], _input(batch, acts),
                     final_activation=jax.nn.relu)
    return {t: nn.mlp_apply(params[t], h)[:, 0] for t in TASKS}


SIMPLE_MULTITASK = base.RecModel(
    name="simplemultitask", table_specs=_specs(),
    init_params=_smt_init, forward=_smt_forward, tasks=TASKS)


# -- MMoE -------------------------------------------------------------------

NUM_EXPERTS = 4
EXPERT = [256, 128]


def _mmoe_init(key):
    ks = jax.random.split(key, NUM_EXPERTS + 2 * len(TASKS))
    experts = [nn.mlp_init(ks[i], _in_dim(), EXPERT) for i in range(NUM_EXPERTS)]
    gates, towers = {}, {}
    for j, t in enumerate(TASKS):
        gates[t] = nn.dense_init(ks[NUM_EXPERTS + 2 * j], _in_dim(), NUM_EXPERTS)
        towers[t] = nn.mlp_init(ks[NUM_EXPERTS + 2 * j + 1], EXPERT[-1], [64, 1])
    return {"experts": experts, "gates": gates, "towers": towers}


def _gated_tower(params, t, x, es):
    """softmax gate (f32 for stability) -> expert mix -> task tower — the
    one mixing block MMoE and PLE share (round-5 review: the duplicate
    copies could silently diverge)."""

    g = jax.nn.softmax(
        nn.dense_apply(params["gates"][t], x).astype(jnp.float32),
        axis=-1).astype(es.dtype)                            # [B, E]
    h = jnp.einsum("be,beh->bh", g, es)
    return nn.mlp_apply(params["towers"][t], h)[:, 0]


def _mmoe_forward(params, batch, acts, train=True):
    x = _input(batch, acts)
    es = jnp.stack([nn.mlp_apply(e, x, final_activation=jax.nn.relu)
                    for e in params["experts"]], axis=1)    # [B, E, H]
    return {t: _gated_tower(params, t, x, es) for t in TASKS}


MMOE = base.RecModel(name="mmoe", table_specs=_specs(),
                     init_params=_mmoe_init, forward=_mmoe_forward, tasks=TASKS)


# -- ESMM -------------------------------------------------------------------

def _esmm_init(key):
    k1, k2 = jax.random.split(key)
    return {
        "ctr": nn.mlp_init(k1, _in_dim(), [256, 64, 1]),
        "cvr": nn.mlp_init(k2, _in_dim(), [256, 64, 1]),
    }


def _esmm_forward(params, batch, acts, train=True):
    x = _input(batch, acts)
    ctr = nn.mlp_apply(params["ctr"], x)[:, 0]
    cvr = nn.mlp_apply(params["cvr"], x)[:, 0]
    return {"ctr": ctr, "ctcvr": _logit_of_product(ctr, cvr)}


ESMM = base.RecModel(name="esmm", table_specs=_specs(),
                     init_params=_esmm_init, forward=_esmm_forward, tasks=TASKS)


# -- PLE (one extraction layer) --------------------------------------------

PLE_SPEC = 2   # specific experts per task
PLE_SHARED = 2


def _ple_init(key):
    n = len(TASKS) * PLE_SPEC + PLE_SHARED
    ks = jax.random.split(key, n + 2 * len(TASKS))
    i = 0
    spec, shared = {}, []
    for t in TASKS:
        spec[t] = [nn.mlp_init(ks[i + j], _in_dim(), EXPERT)
                   for j in range(PLE_SPEC)]
        i += PLE_SPEC
    for j in range(PLE_SHARED):
        shared.append(nn.mlp_init(ks[i + j], _in_dim(), EXPERT))
    i += PLE_SHARED
    gates, towers = {}, {}
    for j, t in enumerate(TASKS):
        gates[t] = nn.dense_init(ks[i + 2 * j], _in_dim(),
                                 PLE_SPEC + PLE_SHARED)
        towers[t] = nn.mlp_init(ks[i + 2 * j + 1], EXPERT[-1], [64, 1])
    return {"spec": spec, "shared": shared, "gates": gates, "towers": towers}


def _ple_forward(params, batch, acts, train=True):
    x = _input(batch, acts)
    shared = [nn.mlp_apply(e, x, final_activation=jax.nn.relu)
              for e in params["shared"]]
    out = {}
    for t in TASKS:
        own = [nn.mlp_apply(e, x, final_activation=jax.nn.relu)
               for e in params["spec"][t]]
        es = jnp.stack(own + shared, axis=1)
        out[t] = _gated_tower(params, t, x, es)
    return out


PLE = base.RecModel(name="ple", table_specs=_specs(),
                    init_params=_ple_init, forward=_ple_forward, tasks=TASKS)


# -- DBMTL ------------------------------------------------------------------

def _dbmtl_init(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "bottom": nn.mlp_init(k1, _in_dim(), [512, 256]),
        "ctr_hidden": nn.mlp_init(k2, 256, [64]),
        "ctr_head": nn.dense_init(k3, 64, 1),
        "cvr": nn.mlp_init(k4, 256 + 64, [64, 1]),
    }


def _dbmtl_forward(params, batch, acts, train=True):
    h = nn.mlp_apply(params["bottom"], _input(batch, acts),
                     final_activation=jax.nn.relu)
    hc = nn.mlp_apply(params["ctr_hidden"], h, final_activation=jax.nn.relu)
    ctr = nn.dense_apply(params["ctr_head"], hc)[:, 0]
    # target chain: cvr sees ctr's hidden state (bayesian factorization)
    ctcvr = nn.mlp_apply(params["cvr"], jnp.concatenate([h, hc], axis=1))[:, 0]
    return {"ctr": ctr, "ctcvr": ctcvr}


DBMTL = base.RecModel(name="dbmtl", table_specs=_specs(),
                      init_params=_dbmtl_init, forward=_dbmtl_forward,
                      tasks=TASKS)
