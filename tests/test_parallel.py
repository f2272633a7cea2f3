"""Data-parallel mesh tests on the fake 8-device CPU mesh (SURVEY.md §4.4):
same pjit code path as a v5e-8 host — DP train step and sharded batched AR
generation (BASELINE configs 4/5 obligations, §2.2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from shallow_wavenet_tpu.config import MeshConfig
from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models.generate import generate_fast
from shallow_wavenet_tpu.parallel import data_sharding, make_mesh, process_shard
from shallow_wavenet_tpu.training import Trainer

from tests.test_train import make_sampler, tiny_train_cfg

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (fake) devices"
)


def test_make_mesh_spans_devices():
    mesh = make_mesh(MeshConfig())
    assert mesh.size == jax.device_count()
    assert mesh.axis_names == ("data",)
    sub = make_mesh(MeshConfig(num_devices=4))
    assert sub.size == 4


def test_process_shard_single_process():
    assert process_shard([1, 2, 3]) == [1, 2, 3]


def test_dp_train_step_matches_single_device():
    """Same global batch => DP-8 loss == single-device loss (the gradient
    all-reduce is exact, only reduction order differs)."""
    cfg = tiny_train_cfg("laplace")
    cfg.data = dataclasses.replace(cfg.data, batch_size=8)

    sampler = make_sampler(cfg)
    batch = next(sampler)

    tr1 = Trainer(cfg)
    s1 = tr1.init_state()
    _, m1 = tr1.step_fn(s1, tr1.shard_batch(batch))

    mesh = make_mesh(MeshConfig())
    tr8 = Trainer(cfg, mesh)
    s8 = tr8.init_state()
    _, m8 = tr8.step_fn(s8, tr8.shard_batch(batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m8["grad_norm"]),
                               rtol=1e-4)


def test_dp_training_runs_and_decreases(tmp_path):
    cfg = tiny_train_cfg("laplace")
    cfg.data = dataclasses.replace(cfg.data, batch_size=8)
    mesh = make_mesh(MeshConfig())
    tr = Trainer(cfg, mesh)
    state = tr.fit(tr.init_state(), make_sampler(cfg), tmp_path, steps=30)
    import json
    recs = [json.loads(l)
            for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[-1]["loss"] < recs[0]["loss"]
    # params stay replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_batched_generation_matches_unsharded():
    """Batched AR generation sharded over chips (BASELINE config 4): data
    sharding of c_up must not change the samples."""
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(head="laplace")
    m = WaveNet(cfg)
    rng = np.random.default_rng(0)
    B, F = 8, 4
    H = int(np.prod(cfg.upsample_factors))
    x = jnp.asarray(rng.uniform(-1, 1, (B, F * H - 1)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    v = m.init(jax.random.key(0), x, c)
    pp = extract_plain_params(v, cfg)
    c_up = m.apply(v, c, method="upsample_cond")

    key = jax.random.key(5)
    ref = np.asarray(generate_fast(pp, cfg, c_up, key))

    mesh = make_mesh(MeshConfig())
    c_up_sharded = jax.device_put(c_up, data_sharding(mesh))
    out = np.asarray(generate_fast(pp, cfg, c_up_sharded, key))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_shard_map_generation_matches_unsharded():
    """generate_dp (explicit shard_map, one utterance shard per device)
    must equal the single-device scan path sample-for-sample."""
    from tests.test_model import tiny_cfg
    from shallow_wavenet_tpu.models.generate import generate_dp

    cfg = tiny_cfg(head="laplace")
    m = WaveNet(cfg)
    rng = np.random.default_rng(1)
    B, F = 8, 4
    H = int(np.prod(cfg.upsample_factors))
    x = jnp.asarray(rng.uniform(-1, 1, (B, F * H - 1)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    v = m.init(jax.random.key(0), x, c)
    pp = extract_plain_params(v, cfg)
    c_up = m.apply(v, c, method="upsample_cond")
    T = c_up.shape[1]
    noise = jax.random.uniform(jax.random.key(3), (B, T),
                               minval=1e-6, maxval=1 - 1e-6)

    ref = np.asarray(generate_fast(pp, cfg, c_up, jax.random.key(0),
                                   noise=noise))
    mesh = make_mesh(MeshConfig())
    out = np.asarray(generate_dp(pp, cfg, c_up, noise, mesh))
    np.testing.assert_array_equal(out, ref)


def test_dp_grad_accum_matches_plain_dp():
    """train.grad_accum under the 8-device mesh: the in-jit microbatch
    reshape must compose with NamedSharding (each microbatch re-shards
    across the data axis) and reproduce the plain DP step's update."""
    cfg = tiny_train_cfg("laplace")
    cfg.data = dataclasses.replace(cfg.data, batch_size=16)
    cfg_a = tiny_train_cfg("laplace")
    cfg_a.data = dataclasses.replace(cfg_a.data, batch_size=16)
    cfg_a.train = dataclasses.replace(cfg_a.train, grad_accum=2)

    sampler = make_sampler(cfg)
    batch = next(sampler)
    mesh = make_mesh(MeshConfig())
    tr = Trainer(cfg, mesh)
    s = tr.init_state()
    s, m = tr.step_fn(s, tr.shard_batch(batch))
    tra = Trainer(cfg_a, mesh)
    sa = tra.init_state()
    sa, ma = tra.step_fn(sa, tra.shard_batch(batch))
    np.testing.assert_allclose(float(m["loss"]), float(ma["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(sa.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
