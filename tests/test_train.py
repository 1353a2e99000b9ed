"""Training runtime tests: schedules, freeze masks, sharded train step on the
8-device virtual mesh, curriculum callback, gradient accumulation."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from markushgrapher_tpu.config import (
    MarkushGrapherConfig,
    SwinConfig,
    TrainConfig,
    VTLConfig,
)
from markushgrapher_tpu.models.markushgrapher import MarkushGrapherModel
from markushgrapher_tpu.parallel import mesh as mesh_lib
from markushgrapher_tpu.train.optim import (
    freeze_mask,
    inverse_sqrt_schedule,
    linear_with_fact_schedule,
)
from markushgrapher_tpu.train.trainer import CurriculumCallback, Trainer


class TestSchedules:
    def test_inverse_sqrt(self):
        s = inverse_sqrt_schedule(1e-3, 100)
        assert float(s(50)) == pytest.approx(5e-4)
        assert float(s(100)) == pytest.approx(1e-3)
        assert float(s(400)) == pytest.approx(5e-4)  # 1e-3 * sqrt(100/400)

    def test_linear_with_fact(self):
        s = linear_with_fact_schedule(1e-3, 10, 110, fact=0.5)
        assert float(s(5)) == pytest.approx(0.5 * 1e-3 * 0.5)
        assert float(s(10)) == pytest.approx(0.5 * 1e-3)
        assert float(s(110)) == pytest.approx(0.0)


class TestFreezeMask:
    def test_prefix_matching(self):
        params = {"params": {
            "molscribe_encoder": {"w": np.zeros(2)},
            "molscribe_projector": {"fc1": {"kernel": np.zeros(2)}},
            "decoder": {"layer_0": {"w": np.zeros(2)}},
            "lm_head": {"kernel": np.zeros(2)},
        }}
        mask = freeze_mask(params, [("molscribe_encoder",), ("decoder",)])
        assert mask["params"]["molscribe_encoder"]["w"] == "frozen"
        assert mask["params"]["decoder"]["layer_0"]["w"] == "frozen"
        assert mask["params"]["lm_head"]["kernel"] == "train"
        assert mask["params"]["molscribe_projector"]["fc1"]["kernel"] == "train"


def tiny_setup(grad_accum=1, frozen=()):
    cfg = MarkushGrapherConfig(
        vtl=VTLConfig(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=1,
                      num_decoder_layers=1, num_heads=2, image_size=32,
                      patch_size=16, dropout_rate=0.0),
        swin=SwinConfig(image_size=16, patch_size=2, embed_dim=8, depths=(1,),
                        num_heads=(2,), window_size=4),
        max_seq_length=8, max_seq_length_decoder=8, projector_hidden=8)
    tcfg = TrainConfig(gradient_accumulation_steps=grad_accum, warmup_steps=2,
                       max_steps=10)
    mesh = mesh_lib.create_mesh(data=4, model=2)
    model = MarkushGrapherModel(cfg, dtype=jnp.float32)
    trainer = Trainer(model=model, cfg=tcfg, mesh=mesh,
                      frozen_prefixes=frozen)
    rng = np.random.RandomState(0)
    batch = dict(
        input_ids=rng.randint(3, 60, size=(4, 8)).astype(np.int32),
        bbox=rng.rand(4, 8, 4).astype(np.float32),
        attention_mask=np.ones((4, 8), np.int32),
        labels=rng.randint(3, 60, size=(4, 8)).astype(np.int32),
        pixel_values=rng.rand(4, 32, 32, 3).astype(np.float32),
        ocsr_pixel_values=rng.rand(4, 16, 16, 3).astype(np.float32))
    return trainer, batch


class TestTrainStep:
    def test_sharded_step_reduces_loss(self):
        trainer, batch = tiny_setup()
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            losses = []
            for _ in range(4):
                state, m = trainer.train_step(state, batch, rng)
                losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # same batch -> loss must drop

    def test_frozen_params_stay_fixed(self):
        trainer, batch = tiny_setup(frozen=(("molscribe_encoder",),))
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            before = jax.tree.map(
                lambda x: np.array(x, copy=True),
                mesh_lib.unbox(state.params["params"]["molscribe_encoder"]))
            for _ in range(2):
                state, _ = trainer.train_step(state, batch, rng)
            after = jax.tree.map(
                lambda x: np.array(x, copy=True),
                mesh_lib.unbox(state.params["params"]["molscribe_encoder"]))
        for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(b, a)

    def test_grad_accumulation_updates_every_n(self):
        trainer, batch = tiny_setup(grad_accum=2)
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            p0 = np.array(mesh_lib.unbox(state.params["params"]["lm_head"]["kernel"]), copy=True)
            state, _ = trainer.train_step(state, batch, rng)
            p1 = np.array(mesh_lib.unbox(state.params["params"]["lm_head"]["kernel"]), copy=True)
            state, _ = trainer.train_step(state, batch, rng)
            p2 = np.array(mesh_lib.unbox(state.params["params"]["lm_head"]["kernel"]), copy=True)
        np.testing.assert_array_equal(p0, p1)  # no update mid-accumulation
        assert np.abs(p2 - p1).max() > 0      # update after N micro-steps


class TestCurriculum:
    def test_levels_raise_on_plateau(self):
        cb = CurriculumCallback(TrainConfig(curriculum=True,
                                            curriculum_patience=2))
        assert cb.update(1.0) == 0
        assert cb.update(0.9) == 0
        assert cb.update(0.95) == 0   # bad 1
        assert cb.update(0.95) == 1   # bad 2 -> level up
        assert cb.update(2.0) == 1    # counter reset


class TestOptStateSharding:
    """ZeRO-style optimizer-state sharding (parallel/mesh.py
    opt_state_shardings): moments follow param specs; big replicated
    moments shard over the data axis."""

    def _shard_tree(self, trainer, batch, zero_min_size):
        from flax import linen as nn

        rng = jax.random.PRNGKey(0)

        def init(r):
            return trainer.model.init(r, **{k: jnp.asarray(v) for k, v in batch.items()})

        abstract = jax.eval_shape(init, rng)
        logical = nn.get_partition_spec(abstract)
        p_shard = mesh_lib.logical_to_mesh_sharding(logical, trainer.mesh)
        params = jax.jit(init, out_shardings=p_shard)(rng)
        from markushgrapher_tpu.train.optim import make_optimizer
        tx = make_optimizer(trainer.cfg)
        opt_shard = mesh_lib.opt_state_shardings(
            tx, params, p_shard, trainer.mesh, zero_min_size=zero_min_size)
        return tx, params, p_shard, opt_shard

    def test_moments_follow_param_specs(self):
        trainer, batch = tiny_setup()
        with trainer.mesh:
            tx, params, p_shard, opt_shard = self._shard_tree(trainer, batch, 1 << 30)
        # adam state: chain(clip, adamw) -> opt_shard[1][0] is ScaleByAdamState
        adam = opt_shard[1][0]
        wi = adam.mu["params"]["encoder"]["layer_0"]["ff"]["wi"]
        wi_param_shard = p_shard["params"]["encoder"]["layer_0"]["ff"]["wi"]
        assert mesh_lib.unbox(wi)["kernel"].spec == mesh_lib.unbox(wi_param_shard)["kernel"].spec
        # scalar count is replicated
        assert adam.count.spec == jax.sharding.PartitionSpec()

    def test_big_replicated_moments_zero_shard(self):
        trainer, batch = tiny_setup()
        with trainer.mesh:
            tx, params, p_shard, opt_shard = self._shard_tree(trainer, batch, 64)
        adam = opt_shard[1][0]
        emb = mesh_lib.unbox(adam.mu["params"]["shared_embedding"])
        # shared_embedding [64, 16] is replicated as a param; its moment must
        # pick up a 'data' dim with the tiny threshold
        assert "data" in jax.tree_util.tree_leaves(
            [list(emb.spec)])  # flattened spec contains 'data'
        # init under jit with these shardings must succeed
        opt_state = jax.jit(tx.init, out_shardings=opt_shard)(params)
        got = mesh_lib.unbox(opt_state[1][0].mu["params"]["shared_embedding"])
        assert "data" in tuple(got.sharding.spec)

    def test_train_step_with_zero_sharding(self, monkeypatch):
        monkeypatch.setattr(mesh_lib, "_ZERO_MIN_SIZE", 64)
        trainer, batch = tiny_setup()
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            emb_mu = mesh_lib.unbox(state.opt_state[1][0].mu["params"]["shared_embedding"])
            assert "data" in tuple(emb_mu.sharding.spec)
            losses = []
            for _ in range(3):
                state, m = trainer.train_step(state, batch, rng)
                losses.append(float(m["loss"]))
            # sharding must be stable across donated steps
            emb_mu2 = mesh_lib.unbox(state.opt_state[1][0].mu["params"]["shared_embedding"])
            assert emb_mu2.sharding == emb_mu.sharding
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]


class TestLossFct:
    def test_huber_loss_fct_trains(self):
        """The loss_fct knob must actually change the optimized objective
        (reference arguments.py:252; previously decorative)."""
        trainer, batch = tiny_setup()
        trainer.cfg = dataclasses.replace(trainer.cfg, loss_fct="huber")
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            losses = []
            for _ in range(3):
                state, m = trainer.train_step(state, batch, rng)
                losses.append(float(m["loss"]))
        # huber-on-p(target) is bounded by delta*(1-p) <= 1; CE would be ~ln V
        assert all(np.isfinite(losses))
        assert losses[0] < 1.5, losses
        assert losses[-1] < losses[0]

    def test_huber2_loss_fct_trains(self):
        """huber2 = the reference's log-threshold variant (losses.py:24-34):
        finite, decreasing, and bounded well below CE's ~ln V."""
        trainer, batch = tiny_setup()
        trainer.cfg = dataclasses.replace(trainer.cfg, loss_fct="huber2")
        rng = jax.random.PRNGKey(0)
        with trainer.mesh:
            state = trainer.init_state(rng, batch)
            losses = []
            for _ in range(3):
                state, m = trainer.train_step(state, batch, rng)
                losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        # err<=1 and delta=1 => per-token <= 1, /5 => <= 0.2
        assert losses[0] <= 0.2 + 1e-6, losses
        assert losses[-1] < losses[0]
