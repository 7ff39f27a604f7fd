"""Train-step and end-to-end trainer tests on synthetic fixtures.

Covers: optimizer equivalence with torch SGD semantics, EMA warmup,
NaN-guard skip, loss decrease on a supervised-only toy problem, and a
full 3-iteration Trainer run (data -> step -> val -> checkpoint)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dycon_paper_replication_tpu.config import make_config
from dycon_paper_replication_tpu.models import net_factory_3d
from dycon_paper_replication_tpu.train.state import (
    create_train_state,
    ema_update,
    make_optimizer,
)
from dycon_paper_replication_tpu.train.step import StepScalars, build_train_step, unpack_scalars


def _tiny_cfg(**kw):
    base = dict(
        patch_size=(16, 16, 16), batch_size=4, labeled_bs=2, labelnum=2,
        max_iterations=3, val_every=2, save_every=100, feature_scaler=2,
        val_stride_xy=64, val_stride_z=64,
    )
    base.update(kw)
    return make_config("pancreas", **base)


@pytest.fixture(scope="module")
def step_bundle():
    cfg = _tiny_cfg()
    model = net_factory_3d(cfg.model, in_chns=1, class_num=2, scaler=cfg.feature_scaler)
    opt = make_optimizer(lambda s: cfg.base_lr)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(build_train_step(model, opt, cfg))
    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, size=(4, 16, 16, 16)).astype(np.int32)
    batch = {
        "image": jnp.asarray(label[..., None] * 0.5 + 0.1 * rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32),
        "label": jnp.asarray(label),
    }
    return cfg, model, opt, state, step, batch


class TestTrainStep:
    def test_step_runs_and_updates(self, step_bundle):
        cfg, model, opt, state, step, batch = step_bundle
        scalars = StepScalars.make(5.0, 0.01, 1.3, 0.3)
        new_state, m = step(state, batch, jax.random.key(1), scalars)
        assert int(new_state.step) == 1
        assert np.isfinite(unpack_scalars(m)["loss"])
        # params moved
        diff = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), state.params, new_state.params),
        )
        assert diff > 0
        # EMA warmup: alpha=min(1-1/1, .99)=0 at step 0 -> teacher == student
        t, s = jax.tree.leaves(new_state.teacher_params)[0], jax.tree.leaves(new_state.params)[0]
        np.testing.assert_allclose(np.asarray(t), np.asarray(s), atol=1e-7)

    def test_ema_second_step_is_blend(self, step_bundle):
        cfg, model, opt, state, step, batch = step_bundle
        scalars = StepScalars.make(5.0, 0.01, 1.3, 0.3)
        s1, _ = step(state, batch, jax.random.key(1), scalars)
        s2, _ = step(s1, batch, jax.random.key(2), scalars)
        # alpha at step 1 = min(1-1/2, .99) = 0.5
        want = jax.tree.map(lambda t, s: 0.5 * t + 0.5 * s, s1.teacher_params, s2.params)
        got = s2.teacher_params
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(got)[0]), np.asarray(jax.tree.leaves(want)[0]), atol=1e-6
        )

    def test_nan_guard_skips_update(self, step_bundle):
        cfg, model, opt, state, step, batch = step_bundle
        bad_batch = dict(batch, image=batch["image"].at[0, 0, 0, 0, 0].set(jnp.nan))
        new_state, m = step(state, bad_batch, jax.random.key(1), StepScalars.make(5.0, 0.01, 1.3, 0.3))
        assert unpack_scalars(m)["skipped"] == 1.0
        assert int(new_state.step) == 0
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(new_state.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_loss_decreases_over_iterations(self, step_bundle):
        cfg, model, opt, state, step, batch = step_bundle
        scalars = StepScalars.make(0.5, 0.0, 1.3, 0.3)
        losses = []
        key = jax.random.key(7)
        for i in range(8):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k, scalars)
            v = unpack_scalars(m)
            losses.append(v["loss_ce"] + v["loss_dice"])
        assert losses[-1] < losses[0]


class TestOptimizerSemantics:
    def test_matches_torch_sgd(self, rng):
        """One parameter, two steps: p <- p - lr*(mu*buf + g + wd*p)."""
        import torch

        lr, mu, wd = 0.1, 0.9, 1e-4
        p0 = rng.normal(size=(5,)).astype(np.float32)
        g1 = rng.normal(size=(5,)).astype(np.float32)
        g2 = rng.normal(size=(5,)).astype(np.float32)

        tp = torch.tensor(p0.copy(), requires_grad=True)
        topt = torch.optim.SGD([tp], lr=lr, momentum=mu, weight_decay=wd)
        for g in (g1, g2):
            topt.zero_grad()
            tp.grad = torch.tensor(g.copy())
            torch.nn.utils.clip_grad_norm_([tp], max_norm=1.0)
            topt.step()

        opt = make_optimizer(lambda s: lr, momentum=mu, weight_decay=wd, clip_norm=1.0)
        params = {"w": jnp.asarray(p0)}
        ostate = opt.init(params)
        for g in (g1, g2):
            updates, ostate = opt.update({"w": jnp.asarray(g)}, ostate, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6)

    def test_ema_update_tree(self):
        t = {"a": jnp.ones(3)}
        s = {"a": jnp.zeros(3)}
        out = ema_update(t, s, 0.9)
        np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


class TestTrainerEndToEnd:
    def test_full_loop_with_val_and_checkpoint(self, tmp_path):
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        cfg = _tiny_cfg(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            max_iterations=3, val_every=2,
        )
        trainer = Trainer(cfg)
        best = trainer.run()
        assert os.path.exists(os.path.join(trainer.snapshot_path, "log.txt"))
        assert os.path.exists(os.path.join(trainer.snapshot_path, "metrics.jsonl"))
        assert 0.0 <= best <= 1.0
        # checkpoint restore round-trip when a best model was saved
        from dycon_paper_replication_tpu.utils import checkpoint as ckpt
        best_path = ckpt.best_checkpoint_path(trainer.snapshot_path, cfg.model)
        if os.path.exists(best_path):
            template = create_train_state(trainer.model, jax.random.key(0), trainer.optimizer)
            restored = ckpt.restore_checkpoint(best_path, template)
            assert int(restored.step) >= 1

    def test_resume_continues_from_checkpoint(self, tmp_path):
        """Train 3 iters (checkpointing best), then resume='auto' and
        verify the restored run starts past iteration 0."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer
        from dycon_paper_replication_tpu.utils import checkpoint as ckpt

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        cfg = _tiny_cfg(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            max_iterations=2, val_every=1,
        )
        t1 = Trainer(cfg)
        t1.run()
        best_path = ckpt.best_checkpoint_path(t1.snapshot_path, cfg.model)
        assert os.path.exists(best_path)

        # note: "auto" resolves inside the new run dir; the snapshot path
        # encodes max_iterations, so extending a run needs the explicit path
        cfg2 = _tiny_cfg(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            max_iterations=4, val_every=10, resume=best_path,
        )
        t2 = Trainer(cfg2)
        assert int(t2.state.step) >= 1  # restored, not fresh
        t2.run()
        assert int(t2.state.step) >= 3

    def test_resume_auto_latest_and_time_budget(self, tmp_path):
        """`--time_budget_s` exits cleanly after the first step with a
        resumable periodic checkpoint, and `resume='auto'` restores the
        LATEST checkpoint of the same run dir (not the best), carrying
        the best-so-far dice bar from the `iter_*_dice_*` filenames —
        the preemption/kill recovery path of the 20k canonical run."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        kw = dict(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            max_iterations=4, val_every=1, save_every=100,
        )
        # leg 1: budget exceeded immediately after step 1 -> clean stop
        t1 = Trainer(_tiny_cfg(**kw, time_budget_s=1e-6))
        best1 = t1.run()
        assert int(t1.state.step) == 1
        # the budget exit saved iter_1 (plus the best-iter save from val)
        from dycon_paper_replication_tpu.utils import checkpoint as ckpt
        path, best_seen = ckpt.latest_checkpoint_path(t1.snapshot_path, "unet_3D")
        assert os.path.basename(path).startswith("iter_1")
        assert best_seen == pytest.approx(best1, abs=1e-4)

        # leg 2: same config (same run dir), resume=auto -> latest, runs on
        t2 = Trainer(_tiny_cfg(**kw, resume="auto"))
        assert int(t2.state.step) == 1
        assert t2.best_performance == pytest.approx(best1, abs=1e-4)
        t2.run()
        assert int(t2.state.step) == 4

    def test_fetch_ahead_and_light_step_equivalence(self, tmp_path):
        """fetch_ahead=1 (deferred metric fetch) + step_diagnostics=
        'cadence' (light step off the monitor/HD95 cadence) change WHEN
        the host observes each iteration, never WHAT the update computes:
        the final TrainState must be bit-identical to the synchronous
        every-step-diagnostics loop, and the best-val bar must match
        (VERDICT r3 #7 — host-loop tail levers, flag-gated)."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        # val_every=8 -> hd95_every=2: odd iterations >1 are true
        # deferred+light iterations (with val_every=2, hd95_every would
        # be 1 and every step a sync step, exercising nothing)
        kw = dict(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs_a"),
            max_iterations=9, val_every=8, save_every=100,
        )
        t_ref = Trainer(_tiny_cfg(**kw))
        best_ref = t_ref.run()
        t_pipe = Trainer(_tiny_cfg(**{
            **kw, "snapshot_root": str(tmp_path / "runs_b"),
            "fetch_ahead": 1, "step_diagnostics": "cadence",
        }))
        best_pipe = t_pipe.run()

        assert int(t_pipe.state.step) == int(t_ref.state.step) == 9
        assert best_pipe == pytest.approx(best_ref, abs=0)
        ref_leaves = jax.tree.leaves(t_ref.state)
        pipe_leaves = jax.tree.leaves(t_pipe.state)
        assert len(ref_leaves) == len(pipe_leaves)
        for a, b in zip(ref_leaves, pipe_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_host_rss_watchdog_exits_cleanly_and_resumes(self, tmp_path):
        """host_rss_exit_gb: crossing the RSS bar saves a periodic
        checkpoint and stops — the resumable-exit path that replaces an
        OOM kill (the relay plugin leaks ~29 MB of H2D staging per step;
        a 20k canonical run died at iter 8548 / 130 GB before this).
        A bar of ~0 trips at the first watchdog cadence (iter 20)."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        kw = dict(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            max_iterations=60, val_every=100, save_every=1000,
            host_rss_exit_gb=1e-6,
        )
        t = Trainer(_tiny_cfg(**kw))
        t.run()
        stopped_at = int(t.state.step)
        assert 20 <= stopped_at < 60  # tripped on the 20-iter cadence
        # the exit saved a checkpoint at the stop step and resume works
        t2 = Trainer(_tiny_cfg(**{**kw, "resume": "auto", "host_rss_exit_gb": 0.0}))
        assert int(t2.state.step) == stopped_at
        t2.run()
        assert int(t2.state.step) == 60

    def test_vnet_full_loop_with_val_and_checkpoint(self, tmp_path):
        """--model vnet drives the identical trainer+val+checkpoint loop
        (VNet as a peer model family, reference VNet.py:145-239; the
        reference's own vnet factory path crashes — see models/vnet.py)."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer
        from dycon_paper_replication_tpu.utils import checkpoint as ckpt

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))
        cfg = _tiny_cfg(
            root_dir=str(root), snapshot_root=str(tmp_path / "runs"),
            model="vnet", max_iterations=3, val_every=2,
        )
        trainer = Trainer(cfg)
        best = trainer.run()
        assert 0.0 <= best <= 1.0
        best_path = ckpt.best_checkpoint_path(trainer.snapshot_path, cfg.model)
        assert os.path.exists(best_path)
        # the vnet snapshot dir is distinct from unet_3D's
        assert "VNET" in trainer.snapshot_path.upper()


class TestRemat:
    def test_remat_step_matches_no_remat(self, step_bundle):
        """remat='full' must be numerically identical (same graph, just
        recomputed in backward)."""
        cfg, model, opt, state, step, batch = step_bundle
        cfg_r = _tiny_cfg(remat="full")
        step_r = jax.jit(build_train_step(model, opt, cfg_r))
        sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)
        s1, m1 = step(state, batch, jax.random.key(3), sc)
        s2, m2 = step_r(state, batch, jax.random.key(3), sc)
        np.testing.assert_allclose(unpack_scalars(m1)["loss"], unpack_scalars(m2)["loss"], rtol=1e-6)
        a = np.asarray(jax.tree.leaves(s1.params)[0])
        b = np.asarray(jax.tree.leaves(s2.params)[0])
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestDeterminism:
    def test_same_seed_same_losses(self, tmp_path):
        """Two Trainer runs with identical config+seed produce the same
        loss sequence (seeded data order, augmentations, dropout)."""
        from dycon_paper_replication_tpu.data import synthetic
        from dycon_paper_replication_tpu.train.trainer import Trainer

        root = tmp_path / "Pancreas"
        synthetic.make_pancreas(str(root), n_train=6, n_test=2, shape=(40, 40, 24))

        def run(tag):
            cfg = _tiny_cfg(root_dir=str(root), snapshot_root=str(tmp_path / tag),
                            max_iterations=2, val_every=100)
            t = Trainer(cfg)
            losses = []
            def wrap(orig):
                def wrapped(state, batch, key, scalars):
                    s, m = orig(state, batch, key, scalars)
                    losses.append(unpack_scalars(m)["loss"])
                    return s, m
                return wrapped
            # wrap BOTH twins: with step_diagnostics="cadence" (the
            # default) off-cadence iterations dispatch the light step
            # (when not on cadence, light IS full — avoid double-wrap)
            distinct = t.train_step_light is not t.train_step
            t.train_step = wrap(t.train_step)
            t.train_step_light = wrap(t.train_step_light) if distinct else t.train_step
            t.run()
            return losses

        l1, l2 = run("a"), run("b")
        assert len(l1) == 2
        np.testing.assert_allclose(l1, l2, rtol=1e-6)


class TestDataParallelExactness:
    def test_sharded_step_matches_single_device(self, tmp_path):
        """Pure DP is mathematically exact for every DyCON loss term
        (SURVEY §5): the same batch on a 4-device mesh and on one device
        must produce the same loss and the same updated params."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = _tiny_cfg(batch_size=4, labeled_bs=2)
        model = net_factory_3d(cfg.model, in_chns=1, class_num=2, scaler=2)
        opt = make_optimizer(lambda s: cfg.base_lr)
        state = create_train_state(model, jax.random.key(0), opt)
        step = jax.jit(build_train_step(model, opt, cfg))
        rng = np.random.default_rng(0)
        label = rng.integers(0, 2, size=(4, 16, 16, 16)).astype(np.int32)
        batch = {
            "image": jnp.asarray(label[..., None] * 0.5 + 0.1 * rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32),
            "label": jnp.asarray(label),
        }
        sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)

        # single device
        s1, m1 = step(state, batch, jax.random.key(9), sc)

        # 4-way data parallel (batch sharded, state replicated)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        bsh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        state_r = jax.device_put(state, rep)
        batch_s = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        key_r = jax.device_put(jax.random.key(9), rep)
        s2, m2 = step(state_r, batch_s, key_r, sc)

        np.testing.assert_allclose(
            unpack_scalars(m1)["loss"], unpack_scalars(m2)["loss"], rtol=2e-5
        )
        a = np.asarray(jax.tree.leaves(s1.params)[0])
        b = np.asarray(jax.tree.leaves(s2.params)[0])
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    def test_folded_layout_sharded_step(self, tmp_path):
        """The fold-2 flagship layout must train under SPMD data
        parallelism too (fold2 reshapes touch only non-batch dims, so
        batch sharding passes straight through)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = _tiny_cfg(batch_size=4, labeled_bs=2)
        model = net_factory_3d(cfg.model, in_chns=1, class_num=2, scaler=2,
                               layout="folded")
        opt = make_optimizer(lambda s: cfg.base_lr)
        state = create_train_state(model, jax.random.key(0), opt)
        step = jax.jit(build_train_step(model, opt, cfg))
        rng = np.random.default_rng(0)
        label = rng.integers(0, 2, size=(4, 16, 16, 16)).astype(np.int32)
        batch = {
            "image": jnp.asarray(label[..., None] * 0.5 + 0.1 * rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32),
            "label": jnp.asarray(label),
        }
        sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)
        s1, m1 = step(state, batch, jax.random.key(9), sc)

        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        state_r = jax.device_put(state, NamedSharding(mesh, P()))
        batch_s = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
        key_r = jax.device_put(jax.random.key(9), NamedSharding(mesh, P()))
        s2, m2 = step(state_r, batch_s, key_r, sc)

        np.testing.assert_allclose(
            unpack_scalars(m1)["loss"], unpack_scalars(m2)["loss"], rtol=2e-5
        )
        a = np.asarray(jax.tree.leaves(s1.params)[0])
        b = np.asarray(jax.tree.leaves(s2.params)[0])
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


class TestMultiDeviceTrainerRules:
    """The reference's DataParallel adjustments
    (train_DyCON_BraTS19.py:93-110) mirrored by
    Trainer._apply_multi_device_rules."""

    def test_rounds_batches_and_scales_lr(self):
        from dycon_paper_replication_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(batch_size=10, labeled_bs=5, base_lr=0.01)
        out, notes = Trainer._apply_multi_device_rules(cfg, 4)
        assert out.batch_size == 8
        assert out.labeled_bs == 4
        assert out.base_lr == pytest.approx(0.04)
        assert len(notes) == 3  # two adjustments + the LR scaling line

    def test_single_device_is_identity(self):
        from dycon_paper_replication_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(batch_size=10, labeled_bs=5, base_lr=0.01)
        out, notes = Trainer._apply_multi_device_rules(cfg, 1)
        assert out is cfg and notes == []

    def test_zero_rounding_raises(self):
        from dycon_paper_replication_tpu.train.trainer import Trainer

        cfg = _tiny_cfg(batch_size=8, labeled_bs=4)
        with pytest.raises(ValueError, match="round to zero"):
            Trainer._apply_multi_device_rules(cfg, 8)  # labeled_bs 4 // 8 -> 0

    def test_labeled_prefix_survives_sharding(self):
        """Labeled samples occupy batch[:labeled_bs] globally; under a
        4-device batch sharding the jitted global view keeps that
        contract (all loss slicing relies on it, SURVEY §2 A9)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from dycon_paper_replication_tpu.data.samplers import TwoStreamBatchSampler

        n_labeled, n_total, bs, labeled_bs = 4, 16, 8, 4
        sampler = TwoStreamBatchSampler(
            range(n_labeled), range(n_labeled, n_total), bs, bs - labeled_bs, seed=0
        )
        batch_idx = next(iter(sampler))
        assert all(i < n_labeled for i in batch_idx[:labeled_bs])
        assert all(i >= n_labeled for i in batch_idx[labeled_bs:])

        # shard a batch keyed by those indices over 4 devices
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        ids = jnp.asarray(np.array(batch_idx, np.int32))
        ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))

        @jax.jit
        def labeled_slice(x):
            return x[:labeled_bs]

        got = np.asarray(labeled_slice(ids_sharded))
        assert (got < n_labeled).all()
        np.testing.assert_array_equal(got, np.array(batch_idx[:labeled_bs]))
        # with labeled_bs == 2 shards' worth, devices 0-1 hold only
        # labeled samples: per-device addressable data is the contiguous
        # global chunk
        shard0 = np.asarray(ids_sharded.addressable_shards[0].data)
        assert (shard0 < n_labeled).all()
