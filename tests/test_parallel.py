"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from image_to_pointcloud_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_params,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestMesh:
    def test_default_data_mesh(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1, "seq": 1}

    def test_2d_mesh(self):
        mesh = make_mesh(model=4)
        assert mesh.shape == {"data": 2, "model": 4, "seq": 1}


class TestTPRules:
    def test_attention_and_mlp_sharded(self):
        assert param_sharding_rules("backbone/block0/q/kernel") == P(None, "model")
        assert param_sharding_rules("backbone/block3/proj/kernel") == P("model", None)
        assert param_sharding_rules("backbone/block1/mlp/fc1/kernel") == P(None, "model")
        assert param_sharding_rules("backbone/block1/mlp/fc2/kernel") == P("model", None)

    def test_everything_else_replicated(self):
        assert param_sharding_rules("backbone/pos_embed") == P()
        assert param_sharding_rules("neck/fusion0/projection/kernel") == P()
        assert param_sharding_rules("backbone/block0/norm1/scale") == P()

    def test_beit_attention_and_mlp_sharded(self):
        assert param_sharding_rules("backbone/block0/attn/q/kernel") == P(None, "model")
        assert param_sharding_rules("backbone/block0/attn/k/kernel") == P(None, "model")
        assert param_sharding_rules("backbone/block2/attn/proj/kernel") == P("model", None)
        assert param_sharding_rules("backbone/block2/attn/rel_pos_table") == P(None, "model")
        assert param_sharding_rules("backbone/block1/fc1/kernel") == P(None, "model")
        assert param_sharding_rules("backbone/block1/fc2/kernel") == P("model", None)
        # ZoeDepth neck/head stays replicated.
        assert param_sharding_rules("reassemble/readout0/kernel") == P()
        assert param_sharding_rules("attractor0/conv1/kernel") == P()

    def test_int8_variants_shard_like_float(self):
        """kernel_q/kernel_scale (models/quantize.py) must follow the
        float kernel's spec for BOTH path layouts (DA and BEiT) — a
        replicated int8 weight next to a model-sharded bias defeats TP
        and inserts reshards."""
        for base in (
            "backbone/block0/q", "backbone/block0/attn/q",
            "backbone/block1/mlp/fc1", "backbone/block1/fc1",
        ):
            assert param_sharding_rules(f"{base}/kernel_q") == (
                param_sharding_rules(f"{base}/kernel")
            ), base
            # scale is per-output-feature: 1-D, sharded iff the kernel's
            # output dim is (column-parallel layers).
            assert param_sharding_rules(f"{base}/kernel_scale") == P("model"), base
        for base in (
            "backbone/block3/proj", "backbone/block3/attn/proj",
            "backbone/block1/mlp/fc2", "backbone/block1/fc2",
        ):
            assert param_sharding_rules(f"{base}/kernel_q") == (
                param_sharding_rules(f"{base}/kernel")
            ), base
            assert param_sharding_rules(f"{base}/kernel_scale") == P(None), base


class TestTPForwardParity:
    def test_sharded_forward_matches_single_device(self, rng):
        """DA forward with TP=2, DP=4 must equal the unsharded forward."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        _, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
        x = rng.normal(0, 1, (4, 56, 56, 3)).astype(np.float32)

        ref = np.asarray(model.apply(variables, jnp.asarray(x)))

        mesh = make_mesh(model=2)
        params = shard_params(variables["params"], mesh)
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
        fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
        out = np.asarray(fn(params, xs))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestInt8TPForwardParity:
    def test_int8_sharded_forward_matches_single_device(self, rng):
        """Int8 W8A8 encoder with TP=2 equals the unsharded int8 forward
        — executable proof that kernel_q/kernel_scale shard consistently
        (the rules-only test can't catch a bad placement interaction)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.models import build_model
        from image_to_pointcloud_tpu.models.quantize import (
            quantize_encoder_params,
        )

        _, model, variables = _build_pair(
            hidden=32, layers=4, heads=2, image_size=56
        )
        qcfg = model.cfg.with_quantized(True)
        qmodel = build_model(qcfg)
        qparams = quantize_encoder_params(
            variables["params"], qcfg.backbone.num_layers
        )
        x = rng.normal(0, 1, (4, 56, 56, 3)).astype(np.float32)
        ref = np.asarray(qmodel.apply({"params": qparams}, jnp.asarray(x)))

        mesh = make_mesh(model=2)
        sharded = shard_params(qparams, mesh)
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
        fn = jax.jit(lambda p, xx: qmodel.apply({"params": p}, xx))
        out = np.asarray(fn(sharded, xs))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestZoeDepthTPForwardParity:
    def test_sharded_zoedepth_matches_single_device(self, rng):
        """ZoeDepth (BEiT backbone) with TP=2, DP=4 equals unsharded —
        validates the BEiT megatron rules incl. the head-sharded
        relative-position bias table."""
        import sys

        sys.path.insert(0, "tests")
        from test_zoedepth_parity import _build_pair

        _, model, variables = _build_pair(image_size=64)
        x = rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)

        ref = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))

        mesh = make_mesh(model=2)
        params = shard_params(variables["params"], mesh)
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
        fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
        out = np.asarray(fn(params, xs))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestContextParallel:
    def _qkv(self, rng):
        q = rng.normal(0, 1, (2, 2, 64, 16)).astype(np.float32)
        k = rng.normal(0, 1, (2, 2, 64, 16)).astype(np.float32)
        v = rng.normal(0, 1, (2, 2, 64, 16)).astype(np.float32)
        return map(jnp.asarray, (q, k, v))

    def test_sequence_sharded_attention(self, rng):
        from image_to_pointcloud_tpu.models.attention import _attention_xla
        from image_to_pointcloud_tpu.parallel.context import (
            sequence_sharded_attention,
        )

        q, k, v = self._qkv(rng)
        mesh = make_mesh(data=1, seq=8)
        ref = np.asarray(_attention_xla(q, k, v, 1.0 / 4.0))
        out = np.asarray(sequence_sharded_attention(q, k, v, mesh))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_ring_attention(self, rng):
        from image_to_pointcloud_tpu.models.attention import _attention_xla
        from image_to_pointcloud_tpu.parallel.context import ring_attention

        q, k, v = self._qkv(rng)
        mesh = make_mesh(data=1, seq=8)
        ref = np.asarray(_attention_xla(q, k, v, 1.0 / 4.0))
        out = np.asarray(ring_attention(q, k, v, mesh))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestTiling:
    def test_tile_plan_covers(self):
        from image_to_pointcloud_tpu.parallel.tiling import plan_tiles

        corners = plan_tiles(100, 90, 40, 10)
        cover = np.zeros((100, 90), bool)
        for y, x in corners:
            cover[y : y + 40, x : x + 40] = True
        assert cover.all()

    def test_blend_reconstructs_constant_field(self, rng):
        from image_to_pointcloud_tpu.parallel.tiling import (
            blend_tiles,
            extract_tiles,
            plan_tiles,
        )

        depth = rng.random((64, 80)).astype(np.float32)
        corners = plan_tiles(64, 80, 32, 8)
        tiles = extract_tiles(jnp.asarray(depth)[:, :, None], corners, 32)[..., 0]
        out = np.asarray(blend_tiles(tiles, corners, (64, 80)))
        np.testing.assert_allclose(out, depth, atol=1e-5)


class TestTrainer:
    def test_train_step_decreases_loss(self, rng):
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.train.trainer import TrainConfig, Trainer

        _, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
        # Random-init relative heads can have a dead final ReLU; train the
        # metric (sigmoid) head so gradients always flow.
        import dataclasses

        from image_to_pointcloud_tpu.models import DepthAnythingConfig

        cfg = DepthAnythingConfig(
            backbone=model.cfg.backbone,
            neck=dataclasses.replace(model.cfg.neck, metric_depth=True, max_depth=2.0),
        )
        mesh = make_mesh(model=2)
        tr = Trainer(
            cfg,
            variables["params"],
            mesh,
            # silog: affine-invariant is flat at the (near-constant) output
            # of a freshly initialized net — no gradient signal to test with.
            TrainConfig(learning_rate=1e-3, remat=True, loss="silog"),
        )
        x = jnp.asarray(rng.normal(0, 1, (4, 56, 56, 3)).astype(np.float32))
        y = jnp.asarray(rng.random((4, 56, 56)).astype(np.float32) + 0.5)
        losses = [float(tr.train_step(x, y)) for _ in range(3)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestTrainCheckpointResume:
    def test_save_restore_resume(self, rng, tmp_path):
        """Fine-tune → checkpoint → restore → resume continues descending."""
        import sys

        sys.path.insert(0, "tests")
        import dataclasses

        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.models import DepthAnythingConfig
        from image_to_pointcloud_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from image_to_pointcloud_tpu.train.trainer import TrainConfig, Trainer

        _, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
        cfg = DepthAnythingConfig(
            backbone=model.cfg.backbone,
            neck=dataclasses.replace(model.cfg.neck, metric_depth=True, max_depth=2.0),
        )
        mesh = make_mesh(model=2)
        tr = Trainer(cfg, variables["params"], mesh,
                     TrainConfig(learning_rate=1e-3, loss="silog"))
        x = jnp.asarray(rng.normal(0, 1, (4, 56, 56, 3)).astype(np.float32))
        y = jnp.asarray(rng.random((4, 56, 56)).astype(np.float32) + 0.5)
        l0 = float(tr.train_step(x, y))
        l1 = float(tr.train_step(x, y))

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, jax.device_get(tr.params), step=2)
        ck = restore_checkpoint(path)
        assert ck["step"] == 2

        tr2 = Trainer(cfg, ck["params"], mesh,
                      TrainConfig(learning_rate=1e-3, loss="silog"))
        l2 = float(tr2.train_step(x, y))
        assert l2 < l0  # resumed model better than initial


class TestPipelineParallel:
    """GPipe microbatching over the pipe mesh axis (parallel/pipeline_par):
    PP output must equal running the block stack sequentially, and the
    per-stage taps must equal the activations at stage boundaries (the
    DPT tap pattern, models/dinov2.py out_layers)."""

    def _blocks(self, num_layers=8, hidden=32, heads=2, tokens=10, batch=8):
        from image_to_pointcloud_tpu.models.dinov2 import Block, DinoV2Config

        cfg = DinoV2Config(hidden_size=hidden, num_layers=num_layers,
                           num_heads=heads)
        block = Block(cfg)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(0, 1, (batch, tokens, hidden)).astype(np.float32))
        params = {}
        key = jax.random.PRNGKey(0)
        for i in range(num_layers):
            key, sub = jax.random.split(key)
            params[f"block{i}"] = block.init(sub, x)["params"]
        return block, params, x

    def test_matches_sequential_and_taps(self):
        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            gpipe_apply,
            make_pipe_mesh,
            make_stage_fn,
            stack_block_params,
        )

        num_layers, stages, micro = 8, 4, 4
        block, params, x = self._blocks(num_layers=num_layers)
        mesh = make_pipe_mesh(pipe=stages, data=2)
        stacked = stack_block_params(params, num_layers, stages)
        stage_fn = make_stage_fn(block)

        with mesh:
            y, taps = jax.jit(
                lambda p, xx: gpipe_apply(
                    mesh, stage_fn, p, xx, num_microbatches=micro
                )
            )(stacked, x)

        # Sequential oracle + boundary activations.
        ref = x
        boundaries = []
        per = num_layers // stages
        for i in range(num_layers):
            ref = block.apply({"params": params[f"block{i}"]}, ref)
            if (i + 1) % per == 0:
                boundaries.append(ref)

        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
        assert taps.shape == (stages, *x.shape)
        for s, bnd in enumerate(boundaries):
            np.testing.assert_allclose(
                np.asarray(taps[s]), np.asarray(bnd), atol=1e-5
            )

    def test_pipe_only_mesh(self):
        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            gpipe_apply,
            make_pipe_mesh,
            make_stage_fn,
            stack_block_params,
        )

        block, params, x = self._blocks(num_layers=4, batch=6)
        mesh = make_pipe_mesh(pipe=2, data=1)
        stacked = stack_block_params(params, 4, 2)
        with mesh:
            y, taps = gpipe_apply(
                mesh, make_stage_fn(block), stacked, x, num_microbatches=3
            )
        ref = x
        for i in range(4):
            ref = block.apply({"params": params[f"block{i}"]}, ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    def test_tap_indices_require_ascending_out_layers(self):
        """Stage s emits tap s: a non-ascending out_layers config must be
        rejected, not silently permuted (the sequential backbone returns
        feats in cfg.out_layers order)."""
        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            stage_tap_indices,
        )

        assert stage_tap_indices(8, 4, (1, 3, 4, 7)) == [1, 1, 0, 1]
        with pytest.raises(AssertionError, match="ascending"):
            stage_tap_indices(8, 4, (3, 1, 4, 7))

    def test_full_model_pipelined_uneven_taps(self):
        """pipelined_depth_apply == sequential DepthAnything.apply, with
        tap layers NOT on stage boundaries (the DA-Large pattern:
        out_layers (4, 11, 17, 23) of 24, models/depth_anything.py)."""
        from image_to_pointcloud_tpu.models import (
            DepthAnything,
            DepthAnythingConfig,
        )
        from image_to_pointcloud_tpu.models.dinov2 import DinoV2Config
        from image_to_pointcloud_tpu.models.dpt import DPTConfig
        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            build_stage_params,
            make_pipe_mesh,
            pipelined_depth_apply,
        )

        cfg = DepthAnythingConfig(
            backbone=DinoV2Config(
                hidden_size=32,
                num_layers=8,
                num_heads=2,
                pos_embed_size=4,
                out_layers=(1, 3, 4, 7),  # taps 3 and 4 are mid-stage
            ),
            neck=DPTConfig(
                hidden_size=32,
                neck_hidden_sizes=(8, 16, 32, 32),
                fusion_hidden_size=16,
                head_hidden_size=8,
            ),
        )
        model = DepthAnything(cfg)
        rng = np.random.default_rng(3)
        pixels = jnp.asarray(
            rng.normal(0, 1, (4, 28, 28, 3)).astype(np.float32)
        )
        params = model.init(jax.random.PRNGKey(1), pixels)["params"]

        mesh = make_pipe_mesh(pipe=4, data=2)
        stage_params = build_stage_params(cfg, params)
        with mesh:
            got = jax.jit(
                lambda p, sp, px: pipelined_depth_apply(
                    cfg, p, sp, px, mesh, num_microbatches=2
                )
            )(params, stage_params, pixels)
        ref = model.apply({"params": params}, pixels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestMeshedServing:
    """DepthPipeline with a (data, model) mesh — DP batch sharding + TP
    params — must produce the same points as the single-device pipeline."""

    def test_pipeline_mesh_equivalence(self, rng):
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        _, model, variables = _build_pair(
            hidden=32, layers=4, heads=2, image_size=56
        )
        params = variables["params"]
        imgs = rng.integers(0, 255, (4, 56, 56, 3)).astype(np.uint8)
        opts = PipelineOptions(density="medium")

        plain = DepthPipeline(model.cfg, params, model_target=56)
        mesh = make_mesh(data=4, model=2)
        meshed = DepthPipeline(model.cfg, params, model_target=56, mesh=mesh)

        r0 = plain.run_batch(imgs, options=opts, want_preview=False)
        r1 = meshed.run_batch(imgs, options=opts, want_preview=False)
        for a, b in zip(r0, r1):
            assert a.kept_point_count == b.kept_point_count
            np.testing.assert_allclose(a.points, b.points, atol=2e-4)
            np.testing.assert_allclose(a.colors, b.colors, atol=1e-3)

        # Batches not divisible by the data axis (incl. a single request,
        # the common micro-batcher case) must pad, run, and return exactly
        # len(inputs) results identical to the unmeshed pipeline.
        for n in (1, 3):
            rm = meshed.run_batch(imgs[:n], options=opts, want_preview=False)
            assert len(rm) == n
            for a, b in zip(r0[:n], rm):
                assert a.kept_point_count == b.kept_point_count
                np.testing.assert_allclose(a.points, b.points, atol=2e-4)

    def test_pipeline_pipe_mesh_equivalence(self, rng):
        """DepthPipeline over a (data, pipe) mesh — GPipe encoder stages —
        must match the single-device pipeline point-for-point."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            make_pipe_mesh,
        )
        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        _, model, variables = _build_pair(
            hidden=32, layers=4, heads=2, image_size=56
        )
        params = variables["params"]
        imgs = rng.integers(0, 255, (4, 56, 56, 3)).astype(np.uint8)
        opts = PipelineOptions(density="medium")

        plain = DepthPipeline(model.cfg, params, model_target=56)
        mesh = make_pipe_mesh(pipe=4, data=2)
        piped = DepthPipeline(
            model.cfg, params, model_target=56, mesh=mesh,
            pipe_microbatches=2,
        )
        r0 = plain.run_batch(imgs, options=opts, want_preview=False)
        r1 = piped.run_batch(imgs, options=opts, want_preview=False)
        for a, b in zip(r0, r1):
            assert a.kept_point_count == b.kept_point_count
            np.testing.assert_allclose(a.points, b.points, atol=2e-4)
            np.testing.assert_allclose(a.colors, b.colors, atol=1e-3)

        # Odd/single batches pad onto the data axis and fall back to
        # fewer microbatches as needed.
        for n in (1, 3):
            rm = piped.run_batch(imgs[:n], options=opts, want_preview=False)
            assert len(rm) == n
            for a, b in zip(r0[:n], rm):
                assert a.kept_point_count == b.kept_point_count
                np.testing.assert_allclose(a.points, b.points, atol=2e-4)

    def test_meshed_quantized_transfer_padding(self, rng):
        """TPU serving path: quantized transfer + mesh padding must slice
        the padded device outputs back to the real batch (regression:
        collect() reshaped padded arrays with the unpadded size)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        _, model, variables = _build_pair(
            hidden=32, layers=4, heads=2, image_size=56
        )
        imgs = rng.integers(0, 255, (3, 56, 56, 3)).astype(np.uint8)
        opts = PipelineOptions(density="medium")
        mesh = make_mesh(data=8)
        pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=56, mesh=mesh,
            quantized_transfer=True,  # forced (default only on TPU)
        )
        # Both the fast (unpacked) and packed collect paths.
        for want_packed in (False, True):
            res = pipe.run_batch(
                imgs, options=opts, want_preview=True,
                want_packed=want_packed,
            )
            assert len(res) == 3
            for r in res:
                assert r.kept_point_count > 0
                assert r.depth_preview_rgb is not None


class TestInputPipeline:
    """Double-buffered host→device staging (train/data.py)."""

    def test_prefetch_preserves_order_and_shards(self):
        from image_to_pointcloud_tpu.parallel.sharding import batch_sharding
        from image_to_pointcloud_tpu.train.data import prefetch_to_device

        mesh = make_mesh(data=8)
        sh = batch_sharding(mesh, 2)
        batches = [np.full((8, 4), i, np.float32) for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2, sharding=sh))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert b.sharding.is_equivalent_to(sh, 2)
            np.testing.assert_array_equal(np.asarray(b), batches[i])

    def test_prefetch_propagates_errors(self):
        from image_to_pointcloud_tpu.train.data import prefetch_to_device

        def gen():
            yield np.zeros((2, 2), np.float32)
            raise RuntimeError("source died")

        it = prefetch_to_device(gen(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="source died"):
            list(it)

    def test_trainer_descends_on_synthetic_stream(self, rng):
        import sys

        sys.path.insert(0, "tests")
        import dataclasses

        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.models import DepthAnythingConfig
        from image_to_pointcloud_tpu.parallel.sharding import batch_sharding
        from image_to_pointcloud_tpu.train.data import (
            prefetch_to_device,
            synthetic_depth_batches,
        )
        from image_to_pointcloud_tpu.train.trainer import TrainConfig, Trainer

        _, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
        cfg = DepthAnythingConfig(
            backbone=model.cfg.backbone,
            neck=dataclasses.replace(model.cfg.neck, metric_depth=True, max_depth=2.0),
        )
        mesh = make_mesh(model=2)
        tr = Trainer(cfg, variables["params"], mesh,
                     TrainConfig(learning_rate=1e-3, loss="silog"))
        stream = prefetch_to_device(
            synthetic_depth_batches(batch_size=4, image_hw=(56, 56), steps=4),
            sharding=lambda x: batch_sharding(mesh, x.ndim),
        )
        losses = []
        for imgs, depth in stream:
            losses.append(float(tr.train_step(imgs, depth)))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestDepthMetrics:
    """Standard depth eval metrics (train/eval.py) vs a NumPy oracle."""

    def test_against_numpy_oracle(self, rng):
        from image_to_pointcloud_tpu.train.eval import depth_metrics

        t = rng.uniform(0.5, 10.0, (2, 32, 32)).astype(np.float32)
        p = t * rng.uniform(0.7, 1.4, t.shape).astype(np.float32)
        mask = rng.random(t.shape) > 0.2
        tm = np.where(mask, t, 0)  # invalid ⇒ target 0

        got = {k: float(v) for k, v in depth_metrics(
            jnp.asarray(p), jnp.asarray(tm)).items()}

        pv, tv = p[mask], t[mask]
        d = pv - tv
        ld = np.log(pv) - np.log(tv)
        ratio = np.maximum(pv / tv, tv / pv)
        exp = {
            "abs_rel": np.mean(np.abs(d) / tv),
            "sq_rel": np.mean(d**2 / tv),
            "rmse": np.sqrt(np.mean(d**2)),
            "rmse_log": np.sqrt(np.mean(ld**2)),
            "silog": np.sqrt(np.mean(ld**2) - np.mean(ld) ** 2),
            "delta1": np.mean(ratio < 1.25),
            "delta2": np.mean(ratio < 1.25**2),
            "delta3": np.mean(ratio < 1.25**3),
        }
        for k, v in exp.items():
            assert abs(got[k] - v) < 1e-4, (k, got[k], v)

    def test_perfect_prediction(self):
        from image_to_pointcloud_tpu.train.eval import depth_metrics

        t = jnp.full((8, 8), 3.0)
        m = {k: float(v) for k, v in depth_metrics(t, t).items()}
        assert m["abs_rel"] == 0 and m["rmse"] == 0
        assert m["delta1"] == 1.0


class TestZoeDepthPipelineParallel:
    def test_pipelined_zoedepth_matches_sequential(self, rng):
        """Full ZoeDepth forward with the BEiT encoder GPipe-pipelined
        over pipe=4 equals the sequential apply (boundary taps)."""
        import sys

        sys.path.insert(0, "tests")
        from test_zoedepth_parity import _build_pair

        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            build_beit_stage_params,
            make_pipe_mesh,
            pipelined_zoedepth_apply,
        )

        _, model, variables = _build_pair(image_size=64)
        cfg = model.cfg
        pmesh = make_pipe_mesh(pipe=4, data=2)
        pixels = jnp.asarray(
            np.random.default_rng(3)
            .normal(0, 1, (4, 64, 64, 3))
            .astype(np.float32)
        )
        ref = np.asarray(jax.jit(model.apply)(variables, pixels))
        stages = build_beit_stage_params(cfg, variables["params"])
        with pmesh:
            out = jax.jit(
                lambda p, sp, px: pipelined_zoedepth_apply(
                    cfg, p, sp, px, pmesh, num_microbatches=2
                )
            )(variables["params"], stages, pixels)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_zoedepth_pipe_mesh_serving(self, rng):
        """DepthPipeline with a pipe mesh serves ZoeDepth end-to-end
        (family dispatch in the pipelined branch + block pruning)."""
        import sys

        sys.path.insert(0, "tests")
        from test_zoedepth_parity import _build_pair

        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            make_pipe_mesh,
        )
        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        _, model, variables = _build_pair(image_size=64)
        pmesh = make_pipe_mesh(pipe=4, data=2)
        pipe = DepthPipeline(
            model.cfg, variables["params"], mesh=pmesh, model_target=64
        )
        ref_pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=64
        )
        imgs = rng.integers(0, 255, (2, 70, 90, 3)).astype(np.uint8)
        opts = PipelineOptions(density="low", refine=False)
        res = pipe.run_batch(imgs, options=opts)
        ref = ref_pipe.run_batch(imgs, options=opts)
        for a, b in zip(res, ref):
            np.testing.assert_allclose(a.points, b.points, atol=1e-3)

class TestDPTClassicPipelineParallel:
    def test_pipelined_dpt_classic_matches_sequential(self, rng):
        """Full classic-DPT forward with the ViT encoder GPipe-pipelined
        over pipe=4 equals the sequential apply (CLS-bearing taps survive
        the stage ring; readout projection gets the right tokens)."""
        import sys

        sys.path.insert(0, "tests")
        from test_dpt_classic_parity import _build_pair

        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            build_stage_params,
            make_pipe_mesh,
            pipelined_dpt_classic_apply,
        )

        _, model, variables = _build_pair(image_size=64)
        cfg = model.cfg
        pmesh = make_pipe_mesh(pipe=4, data=2)
        pixels = jnp.asarray(
            np.random.default_rng(3)
            .normal(0, 1, (4, 64, 64, 3))
            .astype(np.float32)
        )
        ref = np.asarray(jax.jit(model.apply)(variables, pixels))
        stages = build_stage_params(cfg, variables["params"])
        with pmesh:
            out = jax.jit(
                lambda p, sp, px: pipelined_dpt_classic_apply(
                    cfg, p, sp, px, pmesh, num_microbatches=2
                )
            )(variables["params"], stages, pixels)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_dpt_classic_pipe_mesh_serving(self, rng):
        """DepthPipeline with a pipe mesh serves classic DPT end-to-end
        (family dispatch in the pipelined branch + block pruning)."""
        import sys

        sys.path.insert(0, "tests")
        from test_dpt_classic_parity import _build_pair

        from image_to_pointcloud_tpu.parallel.pipeline_par import (
            make_pipe_mesh,
        )
        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        _, model, variables = _build_pair(image_size=64)
        pmesh = make_pipe_mesh(pipe=4, data=2)
        pipe = DepthPipeline(
            model.cfg, variables["params"], mesh=pmesh, model_target=64
        )
        ref_pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=64
        )
        imgs = rng.integers(0, 255, (2, 70, 90, 3)).astype(np.uint8)
        opts = PipelineOptions(density="low", refine=False)
        res = pipe.run_batch(imgs, options=opts)
        ref = ref_pipe.run_batch(imgs, options=opts)
        for a, b in zip(res, ref):
            np.testing.assert_allclose(a.points, b.points, atol=1e-3)
