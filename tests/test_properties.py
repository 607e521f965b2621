"""Property-based tests (hypothesis): invariants that must hold for ALL
inputs, not just the fixtures — bbox math, pairing, geometry, batching."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from image_processor_pipeline_tpu.io.batching import Bucketizer, bucket_dim
from image_processor_pipeline_tpu.ops import bbox, geometry
from image_processor_pipeline_tpu.pairing import generate_processing_inputs
from image_processor_pipeline_tpu.parallel.distributed import host_shard

SET = settings(max_examples=40, deadline=None)


class TestBBoxProperties:
    @SET
    @given(
        cx=st.floats(0.1, 0.9), cy=st.floats(0.1, 0.9),
        bw=st.floats(0.01, 0.2), bh=st.floats(0.01, 0.2),
        w=st.integers(32, 4096), h=st.integers(32, 4096),
    )
    def test_roundtrip_is_identity(self, cx, cy, bw, bh, w, h):
        x = jnp.asarray([[cx, cy, bw, bh]], jnp.float32)
        back = np.asarray(bbox.xyxy2xywhn(bbox.xywhn2xyxy(x, w, h), w, h))
        np.testing.assert_allclose(back, np.asarray(x), atol=1e-3)

    @SET
    @given(
        x1=st.floats(-100, 700), y1=st.floats(-100, 700),
        dw=st.floats(0, 300), dh=st.floats(0, 300),
    )
    def test_clip_stays_in_bounds(self, x1, y1, dw, dh):
        boxes = jnp.asarray([[x1, y1, x1 + dw, y1 + dh]], jnp.float32)
        out = np.asarray(bbox.clip_boxes(boxes, (480, 640)))
        assert (out[:, [0, 2]] >= 0).all() and (out[:, [0, 2]] <= 640).all()
        assert (out[:, [1, 3]] >= 0).all() and (out[:, [1, 3]] <= 480).all()


class TestPairingProperties:
    @SET
    @given(
        n1=st.integers(1, 40), n2=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_modulo_covers_all_firsts_once(self, n1, n2, seed):
        import random
        from pathlib import Path

        a = [Path(f"a{i}") for i in range(n1)]
        b = [Path(f"b{i}") for i in range(n2)]
        it, total = generate_processing_inputs(
            [a, b], "modulo", rng=random.Random(seed))
        pairs = list(it)
        assert total == n1 == len(pairs)
        assert [p[0] for p in pairs] == a
        assert all(p[1] in set(b) for p in pairs)

    @SET
    @given(n=st.integers(1, 200), seed=st.integers(0, 2**31 - 1))
    def test_sample_flag_counts(self, n, seed):
        import random
        from pathlib import Path

        files = [Path(f"f{i}") for i in range(n)]
        it, total = generate_processing_inputs(
            [files], "sample", rng=random.Random(seed))
        rows = list(it)
        k = int(0.3 * n)
        assert sum(r[1] for r in rows) == k
        assert sum(r[2] for r in rows) == k


class TestBatchingProperties:
    @SET
    @given(n=st.integers(1, 500), mx=st.sampled_from([4, 16, 64]))
    def test_ladder_partitions_exactly(self, n, mx):
        sizes = Bucketizer.batch_ladder(n, mx)
        # covers all n items; every chunk a power of two <= max
        assert sum(min(s, n - sum(sizes[:i])) for i, s in enumerate(sizes)) >= 0
        covered = 0
        for s in sizes:
            assert s <= mx and (s & (s - 1)) == 0
            covered += s
        assert covered >= n and covered - n < mx

    @SET
    @given(n=st.integers(1, 8192))
    def test_bucket_dim_monotone_and_covers(self, n):
        d = bucket_dim(n)
        assert d >= n
        assert d % 128 == 0


class TestHostShardProperties:
    @SET
    @given(total=st.integers(0, 500), n=st.integers(1, 16))
    def test_partition_complete_disjoint_balanced(self, total, n):
        items = list(range(total))
        shards = [host_shard(items, p, n) for p in range(n)]
        assert sorted(sum(shards, [])) == items
        lens = [len(s) for s in shards]
        assert max(lens) - min(lens) <= 1


class TestGeometryProperties:
    @SET
    @given(
        h=st.integers(8, 60), w=st.integers(8, 60),
        seed=st.integers(0, 1000),
    )
    def test_double_flip_is_identity(self, h, w, seed):
        rng = np.random.default_rng(seed)
        from image_processor_pipeline_tpu.io.batching import canvas_for, pad_to_canvas

        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = jnp.asarray(pad_to_canvas(arr, canvas_for(h, w)))
        out = np.asarray(geometry.flip_h(geometry.flip_h(img, h, w), h, w))
        np.testing.assert_array_equal(out[:h, :w], arr)
        out2 = np.asarray(geometry.flip_v(geometry.flip_v(img, h, w), h, w))
        np.testing.assert_array_equal(out2[:h, :w], arr)

    @SET
    @given(
        angle=st.floats(1.0, 359.0),
        seed=st.integers(0, 1000),
    )
    def test_shear_rotation_preserves_pixel_multiset(self, angle, seed):
        """Shears are permutations: content strictly inside the frame keeps
        its exact pixel multiset through any rotation."""
        S = 64
        rng = np.random.default_rng(seed)
        img = np.zeros((S, S, 3), np.uint8)
        img[24:40, 24:40] = rng.integers(1, 256, (16, 16, 3), dtype=np.uint8)
        out = np.asarray(geometry.rotate_square_shear(jnp.asarray(img), angle))
        in_vals = np.sort(img[img.sum(-1) > 0].reshape(-1))
        out_vals = np.sort(out[out.sum(-1) > 0].reshape(-1))
        np.testing.assert_array_equal(in_vals, out_vals)
