"""Split sparse coefficient payload (ops/jpeg_sparse.py): pack/scatter
roundtrip is bit-identical to the dense hybrid payload, padding slots
are inert, the int8-AC exception side channel restores wide values
exactly, and the byte accounting that gates engagement is honest.

Capability slot: the H2D half of the reference's upload ingest
(backend/app.py:433) — same fidelity contract as ops/jpeg.py, fewer
bytes on the wire.
"""

import io
import sys
from pathlib import Path

import numpy as np
import pytest

from image_to_pointcloud_tpu import native
from image_to_pointcloud_tpu.ops import jpeg as devjpeg
from image_to_pointcloud_tpu.ops import jpeg_sparse as sp

sys.path.insert(0, str(Path(__file__).parent))


def _spec(w, h, ncomp=3, hv=((2, 1, 1), (2, 1, 1)), k=8):
    return devjpeg.JpegSpec(w, h, ncomp, hv[0][:ncomp], hv[1][:ncomp], k)


def _random_coeffs(spec, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        vals = rng.integers(-1024, 1024, (bh, bw, spec.k, spec.k))
        mask = rng.random(vals.shape) < density
        out.append((vals * mask).astype(np.int16))
    return out


def _pad_and_scatter(packed, spec):
    """Pad to the capacity buckets exactly as the payload packer does,
    then run the device scatter."""
    counts, dc, pos, val, exc_idx, exc_val = packed
    _, total = sp.coeff_layout(spec)
    cap = sp.capacity_bucket(len(pos), total)
    ecap = sp.exception_bucket(len(exc_idx))
    ppos = np.zeros(cap, np.uint8)
    pval = np.zeros(cap, np.int8)
    ppos[: len(pos)] = pos
    pval[: len(val)] = val
    pei = np.full(ecap, cap, np.int32)
    pei[: len(exc_idx)] = exc_idx
    pev = np.zeros(ecap, np.int16)
    pev[: len(exc_val)] = exc_val
    return sp.scatter_from_blocks(
        counts.astype(np.int32),
        dc,
        ppos.astype(np.int32),
        pval,
        pei,
        pev,
        spec,
    )


class TestPackScatter:
    @pytest.mark.parametrize(
        "w,h,ncomp,k", [(250, 179, 3, 8), (250, 179, 3, 2), (64, 64, 1, 8)]
    )
    def test_roundtrip_bit_identical(self, w, h, ncomp, k):
        # ±1024 random coefficients: most AC nonzeros are WIDE, so this
        # also hammers the exception channel.
        spec = _spec(w, h, ncomp, k=k)
        coeffs = _random_coeffs(spec, seed=ncomp * k)
        packed = sp.block_pack(coeffs)
        counts, dc, pos, val, exc_idx, exc_val = packed
        _, total = sp.coeff_layout(spec)
        assert total == sum(c.size for c in coeffs)
        assert counts.sum() == len(pos) == len(val)
        assert len(counts) == len(dc) == total // (k * k)
        assert pos.min() >= 1  # DC never rides the AC stream
        back = _pad_and_scatter(packed, spec)
        for a, b in zip(coeffs, back):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_all_zero_image(self):
        spec = _spec(64, 48, ncomp=1)
        coeffs = [np.zeros(spec.block_grid(0) + (8, 8), np.int16)]
        packed = sp.block_pack(coeffs)
        assert packed[2].size == 0 and packed[4].size == 0
        back = _pad_and_scatter(packed, spec)
        assert not np.asarray(back[0]).any()

    def test_narrow_ac_has_no_exceptions(self):
        # Values inside int8 ride the 1-byte stream alone.
        spec = _spec(80, 64, ncomp=1)
        rng = np.random.default_rng(7)
        c = (
            rng.integers(-128, 128, spec.block_grid(0) + (8, 8))
            * (rng.random(spec.block_grid(0) + (8, 8)) < 0.2)
        ).astype(np.int16)
        c[..., 0, 0] = rng.integers(-900, 900, spec.block_grid(0))  # wide DC ok
        packed = sp.block_pack([c])
        assert packed[4].size == 0  # no exceptions
        back = _pad_and_scatter(packed, spec)
        np.testing.assert_array_equal(c, np.asarray(back[0]))

    def test_exception_boundaries(self):
        # ±128 edge cases: -128 fits int8, +128 and beyond do not.
        spec = _spec(32, 8, ncomp=1, hv=((1,), (1,)))  # 1x4 blocks
        c = np.zeros((1, 4, 8, 8), np.int16)
        c[0, 0, 0, 1] = -128
        c[0, 1, 0, 1] = 127
        c[0, 2, 0, 1] = 128
        c[0, 2, 3, 3] = -129
        c[0, 3, 7, 7] = 1023
        c[0, 3, 0, 0] = -1024  # DC: dense i16, never an exception
        packed = sp.block_pack([c])
        counts, dc, pos, val, exc_idx, exc_val = packed
        assert len(exc_idx) == 3
        np.testing.assert_array_equal(np.sort(exc_val), [-129, 128, 1023])
        assert dc[3] == -1024
        back = _pad_and_scatter(packed, spec)
        np.testing.assert_array_equal(c, np.asarray(back[0]))

    def test_dense_fallback_capacity(self):
        # Pathological (all-nonzero) coefficients: the bucket caps at
        # the dense size and the roundtrip still holds.
        spec = _spec(40, 40, ncomp=1)
        coeffs = _random_coeffs(spec, density=1.0, seed=3)
        coeffs[0][coeffs[0] == 0] = 1
        packed = sp.block_pack(coeffs)
        counts, dc, pos, val, exc_idx, exc_val = packed
        _, total = sp.coeff_layout(spec)
        assert sp.capacity_bucket(len(pos), total) == total
        assert (counts == 63).all()  # 64 minus the DC slot
        back = _pad_and_scatter(packed, spec)
        np.testing.assert_array_equal(coeffs[0], np.asarray(back[0]))


class TestByteAccounting:
    def test_bucket_pow2_with_midstep(self):
        assert sp.capacity_bucket(0, 10**9) == 1024
        assert sp.capacity_bucket(1024, 10**9) == 1024
        assert sp.capacity_bucket(1025, 10**9) == 1536
        assert sp.capacity_bucket(1537, 10**9) == 2048
        assert sp.capacity_bucket(3000, 10**9) == 3072
        assert sp.capacity_bucket(5000, 4096) == 4096

    def test_exception_bucket_steps(self):
        assert sp.exception_bucket(0) == 16
        assert sp.exception_bucket(16) == 16
        assert sp.exception_bucket(17) == 64
        assert sp.exception_bucket(65) == 256

    def test_buckets_bound_padding_waste(self):
        for nnz in range(1024, 300000, 997):
            cap = sp.capacity_bucket(nnz, 10**9)
            assert nnz <= cap <= int(nnz * 1.5) + 1

    def test_real_photo_beats_pixels(self):
        # A quality-85 photo-like JPEG at full scale (k=8) must ship
        # well under 40% of its raw pixel bytes — the point of the
        # split layout (the previous 3B/nnz layout measured ~0.5x,
        # dense k=8 is ~pixel-sized).
        if not native.available():
            pytest.skip("native toolchain unavailable")
        from PIL import Image

        from test_jpeg_hybrid import _photo

        img = _photo(518, 518)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        r = native.jpeg_coefficients(buf.getvalue())
        spec = _spec(518, 518, hv=(tuple(r["h"]), tuple(r["v"])))
        coeffs = [devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]]
        _, _, pos, _, exc_idx, _ = sp.block_pack(coeffs)
        _, total = sp.coeff_layout(spec)
        pixel_bytes = 518 * 518 * 3
        assert (
            sp.sparse_payload_bytes(len(pos), len(exc_idx), total)
            < 0.40 * pixel_bytes
        )


class TestRowSections:
    def test_alignment_and_no_overlap(self):
        """Every section starts on the 512-byte lane-tile boundary the
        device reader relies on, sections never overlap, and sizes
        match the typed-field byte widths."""
        for w, h, ncomp, k, cap, ecap in [
            (518, 518, 3, 8, 73728, 16),
            (250, 179, 3, 2, 1024, 16),
            (64, 64, 1, 8, 1536, 64),
        ]:
            spec = _spec(w, h, ncomp, k=k) if ncomp == 3 else _spec(
                w, h, ncomp, hv=((1,), (1,)), k=k
            )
            sections, total_bytes = sp.sparse_row_sections(spec, cap, ecap)
            _, total = sp.coeff_layout(spec)
            nblocks = total // (k * k)
            expect_sizes = {
                "counts": nblocks, "dc_lo": nblocks, "dc_hi": nblocks,
                "pos": cap, "val": cap, "exc_idx": 4 * ecap,
                "exc_val": 2 * ecap, "qt": ncomp * 256, "scale": 4,
            }
            prev_end = 0
            for name, (off, size) in sections.items():
                assert off % 512 == 0, (name, off)
                assert off >= prev_end, (name, off, prev_end)
                assert size == expect_sizes[name], name
                prev_end = off + size
            assert total_bytes == prev_end

    def test_pack_respects_sections(self):
        """pack_jpeg_sparse_payload writes every field inside its
        declared section (zero bytes everywhere else in the gaps)."""
        import io

        if not native.available():
            pytest.skip("native toolchain unavailable")
        from PIL import Image

        from test_jpeg_hybrid import _photo

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            JpegInput,
            plan_sparse_batch,
        )

        buf = io.BytesIO()
        Image.fromarray(_photo(120, 88, seed=3)).save(buf, "JPEG", quality=85)
        r = native.jpeg_coefficients(buf.getvalue())
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], r["ncomp"], tuple(r["h"]),
            tuple(r["v"]), 8,
        )
        ji = JpegInput(
            spec=spec,
            coeffs=[devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]],
            qtables=r["qtables"].astype(np.float32),
        )
        caps = plan_sparse_batch([ji])
        assert caps is not None
        row = DepthPipeline.pack_jpeg_sparse_payload(
            [ji], np.asarray([10.0], np.float32), *caps
        )[0]
        sections, total_bytes = sp.sparse_row_sections(spec, *caps)
        assert len(row) == total_bytes
        covered = np.zeros(total_bytes, bool)
        for off, size in sections.values():
            covered[off : off + size] = True
        assert not row[~covered].any()  # alignment gaps are all zero
    def test_graph_outputs_bit_identical(self):
        """The full fused serving graph produces bit-identical packed
        points from the sparse payload and the dense payload of the
        same JPEG (the scatter is exact, so the graphs only differ in
        their ingest head)."""
        if not native.available():
            pytest.skip("native toolchain unavailable")
        import jax.numpy as jnp
        from PIL import Image

        from test_jpeg_hybrid import _photo
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            JpegInput,
            PipelineOptions,
            plan_sparse_batch,
        )

        _, model, variables = _build_pair(image_size=56)
        pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=56
        )
        buf = io.BytesIO()
        Image.fromarray(_photo(120, 88, seed=9)).save(
            buf, "JPEG", quality=90
        )
        r = native.jpeg_coefficients(buf.getvalue())
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], r["ncomp"], tuple(r["h"]),
            tuple(r["v"]), 8,
        )
        ji = JpegInput(
            spec=spec,
            coeffs=[devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]],
            qtables=r["qtables"].astype(np.float32),
        )
        caps = plan_sparse_batch([ji])
        assert caps is not None
        opts = PipelineOptions()
        scales = np.array([10.0], np.float32)
        fn_d = pipe.compiled_graph_jpeg(1, spec, opts, False)
        fn_s = pipe.compiled_graph_jpeg(1, spec, opts, False, sparse_cap=caps)
        out_d, _ = fn_d(
            pipe.params, jnp.asarray(pipe.pack_jpeg_payload([ji], scales))
        )
        out_s, _ = fn_s(
            pipe.params,
            jnp.asarray(pipe.pack_jpeg_sparse_payload([ji], scales, *caps)),
        )
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


class TestCapacityHysteresis:
    def test_smaller_batches_reuse_the_largest_cap(self):
        """submit_batch_jpeg never selects a smaller capacity than the
        spec has already used: without the ratchet, mixed-density
        traffic through the serving batcher makes every (batch bucket ×
        capacity bucket) pair its own minutes-long remote compile
        (observed as the round-3 long-poll serving collapse)."""
        if not native.available():
            pytest.skip("native toolchain unavailable")
        import io

        from PIL import Image

        from test_jpeg_hybrid import _photo
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            plan_jpeg_input,
        )

        _, model, variables = _build_pair(image_size=56)
        pipe = DepthPipeline(model.cfg, variables["params"], model_target=56)

        def plan(quality):
            buf = io.BytesIO()
            Image.fromarray(_photo(250, 180, seed=1)).save(
                buf, "JPEG", quality=quality, subsampling=2
            )
            return plan_jpeg_input(buf.getvalue())

        dense = plan(95)  # more nonzeros
        sparse = plan(60)  # fewer nonzeros
        assert dense is not None and sparse is not None
        assert dense.spec == sparse.spec
        assert len(dense.pos) > len(sparse.pos)

        h1 = pipe.submit_batch_jpeg([dense], want_preview=False)
        cap_after_dense = pipe._sparse_caps[dense.spec]
        h2 = pipe.submit_batch_jpeg([sparse], want_preview=False)
        assert pipe._sparse_caps[sparse.spec] == cap_after_dense
        # One compiled signature serves both batches (no second build).
        jpeg_keys = [k for k in pipe._compiled if k[0] == "depth-jpeg"]
        assert len(jpeg_keys) == 1
        for h in (h1, h2):
            res = pipe.collect(h, want_preview=False, want_packed=False)
            assert res[0].kept_point_count > 0


class TestDecodeEquivalence:
    def test_sparse_equals_dense_decode(self):
        """decode via blocked scatter == decode via dense coeffs,
        bit-identical (same grids in, same jitted math)."""
        if not native.available():
            pytest.skip("native toolchain unavailable")
        from PIL import Image

        from test_jpeg_hybrid import _photo

        img = _photo(251, 180, seed=5)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=80)
        r = native.jpeg_coefficients(buf.getvalue())
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], r["ncomp"], tuple(r["h"]),
            tuple(r["v"]), 8,
        )
        qt = r["qtables"].astype(np.float32)
        coeffs = tuple(
            devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]
        )
        dense = np.asarray(devjpeg.decode_jpeg_to_rgb(coeffs, qt, spec))
        packed = sp.block_pack(list(coeffs))
        back = _pad_and_scatter(packed, spec)
        sparse = np.asarray(devjpeg.decode_jpeg_to_rgb(tuple(back), qt, spec))
        np.testing.assert_array_equal(dense, sparse)


class TestGatherVariant:
    """gather_from_blocks (the MXU densify, IPC_TPU_JPEG_GATHER=1) must
    be bit-identical to scatter_from_blocks on every case the scatter
    is tested on — wide exceptions, pads, k<8, grayscale, all-zero."""

    @pytest.mark.parametrize(
        "w,h,ncomp,k,density",
        [
            (250, 179, 3, 8, 0.1),   # wide values → exception channel
            (250, 179, 3, 2, 0.1),   # scaled decode
            (64, 64, 1, 8, 0.1),     # grayscale
            (128, 96, 3, 8, 0.0),    # all-zero AC
            (250, 179, 3, 1, 0.1),   # k=1 DC-only
        ],
    )
    def test_matches_scatter(self, w, h, ncomp, k, density):
        spec = _spec(w, h, ncomp, k=k)
        coeffs = _random_coeffs(spec, density=density, seed=ncomp + k)
        packed = sp.block_pack(coeffs)
        counts, dc, pos, val, exc_idx, exc_val = packed
        _, total = sp.coeff_layout(spec)
        cap = sp.capacity_bucket(len(pos), total)
        ecap = sp.exception_bucket(len(exc_idx))
        ppos = np.zeros(cap, np.uint8)
        pval = np.zeros(cap, np.int8)
        ppos[: len(pos)] = pos
        pval[: len(val)] = val
        pei = np.full(ecap, cap, np.int32)
        pei[: len(exc_idx)] = exc_idx
        pev = np.zeros(ecap, np.int16)
        pev[: len(exc_val)] = exc_val
        args = (
            counts.astype(np.int32),
            dc,
            ppos.astype(np.int32),
            pval,
            pei,
            pev,
            spec,
        )
        a = sp.scatter_from_blocks(*args)
        b = sp.gather_from_blocks(*args)
        assert len(a) == len(b)
        for c, (ga, gb) in enumerate(zip(a, b)):
            np.testing.assert_array_equal(
                np.asarray(ga), np.asarray(gb), err_msg=f"component {c}"
            )
        # And both equal the original truncated coefficients.
        for c, ga in enumerate(a):
            np.testing.assert_array_equal(np.asarray(ga), coeffs[c])
