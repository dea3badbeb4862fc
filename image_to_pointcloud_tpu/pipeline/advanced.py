"""Advanced pipeline configurations (BASELINE.json configs 3–5).

The reference tops out at one downscaled single-image forward
(backend/app.py:438-460); these pipelines are where the TPU framework
goes beyond it:

* :class:`MetricPipeline` — metric-depth model (real ZoeDepth: BEiT +
  adaptive metric bins, models/zoedepth.py; or the DA-metric sigmoid
  head) + real camera intrinsics → metric-scale colorized cloud
  (config 3). No normalization: predicted depth IS z.
* :class:`HighResPipeline` — tiled 1024²+ inference: overlapping
  model-native tiles run as one data-parallel batch, per-tile depths are
  affine-aligned to a global anchor pass and feather-blended, the full-
  resolution cloud is voxel-downsampled to a point budget (config 4).
* :class:`VideoPipeline` — frame clips as temporal batches: one batched
  forward per clip, per-frame unprojection, fused multi-frame cloud via
  voxel-grid fusion (config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from image_to_pointcloud_tpu.models.depth_anything import (
    DepthAnythingConfig,
)
from image_to_pointcloud_tpu.ops import (
    normalize_depth,
    unproject,
    voxel_downsample,
)
from image_to_pointcloud_tpu.ops.resize import resize_batched
from image_to_pointcloud_tpu.ops.unproject import unproject_intrinsics
from image_to_pointcloud_tpu.parallel.tiling import (
    blend_tiles,
    extract_tiles,
    plan_tiles,
)
from image_to_pointcloud_tpu.pipeline.preprocess import (
    model_preprocess_spec,
    preprocess_for_model,
    processor_output_size,
)

__all__ = ["CameraIntrinsics", "MetricPipeline", "HighResPipeline", "VideoPipeline"]


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def from_fov(cls, h: int, w: int, fov_deg: float) -> "CameraIntrinsics":
        import math

        f = (w / 2.0) / math.tan(math.radians(fov_deg) / 2.0)
        return cls(fx=f, fy=f, cx=w / 2.0, cy=h / 2.0)


class MetricPipeline:
    """Metric depth + real intrinsics → metric-scale point cloud.

    With ``quantized_transfer`` (default on accelerators, the same
    depth16 contract as DepthPipeline) only a u16-quantized metric
    depth + bit-packed keep mask + the per-image max-depth scalar cross
    the device→host link as ONE uint8 buffer (~0.6 MB at 518²/step 1
    instead of the 7.5 MB packed f32 cloud — 13× fewer bytes on a link
    that serializes transfers at ~20-50 MB/s); the host reconstructs
    x=(u-cx)·z/fx exactly, with z error ≤ max_depth/2¹⁶ and colors
    from its own copy of the image."""

    def __init__(
        self,
        cfg: DepthAnythingConfig,
        params: Any,
        model_target: int | tuple[int, int] | None = None,
        *,
        quantized_transfer: bool | None = None,
    ):
        from image_to_pointcloud_tpu.models import build_model
        from image_to_pointcloud_tpu.pipeline.graph import (
            default_quantized_transfer,
        )

        assert cfg.neck.metric_depth, "MetricPipeline needs a metric head"
        self.cfg = cfg
        self.model = build_model(cfg)
        self.params = params
        (
            self.model_target,
            self.size_multiple,
            self.pixel_mean,
            self.pixel_std,
            self.resize_method,
            self.keep_aspect,
        ) = model_preprocess_spec(cfg, model_target)
        if quantized_transfer is None:
            quantized_transfer = default_quantized_transfer()
        self.quantized_transfer = quantized_transfer
        # Same 12-bit packed depth default (and IPC_TPU_DEPTH16=1
        # escape hatch) as DepthPipeline; PARITY.md deviation 12.
        import os as _os

        self.depth_bits = (
            16 if _os.environ.get("IPC_TPU_DEPTH16") == "1" else 12
        )
        self._compiled: dict = {}

    def _fn(self, b: int, h: int, w: int, step: int):
        key = (b, h, w, step)
        if key in self._compiled:
            return self._compiled[key]
        from image_to_pointcloud_tpu.pipeline.preprocess import (
            reflect_pad_margins,
        )

        pad_h, pad_w = reflect_pad_margins(self.cfg, h, w)
        hp, wp = h + 2 * pad_h, w + 2 * pad_w
        mh, mw = processor_output_size(
            hp, wp, self.model_target, multiple=self.size_multiple,
            keep_aspect_ratio=self.keep_aspect,
        )

        @jax.jit
        def fn(params, imgs_u8, fx, fy, cx, cy):
            img = imgs_u8.astype(jnp.float32)  # (B, h, w, 3)
            img_in = img
            if pad_h or pad_w:
                # ZoeDepth reflect pad + post-process crop (boundary
                # artifact fix, image_processing_zoedepth.py).
                img_in = jnp.pad(
                    img,
                    ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                    mode="reflect",
                )
            x = preprocess_for_model(
                img_in, (mh, mw), mean=self.pixel_mean, std=self.pixel_std,
                method=self.resize_method,
            )
            depth = self.model.apply({"params": params}, x)  # (B, mh, mw)
            if pad_h or pad_w:
                d4 = resize_batched(
                    depth[..., None], (hp, wp), "bicubic_torch"
                )
                d = d4[:, pad_h : hp - pad_h, pad_w : wp - pad_w, 0]
            else:
                d = resize_batched(
                    depth[:, :, :, None], (h, w), "linear"
                )[:, :, :, 0]
            if not self.quantized_transfer:
                return jax.vmap(
                    lambda dd, im, a, g, c, e: unproject_intrinsics(
                        dd, im, fx=a, fy=g, cx=c, cy=e, step=step
                    )
                )(d, img, fx, fy, cx, cy)  # (B, 8, N)
            # Quantized metric bundle, one u8 row per image (the relay
            # charges ~25 ms latency per serialized transfer — see
            # DepthPipeline's bundle): [packed depth | keep bits |
            # per-image maxd f32 bytes]. Depth is normalized per image
            # by its own max and packed at depth_bits precision.
            from image_to_pointcloud_tpu.pipeline.graph import (
                pack_depth12,
                pack_keep_bits,
            )

            ds = d[:, ::step, ::step]
            bq = ds.shape[0]
            keep = (ds > 0.0).reshape(bq, -1)
            maxd = jnp.maximum(
                jnp.max(ds.reshape(bq, -1), axis=1), 1e-12
            )  # (B,)
            dn = jnp.clip(ds / maxd[:, None, None], 0.0, 1.0)
            if self.depth_bits == 12:
                depth_sec = pack_depth12(dn)
            else:
                d16 = jnp.round(dn * 65535.0).astype(jnp.uint16)
                depth_sec = jax.lax.bitcast_convert_type(
                    d16, jnp.uint8
                ).reshape(bq, -1)
            return jnp.concatenate(
                [
                    depth_sec,
                    pack_keep_bits(keep),
                    jax.lax.bitcast_convert_type(
                        maxd.astype(jnp.float32)[:, None], jnp.uint8
                    ).reshape(bq, 4),
                ],
                axis=1,
            )

        self._compiled[key] = fn
        return fn

    def run_batch(
        self,
        images_rgb_u8: "np.ndarray | list[np.ndarray]",
        intrinsics: "CameraIntrinsics | list[CameraIntrinsics]",
        *,
        step: int = 1,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Batched metric conversion (BASELINE config 3, batched): one
        fused dispatch for B same-size images with per-image intrinsics
        → [(points (M,3) metric, colors (M,3)), ...]."""
        imgs = np.stack(images_rgb_u8)
        b, h, w = imgs.shape[:3]
        if isinstance(intrinsics, CameraIntrinsics):
            intrinsics = [intrinsics] * b
        fx = np.asarray([i.fx for i in intrinsics], np.float32)
        fy = np.asarray([i.fy for i in intrinsics], np.float32)
        cx = np.asarray([i.cx for i in intrinsics], np.float32)
        cy = np.asarray([i.cy for i in intrinsics], np.float32)
        fn = self._fn(b, h, w, step)
        out = np.asarray(
            fn(
                self.params, jnp.asarray(imgs), jnp.asarray(fx),
                jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy),
            )
        )
        results: list[tuple[np.ndarray, np.ndarray]] = []
        if not self.quantized_transfer:
            for i in range(b):
                packed = out[i]
                keep = packed[6] > 0.5
                results.append((packed[:3].T[keep], packed[3:6].T[keep]))
            return results
        hh = -(-h // step)
        ww = -(-w // step)
        n = hh * ww
        nb = -(-n // 8)
        if self.depth_bits == 12:
            from image_to_pointcloud_tpu.pipeline.graph import unpack_depth12

            dsec = 3 * (-(-n // 2))
            denom = 4095.0
            dq = unpack_depth12(out[:, :dsec], n)
        else:
            dsec = n * 2
            denom = 65535.0
            dq = np.ascontiguousarray(out[:, :dsec]).view(np.uint16)
        keep_all = np.unpackbits(
            np.ascontiguousarray(out[:, dsec : dsec + nb]),
            axis=-1,
            bitorder="little",
        )[:, :n].astype(bool)
        maxd = (
            np.ascontiguousarray(out[:, dsec + nb : dsec + nb + 4])
            .view(np.float32)
            .reshape(b)
        )
        for i in range(b):
            keep = keep_all[i]
            z = dq[i].astype(np.float32).reshape(hh, ww) * np.float32(
                float(maxd[i]) / denom
            )
            u = (
                np.arange(ww, dtype=np.float32) * step - np.float32(cx[i])
            )[None, :]
            v = (
                np.arange(hh, dtype=np.float32) * step - np.float32(cy[i])
            )[:, None]
            x = (u * z / np.float32(fx[i])).reshape(n)
            y = (v * z / np.float32(fy[i])).reshape(n)
            # Filter each 1-D column before stacking — skips the (n,3)
            # temporary and stack's output is already contiguous.
            pts = np.stack([x[keep], y[keep], z.reshape(n)[keep]], axis=1)
            cols = (
                imgs[i, ::step, ::step, :]
                .reshape(n, 3)[keep]
                .astype(np.float32)
            )
            results.append((pts, cols))
        return results

    def run(
        self,
        image_rgb_u8: np.ndarray,
        intrinsics: CameraIntrinsics,
        *,
        step: int = 1,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (points (M,3) metric, colors (M,3))."""
        return self.run_batch(image_rgb_u8[None], [intrinsics], step=step)[0]


class HighResPipeline:
    """Tiled high-resolution depth → blended cloud → voxel budget.

    With ``quantized_transfer`` (default on accelerators) and the native
    library available, only the 12-bit packed blended DEPTH GRID crosses
    the device→host link (1.5 B/pixel — ~1.6 MB at 1024² instead of the
    ~9 MB u16-xyz voxel payload or the 33 MB f32 cloud); the host
    reconstructs points exactly (z error ≤ depth_scale/4095), gathers
    colors from its own copy of the image, and voxel-averages in C++
    (native/src/voxel.cpp, same Open3D grid rule and output order as the
    device kernel). Quantization error is ≤ budget^⅓/4095 of a voxel —
    ~2.4 % at a 1M budget — so voxel assignment is effectively
    unchanged. Without native, the prior device path runs: on-device
    voxel downsample + bbox-normalized u16 XYZ + u8 RGB payload
    (9 B/point; position error ≤ extent/2¹⁶).
    """

    def __init__(
        self,
        cfg: DepthAnythingConfig,
        params: Any,
        *,
        tile: int = 518,
        overlap: int = 128,
        model_target: int | tuple[int, int] | None = None,
        quantized_transfer: bool | None = None,
    ):
        from image_to_pointcloud_tpu.models import build_model

        self.model = build_model(cfg)
        self.params = params
        self.tile = tile
        self.overlap = overlap
        (
            self.model_target,
            self.size_multiple,
            self.pixel_mean,
            self.pixel_std,
            self.resize_method,
            self.keep_aspect,
        ) = model_preprocess_spec(cfg, model_target)
        if quantized_transfer is None:
            from image_to_pointcloud_tpu.pipeline.graph import (
                default_quantized_transfer,
            )

            quantized_transfer = default_quantized_transfer()
        self.quantized_transfer = quantized_transfer
        # Same 12-bit packed depth default (and IPC_TPU_DEPTH16=1
        # escape hatch) as DepthPipeline; PARITY.md deviation 12.
        import os as _os

        self.depth_bits = (
            16 if _os.environ.get("IPC_TPU_DEPTH16") == "1" else 12
        )
        self._compiled: dict = {}

    def _fn(self, h: int, w: int, step: int, grid: bool = False):
        key = (h, w, step, grid)
        if key in self._compiled:
            return self._compiled[key]
        # Clamp to the image: a 640x480 photo with the default 518 tile
        # must tile at 480 (a dynamic_slice larger than the operand is an
        # error), and overlap must stay below the tile size.
        tile = min(self.tile, h, w)
        overlap = max(0, min(self.overlap, tile - 1))
        corners = plan_tiles(h, w, tile, overlap)
        mh, mw = processor_output_size(
            tile, tile, self.model_target, multiple=self.size_multiple,
            keep_aspect_ratio=self.keep_aspect,
        )
        ah, aw = processor_output_size(
            h, w, self.model_target, multiple=self.size_multiple,
            keep_aspect_ratio=self.keep_aspect,
        )

        @jax.jit
        def fn(params, img_u8, depth_scale):
            img = img_u8.astype(jnp.float32)

            # Global anchor pass at model resolution → upsampled to full.
            xa = preprocess_for_model(
                img[None], (ah, aw), mean=self.pixel_mean, std=self.pixel_std,
                method=self.resize_method,
            )
            anchor = self.model.apply({"params": params}, xa)
            anchor = resize_batched(anchor[:, :, :, None], (h, w), "linear")[
                0, :, :, 0
            ]

            # All tiles as one batch (DP over chips when mesh-sharded).
            tiles = extract_tiles(img, corners, tile)
            xt = preprocess_for_model(
                tiles, (mh, mw), mean=self.pixel_mean, std=self.pixel_std,
                method=self.resize_method,
            )
            td = self.model.apply({"params": params}, xt)  # (T, mh, mw)
            td = resize_batched(
                td[:, :, :, None], (tile, tile), "linear"
            )[:, :, :, 0]

            depth = blend_tiles(td, corners, (h, w), anchor=anchor)
            dn = normalize_depth(depth, True)
            if grid:
                # Depth-grid transfer: ship the normalized blended depth
                # itself (12-bit packed, 1.5 B/px) and let the host
                # rebuild points + colors + run the voxel average
                # (native/src/voxel.cpp). Nothing else crosses the link.
                dn_s = dn[::step, ::step]
                if self.depth_bits == 12:
                    from image_to_pointcloud_tpu.pipeline.graph import (
                        pack_depth12,
                    )

                    return pack_depth12(dn_s[None])
                d16 = jnp.round(dn_s * 65535.0).astype(jnp.uint16)
                return jax.lax.bitcast_convert_type(d16, jnp.uint8).reshape(
                    1, -1
                )
            packed = unproject(
                dn, img, depth_scale=depth_scale, step=step, h=h, w=w
            )
            # Axis-aligned bbox of the cloud (2, 3): lets the host pick
            # the budget voxel size from 24 bytes instead of pulling the
            # whole f32 cloud first.
            bbox = jnp.stack(
                [jnp.min(packed[:3], axis=1), jnp.max(packed[:3], axis=1)]
            )
            return packed, bbox

        self._compiled[key] = fn
        return fn

    @staticmethod
    @jax.jit
    def _quantize_voxels(vp, vc, lo, hi):
        """(N,3) f32 points + colors → (N, 9) u8 [u16 xyz LE | u8 rgb]."""
        scale = jnp.where(hi > lo, hi - lo, 1.0)
        q = jnp.clip((vp - lo) / scale, 0.0, 1.0)
        xyz16 = jnp.round(q * 65535.0).astype(jnp.uint16)
        xyz8 = jax.lax.bitcast_convert_type(xyz16, jnp.uint8).reshape(
            vp.shape[0], 6
        )
        rgb8 = jnp.clip(jnp.round(vc), 0, 255).astype(jnp.uint8)
        return jnp.concatenate([xyz8, rgb8], axis=1)

    def run(
        self,
        image_rgb_u8: np.ndarray,
        *,
        depth_scale: float = 10.0,
        step: int = 1,
        voxel_budget: int | None = 1_000_000,
    ) -> tuple[np.ndarray, np.ndarray]:
        h, w = image_rgb_u8.shape[:2]
        if self.quantized_transfer:
            from image_to_pointcloud_tpu import native

            if native.available():
                out = self._run_depth_grid(
                    image_rgb_u8, depth_scale=depth_scale, step=step,
                    voxel_budget=voxel_budget,
                )
                if out is not None:
                    return out
        fn = self._fn(h, w, step)
        packed, bbox = fn(
            self.params, jnp.asarray(image_rgb_u8), jnp.float32(depth_scale)
        )
        pts = packed[:3].T
        cols = packed[3:6].T
        if voxel_budget is not None and pts.shape[0] > voxel_budget:
            # Voxel size targeting the budget: bbox volume heuristic
            # (24-byte device reduction), then one downsample pass on
            # device — the cloud itself never round-trips for sizing.
            lo, hi = np.asarray(bbox)
            extent = hi - lo
            vol = float(np.prod(np.maximum(extent, 1e-6)))
            voxel = (vol / voxel_budget) ** (1.0 / 3.0)
            vp, vc, valid, cnt = voxel_downsample(pts, cols, voxel)
            cnt = int(cnt)
            if self.quantized_transfer:
                # Slice on DEVICE before the transfer: cnt is already
                # host-synced, so [:cnt] is a static slice — pulling the
                # full N-slot capacity buffer first would ship ~16x the
                # bytes over the serialized relay link for a 1M budget.
                buf = np.asarray(
                    self._quantize_voxels(vp, vc, bbox[0], bbox[1])[:cnt]
                )
                xyz16 = (
                    np.ascontiguousarray(buf[:, :6])
                    .view(np.uint16)
                    .astype(np.float32)
                )
                scale = np.where(hi > lo, hi - lo, 1.0).astype(np.float32)
                points = xyz16 / np.float32(65535.0) * scale + lo.astype(
                    np.float32
                )
                return points, buf[:, 6:9].astype(np.float32)
            return np.asarray(vp[:cnt]), np.asarray(vc[:cnt])
        return np.asarray(pts), np.asarray(cols)

    def _run_depth_grid(
        self,
        image_rgb_u8: np.ndarray,
        *,
        depth_scale: float,
        step: int,
        voxel_budget: int | None,
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Depth-grid transfer path (native host half); None → caller
        falls back to the device-voxel path."""
        from image_to_pointcloud_tpu import native
        from image_to_pointcloud_tpu.ops.unproject import focal_length
        from image_to_pointcloud_tpu.pipeline.graph import unpack_depth12

        h, w = image_rgb_u8.shape[:2]
        fn = self._fn(h, w, step, grid=True)
        sec = np.asarray(
            fn(self.params, jnp.asarray(image_rgb_u8), jnp.float32(depth_scale))
        )  # (1, L) u8 — the only device→host transfer
        hh, ww = -(-h // step), -(-w // step)
        n = hh * ww
        if self.depth_bits == 12:
            d16 = unpack_depth12(sec, n).reshape(hh, ww)
            denom = 4095.0
        else:
            d16 = (
                np.ascontiguousarray(sec).view(np.uint16).reshape(hh, ww)
            )
            denom = 65535.0
        # ONE intrinsics rule (ops.unproject.focal_length) — identical
        # to the device unproject the non-grid path runs.
        f = float(focal_length(h, w, None))
        rec = native.reconstruct_points(
            d16,
            np.ones((hh, ww), bool),
            image_rgb_u8[::step, ::step, :],
            step=step,
            depth_scale=float(depth_scale),
            f=f,
            cx=float(w / 2.0),
            cy=float(h / 2.0),
            denom=denom,
        )
        if rec is None:
            return None
        pts, cols = rec
        if voxel_budget is None or len(pts) <= voxel_budget:
            return pts, cols
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        extent = np.maximum(hi - lo, 1e-6)
        vol = float(np.prod(extent))
        voxel = (vol / voxel_budget) ** (1.0 / 3.0)
        return native.voxel_downsample(pts, cols, voxel)  # None → fallback


class VideoPipeline:
    """Temporal batches of frames → fused multi-frame cloud.

    With ``quantized_transfer`` (default on accelerators) the unfused
    path ships only the 12-bit packed strided depth (1.5 B per point
    instead of a 32 B packed column; ``IPC_TPU_DEPTH16=1`` restores the
    2 B u16 contract) over the device→host link, and the host
    reconstructs points exactly (z error ≤ depth_scale/4095, u16:
    /2¹⁶) with colors taken from its own frames — the same contract as
    DepthPipeline's bundle. Voxel-fused runs (``fuse_voxel``) keep the
    full on-device path.
    """

    def __init__(
        self,
        cfg: DepthAnythingConfig,
        params: Any,
        model_target: int | tuple[int, int] | None = None,
        *,
        quantized_transfer: bool | None = None,
    ):
        from image_to_pointcloud_tpu.models import build_model

        self.model = build_model(cfg)
        self.params = params
        (
            self.model_target,
            self.size_multiple,
            self.pixel_mean,
            self.pixel_std,
            self.resize_method,
            self.keep_aspect,
        ) = model_preprocess_spec(cfg, model_target)
        if quantized_transfer is None:
            from image_to_pointcloud_tpu.pipeline.graph import (
                default_quantized_transfer,
            )

            quantized_transfer = default_quantized_transfer()
        self.quantized_transfer = quantized_transfer
        # Same 12-bit packed depth default (and IPC_TPU_DEPTH16=1
        # escape hatch) as DepthPipeline; PARITY.md deviation 12.
        import os as _os

        self.depth_bits = (
            16 if _os.environ.get("IPC_TPU_DEPTH16") == "1" else 12
        )
        self._compiled: dict = {}

    def _fn(self, t: int, h: int, w: int, step: int, quant: bool = False):
        key = (t, h, w, step, quant)
        if key in self._compiled:
            return self._compiled[key]
        mh, mw = processor_output_size(
            h, w, self.model_target, multiple=self.size_multiple,
            keep_aspect_ratio=self.keep_aspect,
        )

        @jax.jit
        def fn(params, frames_u8, depth_scale):
            img = frames_u8.astype(jnp.float32)  # (T, h, w, 3)
            x = preprocess_for_model(
                img, (mh, mw), mean=self.pixel_mean, std=self.pixel_std,
                method=self.resize_method,
            )
            depth = self.model.apply({"params": params}, x)  # (T, mh, mw)
            d = resize_batched(depth[:, :, :, None], (h, w), "linear")[..., 0]
            dn = jax.vmap(lambda dd: normalize_depth(dd, True))(d)
            if quant:
                dn_s = dn[:, ::step, ::step]
                if self.depth_bits == 12:
                    from image_to_pointcloud_tpu.pipeline.graph import (
                        pack_depth12,
                    )

                    return pack_depth12(dn_s)  # (T, 3·ceil(n/2)) u8
                return jnp.round(dn_s * 65535.0).astype(jnp.uint16)
            packed = jax.vmap(
                lambda dd, im: unproject(
                    dd, im, depth_scale=depth_scale, step=step, h=h, w=w
                )
            )(dn, img)
            return packed  # (T, 8, N)

        self._compiled[key] = fn
        return fn

    def run(
        self,
        frames_rgb_u8: np.ndarray,
        *,
        depth_scale: float = 10.0,
        step: int = 2,
        fuse_voxel: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(T, H, W, 3) clip → fused (points, colors)."""
        t, h, w = frames_rgb_u8.shape[:3]
        if fuse_voxel is None and self.quantized_transfer:
            fn = self._fn(t, h, w, step, quant=True)
            out = np.asarray(
                fn(
                    self.params,
                    jnp.asarray(frames_rgb_u8),
                    jnp.float32(depth_scale),
                )
            )  # 12-bit packed (T, 3·⌈n/2⌉) u8, or (T, hh, ww) u16 —
            #    either way the only device→host transfer
            hh, ww = -(-h // step), -(-w // step)
            n = hh * ww
            if self.depth_bits == 12:
                from image_to_pointcloud_tpu.pipeline.graph import (
                    unpack_depth12,
                )

                d16 = unpack_depth12(out, n).reshape(-1, hh, ww)
                denom = 4095.0
            else:
                d16 = out
                denom = 65535.0
            tt = d16.shape[0]
            from image_to_pointcloud_tpu.ops.unproject import focal_length

            # ONE intrinsics rule (ops.unproject.focal_length), same as
            # the device path and DepthPipeline.collect — re-hardcoding
            # max(h,w)*1.2 here would silently diverge if FOV support
            # or the heuristic ever changes.
            f = np.float32(focal_length(h, w, None))
            cx, cy = np.float32(w / 2.0), np.float32(h / 2.0)
            from image_to_pointcloud_tpu import native

            if native.available():
                # Fused C++ dequant+unproject+color-gather: the numpy
                # fallback below makes ~10 full passes over the clip's
                # 2M-point arrays, which on a 1-core host costs more
                # than the transfer it saves.
                keep = np.ones((hh, ww), bool)
                rgbs = frames_rgb_u8[:, ::step, ::step, :]
                parts = [
                    native.reconstruct_points(
                        d16[i],
                        keep,
                        rgbs[i],
                        step=step,
                        depth_scale=float(depth_scale),
                        f=float(f),
                        cx=float(cx),
                        cy=float(cy),
                        denom=denom,
                    )
                    for i in range(tt)
                ]
                return (
                    np.concatenate([p for p, _ in parts]),
                    np.concatenate([c for _, c in parts]),
                )

            # Shared host half of the depth16 contract (one
            # implementation with DepthPipeline.collect).
            from image_to_pointcloud_tpu.pipeline.graph import depth16_to_xyz

            xyz = depth16_to_xyz(
                d16,
                np.full((tt,), depth_scale, np.float32),
                step=step,
                f=float(f),
                cx=float(cx),
                cy=float(cy),
                denom=denom,
            )
            pts = xyz.transpose(0, 2, 1).reshape(tt * n, 3)
            cols = (
                frames_rgb_u8[:, ::step, ::step, :]
                .reshape(tt * n, 3)
                .astype(np.float32)
            )
            return pts, cols
        fn = self._fn(t, h, w, step)
        packed = fn(self.params, jnp.asarray(frames_rgb_u8), jnp.float32(depth_scale))
        tt, _, n = packed.shape
        pts = packed[:, :3, :].transpose(0, 2, 1).reshape(tt * n, 3)
        cols = packed[:, 3:6, :].transpose(0, 2, 1).reshape(tt * n, 3)
        if fuse_voxel is not None:
            vp, vc, valid, cnt = voxel_downsample(pts, cols, fuse_voxel)
            cnt = int(cnt)
            return np.asarray(vp[:cnt]), np.asarray(vc[:cnt])
        return np.asarray(pts), np.asarray(cols)
