"""The fused image→point-cloud graphs: one jitted program per pipeline.

This is the TPU-native replacement for the reference's
``process_image_pipeline`` compute stages (backend/app.py:419-559): where
the reference chains cv2 → torch → numpy-loop → Open3D through host
memory, here a single jitted XLA program runs

  uint8 RGB → [area-downscale] → bicubic+normalize → ViT-DPT forward →
  depth-preview colorize → linear depth upscale → robust normalize →
  [gaussian blur] → pinhole unprojection → packed point buffer →
  statistical outlier mask

entirely on device, returning the packed planar point buffer, the keep
mask, and the colorized preview in one transfer. Graphs are compiled per
static shape signature and cached.

Dummy-model paths (triposr / instantmesh, backend/app.py:567-607) are
reproduced as their own small jitted graphs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from image_to_pointcloud_tpu.models.depth_anything import (
    DepthAnything,
    DepthAnythingConfig,
)
from image_to_pointcloud_tpu.ops import (
    apply_colormap,
    gaussian_blur,
    normalize_depth,
    statistical_outlier_mask,
    unproject,
)
from image_to_pointcloud_tpu.ops.resize import resize_batched
from image_to_pointcloud_tpu.pipeline.preprocess import (
    preprocess_for_model,
    processor_output_size,
)

__all__ = ["PipelineOptions", "PipelineResult", "DepthPipeline", "dummy_point_cloud_graph"]

MAX_IMAGE_DIM = 3072  # reference backend/app.py:43
DEPTH_PREVIEW_MAX = 2048  # reference backend/app.py:44


@dataclasses.dataclass(frozen=True)
class PipelineOptions:
    """Static knobs of a compiled pipeline (the ``ProcessingRequest`` fields
    that shape the graph; reference backend/app.py:47-56)."""

    density: str = "medium"
    invert_depth: bool = True
    smooth_depth: bool = False
    smooth_ksize: int = 5
    fov: float | None = None
    refine: bool = True  # statistical outlier removal on/off


@dataclasses.dataclass
class PipelineResult:
    points: np.ndarray  # (M, 3) float32, outliers removed
    colors: np.ndarray  # (M, 3) float32 RGB 0-255
    depth_preview_rgb: np.ndarray | None  # (ph, pw, 3) uint8
    raw_point_count: int
    kept_point_count: int
    packed: np.ndarray | None = None  # (8, N) planar buffer (grid-ordered)
    grid_hw: tuple[int, int] | None = None  # strided grid shape (hh, ww)


def _preview_hw(h: int, w: int) -> tuple[int, int]:
    m = max(h, w)
    if m <= DEPTH_PREVIEW_MAX:
        return h, w
    s = DEPTH_PREVIEW_MAX / float(m)
    return int(round(h * s)), int(round(w * s))


def _proc_hw(h: int, w: int) -> tuple[int, int]:
    """Post-downscale working size (reference backend/app.py:438-445)."""
    m = max(h, w)
    if m <= MAX_IMAGE_DIM:
        return h, w
    s = MAX_IMAGE_DIM / float(m)
    return int(round(h * s)), int(round(w * s))


def depth_to_packed_points(
    depth: jax.Array,
    image_rgb: jax.Array,
    depth_scale: jax.Array | float,
    *,
    opts: PipelineOptions,
    h: int,
    w: int,
    step: int,
):
    """Model-resolution depth + working-size RGB → packed (8, N) points.

    The jitted equivalent of the reference's resize → normalize → blur →
    per-pixel loop → outlier removal chain (backend/app.py:174-269).
    """
    if depth.shape != (h, w):
        d_img = resize_batched(depth[None, :, :, None], (h, w), "linear")[0, :, :, 0]
    else:
        d_img = depth
    dn = normalize_depth(d_img, opts.invert_depth)
    if opts.smooth_depth:
        k = max(3, int(opts.smooth_ksize) // 2 * 2 + 1)
        dn = gaussian_blur(dn, k)
    packed = unproject(
        dn,
        image_rgb,
        depth_scale=depth_scale,
        step=step,
        h=h,
        w=w,
        fov_deg=opts.fov,
    )
    if opts.refine:
        keep = statistical_outlier_mask(packed[:3].T)
        packed = packed.at[6].set(keep.astype(jnp.float32))
    return packed


class DepthPipeline:
    """Compiled depth→point-cloud pipelines over one model + params."""

    def __init__(
        self,
        cfg: DepthAnythingConfig,
        params: Any,
        *,
        model_target: int = 518,
        donate: bool = False,
    ):
        self.cfg = cfg
        self.model = DepthAnything(cfg)
        self.params = params
        self.model_target = model_target
        self._compiled: dict[tuple, Callable] = {}

    # ---------- graph builders ----------

    def _build(self, in_hw: tuple[int, int], opts: PipelineOptions, batch: int):
        """Compile the full fused graph for one (input size, batch) signature."""
        h0, w0 = in_hw
        h, w = _proc_hw(h0, w0)
        mh, mw = processor_output_size(h, w, self.model_target)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        step = DENSITY_STRIDES[opts.density]
        pv_h, pv_w = _preview_hw(mh, mw)

        def graph(params, images_u8, depth_scales):
            img = images_u8.astype(jnp.float32)  # (B, h0, w0, 3)
            if (h, w) != (h0, w0):
                img = resize_batched(img, (h, w), "area")
            x = preprocess_for_model(img, (mh, mw))
            depth = self.model.apply({"params": params}, x)  # (B, mh, mw)

            # Depth preview: normalize at model resolution, colorize, cap.
            dn_prev = jax.vmap(lambda d: normalize_depth(d, opts.invert_depth))(depth)
            prev_u8 = (dn_prev * 255.0).astype(jnp.uint8)
            prev_rgb = jax.vmap(apply_colormap)(prev_u8)  # (B, mh, mw, 3)
            if (pv_h, pv_w) != (mh, mw):
                prev_rgb = jnp.clip(
                    jnp.round(
                        resize_batched(
                            prev_rgb.astype(jnp.float32), (pv_h, pv_w), "area"
                        )
                    ),
                    0,
                    255,
                ).astype(jnp.uint8)

            # Point-cloud path: upscale depth to working size, re-normalize.
            packed = jax.vmap(
                lambda d, im, s: depth_to_packed_points(
                    d, im, s, opts=opts, h=h, w=w, step=step
                )
            )(depth, img, depth_scales)
            return packed, prev_rgb

        return jax.jit(graph)

    def _get(self, key, builder):
        fn = self._compiled.get(key)
        if fn is None:
            fn = builder()
            self._compiled[key] = fn
        return fn

    # ---------- host-facing API ----------

    def run_batch(
        self,
        images_rgb_u8: "np.ndarray | list[np.ndarray]",
        *,
        depth_scales: "np.ndarray | list[float] | float" = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
    ) -> list[PipelineResult]:
        """Run the fused pipeline on a batch of same-size RGB uint8 images."""
        imgs = np.stack(images_rgb_u8)
        b, h0, w0 = imgs.shape[:3]
        if np.isscalar(depth_scales):
            depth_scales = np.full((b,), depth_scales, np.float32)
        key = ("depth", b, h0, w0, options)
        fn = self._get(key, lambda: self._build((h0, w0), options, b))
        packed, prev = fn(
            self.params, jnp.asarray(imgs), jnp.asarray(depth_scales, jnp.float32)
        )
        packed = np.asarray(packed)
        prev = np.asarray(prev) if want_preview else None
        h, w = _proc_hw(h0, w0)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        step = DENSITY_STRIDES[options.density]
        grid_hw = (-(-h // step), -(-w // step))
        results = []
        for i in range(b):
            keep = packed[i, 6] > 0.5
            results.append(
                PipelineResult(
                    points=np.ascontiguousarray(packed[i, :3].T[keep]),
                    colors=np.ascontiguousarray(packed[i, 3:6].T[keep]),
                    depth_preview_rgb=prev[i] if want_preview else None,
                    raw_point_count=packed.shape[2],
                    kept_point_count=int(keep.sum()),
                    packed=packed[i],
                    grid_hw=grid_hw,
                )
            )
        return results

    def run(
        self,
        image_rgb_u8: np.ndarray,
        *,
        depth_scale: float = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
    ) -> PipelineResult:
        """Run the fused pipeline on one decoded RGB uint8 image."""
        return self.run_batch(
            image_rgb_u8[None],
            depth_scales=depth_scale,
            options=options,
            want_preview=want_preview,
        )[0]


# ---------- dummy-model graphs (reference backend/app.py:567-607) ----------

_DUMMY_STRIDES = {"low": 8, "medium": 4, "high": 2}

# cv2 BGR→GRAY weights (reference backend/app.py:578 uses cvtColor).
_GRAY_W = (0.299, 0.587, 0.114)  # R, G, B


@functools.partial(jax.jit, static_argnames=("step", "h", "w"))
def _dummy_graph(image_u8_rgb, *, step: int, h: int, w: int):
    img = image_u8_rgb.astype(jnp.float32)
    sub = img[::step, ::step, :]
    # cv2 BGR2GRAY on uint8 rounds to the nearest integer.
    gray = jnp.round(
        sub[:, :, 0] * _GRAY_W[0] + sub[:, :, 1] * _GRAY_W[1] + sub[:, :, 2] * _GRAY_W[2]
    )
    z = (255.0 - gray) / 255.0 * 5.0
    u = jax.lax.broadcasted_iota(jnp.float32, z.shape, 1) * step
    v = jax.lax.broadcasted_iota(jnp.float32, z.shape, 0) * step
    x = (u - w / 2.0) / 100.0
    y = (v - h / 2.0) / 100.0
    n = z.shape[0] * z.shape[1]
    pts = jnp.stack([x.reshape(n), y.reshape(n), z.reshape(n)], axis=1)
    cols = sub.reshape(n, 3)
    return pts, cols


def dummy_point_cloud_graph(
    image_rgb_u8: np.ndarray, density: str
) -> tuple[np.ndarray, np.ndarray]:
    """Intensity-as-depth fallback for unsupported models
    (reference backend/app.py:567-587)."""
    h, w = image_rgb_u8.shape[:2]
    step = _DUMMY_STRIDES[density]
    pts, cols = _dummy_graph(jnp.asarray(image_rgb_u8), step=step, h=h, w=w)
    return np.asarray(pts), np.asarray(cols)


@functools.partial(jax.jit, static_argnames=())
def demo_depth_map_graph(image_u8_rgb):
    """Fake depth-map preview for unsupported models
    (reference backend/app.py:589-607): gray → 15×15 blur → inverted PLASMA."""
    img = image_u8_rgb.astype(jnp.float32)
    gray = jnp.round(
        img[:, :, 0] * _GRAY_W[0] + img[:, :, 1] * _GRAY_W[1] + img[:, :, 2] * _GRAY_W[2]
    )
    blurred = jnp.round(gaussian_blur(gray, 15))
    inv = (255.0 - blurred).astype(jnp.uint8)
    return apply_colormap(inv)
