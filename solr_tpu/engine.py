"""Engine: stateful convenience shell over the functional core.

TPU-native analog of the reference's engine object
(solr/engines/GPUKernel.{h,cpp} + CudaKernel/OpenCLKernel): owns a
SceneBuilder, a camera, render configuration, and the progressive
accumulation buffer, and exposes render_begin/render-style entry points.
Unlike the reference there is no device state to manage — `render` is a
pure jitted function and this class only carries conveniences
(accumulation across progressive frames, dirty-scene rebuilds,
snapshotting).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from solr_tpu.scene import SceneBuilder
from solr_tpu.types import Camera, RenderConfig, Scene

__all__ = ["Engine"]


class Engine:
    """Progressive interactive renderer (reference: GPUKernel's
    render_begin/render_end + pathTracingIteration accumulation)."""

    def __init__(
        self,
        config: Optional[RenderConfig] = None,
        camera: Optional[Camera] = None,
        seed: int = 0,
    ):
        self.builder = SceneBuilder()
        self.config = config or RenderConfig()
        self.camera = camera or Camera.create()
        self._scene: Optional[Scene] = None
        self._dirty = True
        self._accum = None
        self._iteration = 0
        self._key = jax.random.PRNGKey(seed)

    # -- scene construction passthrough --------------------------------

    def __getattr__(self, name):
        # Delegate add_* scene-building calls to the builder
        # (reference: the GPUKernel add/set API).
        if name.startswith("add_"):
            self._dirty = True
            self.__dict__["_dirty"] = True
            return getattr(self.builder, name)
        raise AttributeError(name)

    @property
    def scene(self) -> Scene:
        if self._dirty or self._scene is None:
            self._scene = self.builder.build(use_bvh=self.config.use_bvh)
            self._dirty = False
            self.reset_accumulation()
        return self._scene

    def set_scene(self, scene: Scene) -> None:
        self._scene = scene
        self._dirty = False
        self.reset_accumulation()

    def reset_accumulation(self) -> None:
        """(reference: pathTracingIteration <- 0 on camera/scene change)"""
        self._accum = None
        self._iteration = 0

    def set_camera(self, camera: Camera) -> None:
        self.camera = camera
        self.reset_accumulation()

    # -- rendering ------------------------------------------------------

    def render_frame(self) -> np.ndarray:
        """One progressive frame, accumulated; returns (H, W, 4) float."""
        from solr_tpu.ops.render import accumulate, jit_render

        self._key, sub = jax.random.split(self._key)
        img = jit_render(self.scene, self.camera, self.config, sub)
        if self._accum is None:
            self._accum = img
        else:
            self._accum = accumulate(self._accum, img, self._iteration)
        self._iteration += 1
        return np.asarray(self._accum)

    def bitmap(self) -> np.ndarray:
        """Current frame as (H, W, 3) uint8 (reference:
        GPUKernel::getBitmap — the RGB byte buffer blitted by the
        viewer)."""
        img = self._accum
        if img is None:
            img = self.render_frame()
        rgb = np.asarray(jnp.clip(img[..., :3], 0.0, 1.0) * 255.0)
        return rgb.astype(np.uint8)
