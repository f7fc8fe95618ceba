"""Top-level Renderer: owns scene, camera, mode graph, frame loop.

Reference: the Renderer singleton (src/Renderer.h:105-463, src/Renderer.cpp) —
Initialize/Run/Shutdown, ScheduleAndRunAllRenderers, per-frame scene update + dirty
uploads + camera constants + pass scheduling + present/screenshot.

TPU build: headless. "Present" = device->host copy of the final tonemapped uint8
frame (the only per-frame readback, north star); screenshots via utils.image. The
window/ImGui layer of the reference maps to the stats/introspection API here
(describe(), timings())."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hobbyrenderer_tpu.config import Config, RenderingMode
from hobbyrenderer_tpu.models.deferred import DeferredRenderer
from hobbyrenderer_tpu.scene import Camera, make_default_cube_scene, make_stress_scene
from hobbyrenderer_tpu.scene.gpu import build_scene_gpu, update_instance_transforms
from hobbyrenderer_tpu.scene.camera_state import CameraStateManager
from hobbyrenderer_tpu.utils.image import write_png
from hobbyrenderer_tpu.utils.timing import PROFILER


class Renderer:
    def __init__(self, config: Optional[Config] = None, scene=None):
        self.config = config or Config()
        cfg = self.config
        with PROFILER.scope("Init/SceneLoad"):
            if scene is not None:
                self.scene = scene
            elif cfg.scene in (None, "", "cube"):
                self.scene = make_default_cube_scene()
            elif cfg.scene == "stress":
                self.scene = make_stress_scene()
            elif cfg.scene.startswith("stress:"):
                self.scene = make_stress_scene(grid=int(cfg.scene.split(":")[1]))
            else:
                from hobbyrenderer_tpu.scene.loader import load_gltf_scene
                self.scene = load_gltf_scene(cfg.scene, cache_dir=cfg.cache_dir)
        self.streamer = None
        if getattr(cfg, "tex_streaming", False):
            from hobbyrenderer_tpu.scene.streaming import (PAGE_TEXELS,
                                                           TextureStreamer)
            pages = max((cfg.tex_budget_mb * (1 << 20)) // (PAGE_TEXELS * 16),
                        16)
            self.streamer = TextureStreamer(self.scene, budget_pages=pages)
        env = None
        env_path = getattr(cfg, "envmap", None) \
            or getattr(self.scene, "env_map_path", "")
        if env_path:
            from hobbyrenderer_tpu.ops.envmap import load_envmap
            env = load_envmap(env_path)
        # prebaked IBL inputs (ref Config.cpp --irradiance/--radiance/
        # --brdflut; --envmap also derives <stem>_irradiance/_radiance
        # siblings when they exist). Cubemaps are authored as EQUIRECT
        # panoramas here (HDR/DDS-BC6H) — the TPU pipeline samples equirect.
        import os as _os
        irr_path = getattr(cfg, "irradiance", None)
        rad_path = getattr(cfg, "radiance", None)
        if env_path and not (irr_path or rad_path):
            stem, _ext = _os.path.splitext(env_path)
            for ext in (".hdr", ".dds"):
                if not irr_path and _os.path.exists(stem + "_irradiance" + ext):
                    irr_path = stem + "_irradiance" + ext
                if not rad_path and _os.path.exists(stem + "_radiance" + ext):
                    rad_path = stem + "_radiance" + ext
        env_sh = None
        if irr_path:
            # an irradiance map stores E(n)/pi directly: project WITHOUT the
            # cosine-lobe convolution the radiance projection would get
            from hobbyrenderer_tpu.ops.envmap import load_envmap, project_sh9
            env_sh = project_sh9(np.asarray(load_envmap(irr_path),
                                            np.float32), convolved=True)
        if rad_path:
            from hobbyrenderer_tpu.ops.envmap import load_envmap
            env = load_envmap(rad_path) if env is None else env
        brdf_lut = None
        lut_path = getattr(cfg, "brdflut", None)
        if lut_path:
            from hobbyrenderer_tpu.scene.textures import load_image_file
            u8 = load_image_file(lut_path)     # (N, N, 4) u8
            brdf_lut = u8[..., :2].astype(np.float32) / 255.0
        self._env_as_lights = False
        n_env_lights = int(getattr(cfg, "env_lights", 0) or 0)
        # env-as-lights pairs with ReSTIR (the pool machinery) or the path
        # tracer's NEE; the simple direct mode keeps the IBL-ambient path
        if env is not None and n_env_lights > 0 and (
                getattr(cfg, "direct_mode", "simple") == "restir"
                or cfg.mode == RenderingMode.PATH_TRACER):
            # discretize the envmap into pool-consumable directional lights
            # (ref PresampleEnvironmentMap); the duplicate ambient/secondary-
            # miss env paths are suppressed below
            from hobbyrenderer_tpu.ops.envmap import env_to_directional_lights
            from hobbyrenderer_tpu.scene.scene import (Light,
                                                       LIGHT_DIRECTIONAL)
            dirs, colors = env_to_directional_lights(env, n_env_lights)
            for k in range(dirs.shape[0]):
                self.scene.add_light(Light(
                    type=LIGHT_DIRECTIONAL, direction=-dirs[k],
                    color=colors[k], intensity=1.0, name=f"envlight{k}"))
            self._env_as_lights = True
        with PROFILER.scope("Init/Upload"):
            self.gpu = build_scene_gpu(
                self.scene, streamer=self.streamer, env_map=env,
                env_sh=env_sh, brdf_lut=brdf_lut,
                max_lights=max(64, len(self.scene.lights) + 8))
        cam_desc = self.scene.cameras[0] if self.scene.cameras else None
        self.camera = Camera(cam_desc, cfg.render_width, cfg.render_height)
        if cam_desc is None or np.allclose(self.camera.position, [0, 1, 5]):
            # frame the scene if no authored camera
            self.camera.position = (self.scene.center
                                    + np.asarray([0.6, 0.45, 1.1], np.float32)
                                    * self.scene.radius * 1.6)
            self.camera.look_at(self.scene.center)
        self.mode = cfg.mode
        self._model = None
        self.frame_index = 0
        self.last_frame = None
        self.time_s = 0.0
        # camera persistence (ref CameraStateManager, 1 Hz async JSON save)
        self._scene_key = cfg.scene or "default"
        self.camera_state = CameraStateManager(
            path=os.path.join(cfg.cache_dir, "camera_state.json"))
        os.makedirs(cfg.cache_dir, exist_ok=True)
        self.camera_state.restore(self.camera, self._scene_key)
        self.camera_state.start()
        self._tune_mtime = 0.0
        self._tune_warned: set = set()
        self._build_model()

    # -- mode / model management (ApplyRenderingModeDefaults analogue) -------

    def _build_model(self):
        cfg = self.config
        if self.mode == RenderingMode.PATH_TRACER:
            from hobbyrenderer_tpu.models.pathtracer import PathTracerRenderer
            if cfg.render_scale != 1.0:
                print("warning: --render-scale is a TAA-upscaling feature of "
                      "the deferred modes; the reference path tracer renders "
                      "at the internal resolution "
                      f"{cfg.render_width}x{cfg.render_height}")
            self._model = PathTracerRenderer(self.gpu, cfg.render_width,
                                             cfg.render_height, config=cfg,
                                             scene=self.scene,
                                             env_as_lights=self._env_as_lights)
        else:
            rt = None
            needs_rt = (self.mode in (RenderingMode.NORMAL, RenderingMode.IBL)
                        or getattr(cfg, "indirect_mode", "none")
                        in ("ddgi", "restir"))
            if needs_rt:
                # RT passes (sun shadows; later ReSTIR/SHARC) need the BVH
                from hobbyrenderer_tpu.models.pathtracer import build_scene_rt
                with PROFILER.scope("Init/BVH"):
                    rt = build_scene_rt(self.scene, self.gpu)
            self._model = DeferredRenderer(self.gpu, cfg.render_width,
                                           cfg.render_height, config=cfg,
                                           rt=rt, mode=self.mode,
                                           env_as_lights=self._env_as_lights,
                                           out_width=cfg.width,
                                           out_height=cfg.height)

    def set_mode(self, mode: str):
        """Rendering-mode switch: rebuild the model graph (persistent state of the
        old mode is dropped — the reference's 2-frame force-invalidate)."""
        if mode != self.mode:
            self.mode = mode
            self._build_model()

    # -- frame loop ----------------------------------------------------------

    def _poll_tune_file(self):
        """Live-tuning channel (ref the ImGui panels over ~80 Renderer
        members, src/Renderer.h:285-418 + src/ImGuiLayer.cpp): when
        Config.tune_file is set, re-read it each frame (mtime-gated) and map
        its keys onto RenderSettings. Settings ride into jit as a traced
        pytree, so a knob change applies NEXT FRAME without recompiling."""
        import dataclasses as _dc
        import json as _json
        cfg = self.config
        path = getattr(cfg, "tune_file", None)
        if not path or not os.path.exists(path):
            return
        try:
            mtime = os.path.getmtime(path)
            if mtime <= self._tune_mtime:
                return
            with open(path) as f:
                knobs = _json.load(f)
            self._tune_mtime = mtime
        except (OSError, ValueError):
            return      # partial write mid-save; retry next frame
        s = cfg.settings
        names = {f.name for f in _dc.fields(s) if not f.name.startswith("_")}
        updates = {}
        for k, v in knobs.items():
            if k not in names or k in s._static_fields:
                if k not in self._tune_warned:
                    self._tune_warned.add(k)
                    kind = ("jit-static (needs restart)"
                            if k in getattr(s, "_static_fields", ())
                            else "unknown")
                    print(f"[tune] ignoring {kind} knob '{k}'")
                continue
            cur = getattr(s, k)
            try:
                updates[k] = (tuple(v) if isinstance(cur, (tuple, list))
                              else type(cur)(v))
            except (TypeError, ValueError):
                if k not in self._tune_warned:
                    self._tune_warned.add(k)
                    print(f"[tune] ignoring knob '{k}': bad value {v!r}")
        if updates:
            self.config = _dc.replace(cfg, settings=_dc.replace(s, **updates))

    def render_frame(self, dt: float = 1.0 / 60.0):
        self._poll_tune_file()
        cfg = self.config
        with PROFILER.scope("Frame/SceneUpdate"):
            self.time_s += dt
            self.scene.update(self.time_s)
            dirty_rt = bool(self.scene.dirty_instances)
            dirty_mat = bool(self.scene.dirty_materials)
            self.gpu = update_instance_transforms(self.gpu, self.scene)
            if dirty_mat:
                from hobbyrenderer_tpu.scene.gpu import update_material_constants
                self.gpu = update_material_constants(self.gpu, self.scene)
        rt = getattr(self._model, "rt", None)
        if dirty_mat and rt is not None and rt.lights is not None:
            # animated emissive strength must drive the CAST light too: the
            # pool re-derives em_rad from the fresh material table (ref
            # PrepareLights every frame)
            from hobbyrenderer_tpu.ops.lights import refresh_pool_emissive
            self._model.rt = rt._replace(lights=refresh_pool_emissive(
                rt.lights, self.gpu, rt.tri_mat))
        if dirty_rt and getattr(self._model, "rt", None) is not None:
            # animated/moved instances: refit the RT BVH on device so shadow
            # rays / ReSTIR visibility / PT stay correct (per-frame TLAS
            # rebuild analogue, ref src/Scene.cpp:67-214)
            from hobbyrenderer_tpu.models.pathtracer import refit_scene_rt
            with PROFILER.scope("Frame/RTRefit"):
                self._model.rt = refit_scene_rt(self._model.rt,
                                                self.gpu.inst_transform)
        if self.streamer is not None and self.gpu.tex_stream is not None:
            # apply any finished tile-upload batch (budgeted async IO)
            with PROFILER.scope("Frame/TexStreaming"):
                import dataclasses as _dc
                self.gpu = _dc.replace(
                    self.gpu,
                    tex_stream=self.streamer.apply_updates(self.gpu.tex_stream))
        with PROFILER.scope("Frame/ViewConstants"):
            vc = self.camera.view_constants(self.frame_index)
        with PROFILER.scope("Frame/Render"):
            settings = cfg.settings.as_pytree()
            out = self._model.render(self.gpu, vc, settings, dt)
            ldr = out[0] if isinstance(out, tuple) else out
        if self.streamer is not None and self.frame_index % 8 == 7:
            # feedback fetch on the MAIN thread (device access is not
            # thread-safe through every backend); every 8th frame bounds the
            # sync cost — the reference similarly rations feedback resolves
            # (30/frame of a sparse map, FeedbackManager.h:38)
            fb = getattr(self._model, "last_stats", {}).get("tex_feedback")
            if fb is not None:
                self.streamer.publish_feedback(np.asarray(fb))
        self.camera.end_frame()
        self.camera_state.publish(self.camera, self._scene_key)
        self.frame_index += 1
        self.last_frame = ldr
        PROFILER.end_frame()
        return ldr

    def run(self, num_frames: int = 1, screenshot: Optional[str] = None,
            dt: float = 1.0 / 60.0):
        """Headless Run() loop (ref Renderer::Run, src/Renderer.cpp:424-607)."""
        t0 = time.perf_counter()
        for _ in range(num_frames):
            ldr = self.render_frame(dt)
        jax.block_until_ready(ldr)
        wall = time.perf_counter() - t0
        if screenshot:
            self.save_screenshot(screenshot)
        return {"frames": num_frames, "wall_s": wall,
                "ms_per_frame": wall / max(num_frames, 1) * 1e3}

    def save_screenshot(self, path: str):
        """Ref SaveBackBufferScreenshot (src/Renderer.cpp:218-271). A .hdr
        path writes the LINEAR pre-tonemap frame as Radiance RGBE — the
        headless analogue of the reference's scRGB HDR-display output."""
        assert self.last_frame is not None, "render a frame first"
        if path.lower().endswith(".hdr"):
            from hobbyrenderer_tpu.ops.envmap import encode_hdr
            hdr = getattr(self._model, "last_stats", {}).get("hdr_frame")
            if hdr is None:
                hdr = getattr(self._model, "accum", None)   # path tracer
            assert hdr is not None, \
                ".hdr screenshots need Config(keep_hdr=True) (the CLI sets " \
                "it automatically for --screenshot *.hdr)"
            with open(path, "wb") as f:
                f.write(encode_hdr(np.asarray(hdr)))
            return
        write_png(path, np.asarray(self.last_frame))

    # -- observability -------------------------------------------------------

    def reload_shaders(self):
        """Hot-reload analogue (ref F5 LoadShaders/ReloadShaders): re-trace and
        re-compile the frame function from current python code."""
        if hasattr(self._model, "reload"):
            self._model.reload()

    def shutdown(self):
        """Flush camera persistence, stop streaming IO (ref Renderer::Shutdown)."""
        self.camera_state.stop(flush=True)
        if self.streamer is not None:
            self.streamer.stop()

    def stats(self) -> dict:
        """Per-frame pipeline statistics (ref pipeline statistics queries)."""
        s = getattr(self._model, "last_stats", None)
        out = ({} if s is None
               else {k: np.asarray(v).item() for k, v in s.items()
                     if k not in ("tex_feedback", "hdr_frame")})
        if self.streamer is not None:
            # residency dashboard row (ref Streaming UI: pool occupancy,
            # per-material resident mips)
            st = self.streamer
            out["stream_free_pages"] = len(st.free_pages)
            out["stream_budget_pages"] = st.budget_pages
            out["stream_resident_mips"] = st.resident.tolist()
        state = getattr(self._model, "state", None)
        vol = state.get("ddgi_volume") if isinstance(state, dict) else None
        if vol is not None:
            # convergence metric (ref DDGI variability reduction)
            out["ddgi_variability"] = float(np.asarray(vol.variability))
        return out

    def describe_graph(self) -> str:
        return self._model.graph.describe() if hasattr(self._model, "graph") else "(no graph)"

    def export_graph(self) -> dict:
        """Machine-readable pass/resource dump (ref RenderGraphUI)."""
        g = getattr(self._model, "graph", None)
        return g.export_json() if g is not None else {}

    def timings(self) -> str:
        out = PROFILER.table()
        g = getattr(self._model, "graph", None)
        if g is not None and g.last_pass_timings:
            rows = "\n".join(f"  {t['pass']:20s} {t['ms']:9.2f} ms"
                             for t in g.last_pass_timings)
            out += "\nPer-pass device time (--execute-per-pass):\n" + rows
        return out
