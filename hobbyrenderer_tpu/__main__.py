"""CLI entry point (the L7 app layer).

Reference: main() at src/Renderer.cpp:2293-2306 — parse Config, Initialize, Run,
Shutdown. Headless here: renders N frames and writes a screenshot + stats.

Usage:
    python -m hobbyrenderer_tpu --scene stress --mode normal --frames 8 \
        --screenshot out.png
"""

from __future__ import annotations

import argparse
import json
import sys

from hobbyrenderer_tpu.config import Config, RenderingMode


def main(argv=None):
    p = argparse.ArgumentParser(prog="hobbyrenderer-tpu")
    p.add_argument("--scene", type=str, default=None,
                   help="glTF path | 'cube' | 'stress' | 'stress:N'")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--mode", type=str, default=RenderingMode.NORMAL,
                   choices=RenderingMode.ALL)
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--render-scale", dest="render_scale", type=float,
                   default=1.0,
                   help="internal render resolution scale; < 1 enables TAA "
                        "UPSCALING to the output size (the FSR3 upscaler "
                        "capability)")
    p.add_argument("--screenshot", type=str, default=None)
    p.add_argument("--cache-dir", type=str, default=".hr_cache")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--describe-graph", action="store_true",
                   help="print the pass graph (RenderGraphUI analogue)")
    p.add_argument("--export-graph", type=str, default=None, metavar="PATH",
                   help="write the executed pass graph + traced resource "
                        "shapes (+ per-pass ms under --execute-per-pass) "
                        "as JSON (ref RenderGraphUI)")
    p.add_argument("--timings", action="store_true",
                   help="print per-pass CPU timings after the run")
    p.add_argument("--profile-dir", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run "
                        "(TensorBoard format; the microprofile-dump analogue)")
    p.add_argument("--execute-per-pass", action="store_true")
    p.add_argument("--direct-mode", type=str, default="simple",
                   choices=("simple", "restir"))
    p.add_argument("--shadow-scale", type=int, default=2)
    p.add_argument("--indirect-mode", type=str, default="none",
                   choices=("none", "sharc", "ssgi", "restir", "ddgi",
                            "combined"),
                   help="combined = ReSTIR DI + traced SHARC-backed indirect "
                        "(ref RTXDI combined mode)")
    p.add_argument("--ddgi-debug", action="store_true",
                   help="overlay DDGI probe visualization")
    p.add_argument("--tex-streaming", action="store_true",
                   help="budgeted texture residency + async tile streaming")
    p.add_argument("--tex-budget-mb", type=int, default=64)
    p.add_argument("--envmap", type=str, default=None,
                   help="equirect environment map (.hdr/.png/.jpg/.dds)")
    p.add_argument("--env-lights", dest="env_lights", type=int, default=0,
                   help="discretize the envmap into N pool directional "
                        "lights for ReSTIR/PT NEE (ref env PDF presampling)")
    p.add_argument("--denoiser", type=str, default="relax",
                   choices=("relax", "reblur"),
                   help="NRD-class denoiser profile (ref REBLUR/RELAX)")
    p.add_argument("--regir", action="store_true",
                   help="ReGIR world-space reservoir grid for ReSTIR initial "
                        "candidates (ref RTXDI ReGIR)")
    p.add_argument("--csm-debug", action="store_true",
                   help="cascade debug view: per-pixel cascade tint + "
                        "shadow-map thumbnails (normal_basic mode)")
    p.add_argument("--regir-mode", default="onion",
                   choices=["onion", "grid"],
                   help="ReGIR cell layout: onion = camera-centered "
                        "detail+coverage shells (ref rtxdi::ReGIRMode::Onion, "
                        "the reference default); grid = uniform world AABB")
    p.add_argument("--irradiance", type=str, default=None,
                   help="prebaked irradiance map (equirect .hdr/.dds; ref "
                        "--irradiance cubemap)")
    p.add_argument("--radiance", type=str, default=None,
                   help="prebaked prefiltered radiance environment (equirect; "
                        "ref --radiance cubemap)")
    p.add_argument("--brdflut", type=str, default=None,
                   help="authored split-sum BRDF LUT image (ref --brdflut; "
                        "default: validated analytic fit)")
    p.add_argument("--restir-quality", default="balanced",
                   choices=["highperf", "balanced", "highquality"],
                   help="ReSTIR quality preset: candidate/tap counts, "
                        "boiling filter, checkerboard, GI history (ref "
                        "RTXDI quality presets)")
    p.add_argument("--tex-debug", action="store_true",
                   help="texture-streaming residency heatmap overlay (needs "
                        "--tex-streaming; ref TileResidencyDebugRenderer)")
    p.add_argument("--pt-spp", dest="pt_spp", type=int, default=1,
                   help="path-tracer samples per frame, batched into one "
                        "wavefront (wider lockstep wavefronts amortize "
                        "dispatch overheads on TPU)")
    p.add_argument("--tune-file", dest="tune_file", type=str, default=None,
                   metavar="PATH",
                   help="live-tuning JSON re-read every frame and mapped onto "
                        "RenderSettings (the ImGui panel analogue; knob "
                        "changes apply next frame without recompiling)")
    p.add_argument("--debug-view", dest="debug_view", type=str, default=None,
                   help="named debug visualization (csm_* / ssgi_* modes; "
                        "ref CSMDebug.hlsl + SSGIDebug outputs — see "
                        "ops/debugview.py for the list)")
    p.add_argument("--no-specular-indirect", dest="specular_indirect",
                   action="store_false", default=True,
                   help="disable traced specular reflections (ref "
                        "BrdfRayTracing; on by default with an RT indirect "
                        "mode)")
    a = p.parse_args(argv)

    cfg = Config(scene=a.scene, width=a.width, height=a.height, mode=a.mode,
                 render_scale=a.render_scale,
                 cache_dir=a.cache_dir, seed=a.seed,
                 execute_per_pass=a.execute_per_pass,
                 direct_mode=a.direct_mode, shadow_scale=a.shadow_scale,
                 indirect_mode=a.indirect_mode, ddgi_debug=a.ddgi_debug,
                 csm_debug=a.csm_debug, regir=a.regir,
                 regir_mode=a.regir_mode, denoiser=a.denoiser,
                 envmap=a.envmap, env_lights=a.env_lights,
                 irradiance=a.irradiance, radiance=a.radiance,
                 brdflut=a.brdflut,
                 keep_hdr=bool(a.screenshot
                               and a.screenshot.lower().endswith(".hdr")),
                 tex_streaming=a.tex_streaming,
                 tex_budget_mb=a.tex_budget_mb,
                 tex_debug=a.tex_debug,
                 restir_quality=a.restir_quality,
                 specular_indirect=a.specular_indirect, pt_spp=a.pt_spp,
                 tune_file=a.tune_file, debug_view=a.debug_view)
    from hobbyrenderer_tpu.renderer import Renderer  # defer heavy imports past argparse
    r = Renderer(cfg)
    if a.describe_graph:
        print(r.describe_graph())
    if a.profile_dir:
        import jax
        with jax.profiler.trace(a.profile_dir):
            stats = r.run(num_frames=a.frames, screenshot=a.screenshot)
    else:
        stats = r.run(num_frames=a.frames, screenshot=a.screenshot)
    print(json.dumps(stats))
    if a.export_graph:
        with open(a.export_graph, "w") as f:
            json.dump(r.export_graph(), f, indent=1)
    if a.timings:
        print(r.timings())
    return 0


if __name__ == "__main__":
    sys.exit(main())
