"""Per-pass device-time breakdown of the flagship frame (run on TPU).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_flagship.py \
        [width height] [--json OUT]

Uses --execute-per-pass mode: each pass jitted separately + blocked, second
frame reported (first includes compiles)."""

from __future__ import annotations

import json
import sys


def main(argv):
    W, H = 1920, 1080
    args = [a for a in argv if not a.startswith("--")]
    if len(args) >= 2:
        W, H = int(args[0]), int(args[1])
    out_json = None
    if "--json" in argv:
        out_json = argv[argv.index("--json") + 1]

    from hobbyrenderer_tpu.config import Config, RenderingMode
    from hobbyrenderer_tpu.renderer import Renderer

    cfg = Config(scene="stress", width=W, height=H,
                 mode=RenderingMode.NORMAL,
                 direct_mode="restir", indirect_mode="restir",
                 execute_per_pass=True)
    r = Renderer(cfg)
    r.render_frame()          # compiles
    r.render_frame()          # steady state
    rows = r._model.graph.last_pass_timings
    total = sum(t["ms"] for t in rows)
    for t in sorted(rows, key=lambda t: -t["ms"]):
        print(f"{t['pass']:24s} {t['ms']:9.2f} ms  {t['ms']/total*100:5.1f}%")
    print(f"{'TOTAL (serialized)':24s} {total:9.2f} ms")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
