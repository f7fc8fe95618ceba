"""The pass graph: declared-access composition of pure passes into one jitted frame.

Reference: src/RenderGraph.{h,cpp} (1936 LoC) — declare/read/write in a Setup phase,
Compile() computes lifetimes + aliases transient memory + inserts barriers, passes
record into parallel command lists, persistent resources survive frames with 3-frame
idle eviction; plus IRenderer/RendererRegistry (src/Renderer.h:17-86) and the
per-mode fixed pass order (src/Renderer.cpp:1263-1323).

TPU-first redesign (SURVEY.md §7): XLA already performs lifetime analysis, memory
aliasing (via donation) and scheduling inside one jitted frame function — so the
graph layer keeps only the *declared API*:
- a named pass registry with per-pass enable toggles (RendererRegistry analogue),
- declared reads/writes validated at trace time (the reference's access-validated
  GetTexture/GetBuffer asserts, RenderGraph.cpp:436-846),
- persistent-vs-transient resources: persistent ones ride the FrameState pytree
  (donated into jit, so XLA aliases them in place),
- per-pass introspection (what ran, what it read/wrote, shapes) for the
  RenderGraphUI-style debug dump,
- optional execute-per-pass mode: each pass jitted separately + blocked, the
  --execute-per-pass-and-wait bisection tool (src/Config.h:13-14).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Set

import jax


@dataclass
class FrameContext:
    """Per-frame immutable inputs available to every pass."""

    gpu: Any                  # SceneGPU
    vc: Dict[str, Any]        # view constants pytree
    settings: Any             # RenderSettings (scalar leaves)
    config: Any               # static Config (hashable python data; not traced)
    frame_index: Any = 0
    dt: float = 1.0 / 60.0
    rt: Any = None            # SceneRT (BVH snapshot) for ray-traced passes


class AccessError(RuntimeError):
    pass


def _describe_value(v) -> Any:
    """Compact shape/dtype summary of a resource (works on tracers)."""
    leaves = jax.tree_util.tree_leaves(v)
    descs = [f"{tuple(x.shape)}:{x.dtype}" if hasattr(x, "shape") else repr(x)
             for x in leaves]
    return descs[0] if len(descs) == 1 else descs


class _GuardedResources:
    """Dict wrapper enforcing declared reads/writes (trace-time validation)."""

    def __init__(self, store: Dict[str, Any], reads: Set[str], writes: Set[str],
                 pass_name: str):
        self._store = store
        self._reads = reads
        self._writes = writes
        self._pass = pass_name
        self.written: Dict[str, Any] = {}

    def __getitem__(self, key: str):
        if key not in self._reads and key not in self._writes:
            raise AccessError(
                f"pass '{self._pass}' reads undeclared resource '{key}' "
                f"(declared reads={sorted(self._reads)})")
        if key in self.written:
            return self.written[key]
        if key not in self._store:
            raise AccessError(
                f"pass '{self._pass}' reads '{key}' before any pass wrote it")
        return self._store[key]

    def __setitem__(self, key: str, value):
        if key not in self._writes:
            raise AccessError(
                f"pass '{self._pass}' writes undeclared resource '{key}' "
                f"(declared writes={sorted(self._writes)})")
        self.written[key] = value

    def get(self, key, default=None):
        try:
            return self[key]
        except AccessError:
            raise
        except KeyError:
            return default


@dataclass
class RenderPass:
    """One pass: name + declared access + the pure render function.

    fn(ctx, res) mutates ``res`` (guarded dict) — the Render() analogue."""

    name: str
    fn: Callable[[FrameContext, _GuardedResources], None]
    reads: Set[str] = field(default_factory=set)
    writes: Set[str] = field(default_factory=set)
    persistent: Set[str] = field(default_factory=set)   # writes that survive frames
    enabled: bool = True


def render_pass(name: str, reads: Sequence[str] = (), writes: Sequence[str] = (),
                persistent: Sequence[str] = ()):
    """Decorator: @render_pass("Bloom", reads=[...], writes=[...])."""

    def deco(fn):
        return RenderPass(name=name, fn=fn, reads=set(reads), writes=set(writes),
                          persistent=set(persistent))

    return deco


class RenderGraph:
    """Composes passes into one pure frame function + tracks persistent state."""

    def __init__(self, passes: Optional[List[RenderPass]] = None):
        self.passes: List[RenderPass] = list(passes or [])
        self.last_run_log: List[Dict[str, Any]] = []
        self.last_pass_timings: List[Dict[str, Any]] = []
        self._pass_jits: Dict[str, Any] = {}

    def add(self, p: RenderPass):
        if any(q.name == p.name for q in self.passes):
            raise ValueError(f"duplicate pass '{p.name}'")
        self.passes.append(p)
        return p

    def get(self, name: str) -> RenderPass:
        for p in self.passes:
            if p.name == name:
                return p
        raise KeyError(name)

    def set_enabled(self, name: str, enabled: bool):
        self.get(name).enabled = enabled

    @property
    def persistent_names(self) -> Set[str]:
        names: Set[str] = set()
        for p in self.passes:
            names |= p.persistent
        return names

    def execute(self, ctx: FrameContext, frame_state: Dict[str, Any],
                outputs: Sequence[str]) -> Dict[str, Any]:
        """Run all enabled passes (trace-time). frame_state seeds the persistent
        resources; returns {outputs..., persistent...} — call under jit.

        Validation mirrors the reference's Compile() asserts: undeclared access and
        read-before-write raise at trace time.
        """
        store: Dict[str, Any] = dict(frame_state)
        log: List[Dict[str, Any]] = []
        for p in self.passes:
            if not p.enabled:
                log.append({"pass": p.name, "enabled": False})
                continue
            guard = _GuardedResources(store, set(p.reads), set(p.writes), p.name)
            p.fn(ctx, guard)
            # a pass that silently fails to write a declared output would
            # surface later as a confusing read-before-write — fail here
            # (Compile()-style validation, ref RenderGraph.cpp:436-846).
            # Writes already present in the store (persistent carry-in) are
            # allowed to pass through unmodified.
            missing = p.writes - set(guard.written) - set(store)
            if missing:
                raise AccessError(
                    f"pass '{p.name}' declared writes {sorted(missing)} "
                    f"but never wrote them")
            store.update(guard.written)
            log.append({"pass": p.name, "enabled": True,
                        "wrote": sorted(guard.written),
                        "shapes": {k: _describe_value(v)
                                   for k, v in guard.written.items()}})
        self.last_run_log = log
        result = {}
        for name in outputs:
            if name not in store:
                raise AccessError(f"requested output '{name}' was never written")
            result[name] = store[name]
        new_state = {k: store[k] for k in self.persistent_names if k in store}
        return {"outputs": result, "state": new_state}

    def execute_per_pass(self, ctx: FrameContext, frame_state: Dict[str, Any],
                         outputs: Sequence[str], repeats: int = 1,
                         sync=None) -> Dict[str, Any]:
        """Bisection/profiling mode (--execute-per-pass; ref Config.h:13-14
        --execute-per-pass-and-wait + the per-pass GPU timer queries,
        RenderGraph.cpp:329-349): each pass is jitted SEPARATELY and blocked,
        so a fault is attributable to one pass and per-pass device time is
        measurable. Results land in self.last_pass_timings (ms, includes the
        compile on the first frame — run >=2 frames for steady-state numbers).

        repeats>1 re-dispatches each pass with identical inputs and divides —
        this amortizes the per-sync round trip, which matters through remote
        device tunnels where only a host fetch truly synchronizes (pass such a
        fetch as `sync`; defaults to jax.block_until_ready)."""
        import time as _time
        if sync is None:
            sync = jax.block_until_ready
        store: Dict[str, Any] = dict(frame_state)
        timings: List[Dict[str, Any]] = []
        for p in self.passes:
            if not p.enabled:
                continue
            needed = {k: store[k] for k in (p.reads | p.writes) if k in store}
            fn = self._pass_jits.get(p.name)
            if fn is None:
                def make(p=p):
                    def run(gpu, rt, vc, settings, dt, res_in):
                        c = dataclasses.replace(ctx, gpu=gpu, rt=rt, vc=vc,
                                                settings=settings, dt=dt)
                        guard = _GuardedResources(dict(res_in), set(p.reads),
                                                  set(p.writes), p.name)
                        p.fn(c, guard)
                        return guard.written
                    return run
                fn = jax.jit(make())
                self._pass_jits[p.name] = fn
            t0 = _time.perf_counter()
            written = fn(ctx.gpu, ctx.rt, ctx.vc, ctx.settings, ctx.dt, needed)
            sync(written)
            ms = (_time.perf_counter() - t0) * 1e3
            if repeats > 1:
                t0 = _time.perf_counter()
                for _ in range(repeats):
                    w2 = fn(ctx.gpu, ctx.rt, ctx.vc, ctx.settings, ctx.dt,
                            needed)
                sync(w2)
                ms = (_time.perf_counter() - t0) * 1e3 / repeats
            timings.append({"pass": p.name, "ms": ms})
            missing = p.writes - set(written) - set(store)
            if missing:
                raise AccessError(
                    f"pass '{p.name}' declared writes {sorted(missing)} "
                    f"but never wrote them")
            store.update(written)
        self.last_pass_timings = timings
        result = {}
        for name in outputs:
            if name not in store:
                raise AccessError(f"requested output '{name}' was never written")
            result[name] = store[name]
        new_state = {k: store[k] for k in self.persistent_names if k in store}
        return {"outputs": result, "state": new_state}

    def describe(self) -> str:
        """RenderGraphUI-style dump of the pass/resource schedule."""
        lines = []
        for p in self.passes:
            flag = " " if p.enabled else "x"
            lines.append(f"[{flag}] {p.name:24s} reads={sorted(p.reads)} "
                         f"writes={sorted(p.writes)} persistent={sorted(p.persistent)}")
        return "\n".join(lines)

    def export_json(self) -> Dict[str, Any]:
        """Machine-readable graph dump (ref src/RenderGraphUI.cpp: the pass /
        resource browser): schedule order, declared access, enable state,
        per-resource traced shapes/dtypes from the last execution, and the
        last per-pass device timings if --execute-per-pass ran."""
        shape_of: Dict[str, Any] = {}
        for entry in self.last_run_log:
            for k, v in entry.get("shapes", {}).items():
                shape_of[k] = v
        ms_of = {t["pass"]: t["ms"] for t in self.last_pass_timings}
        passes = []
        for i, p in enumerate(self.passes):
            passes.append({
                "order": i, "name": p.name, "enabled": p.enabled,
                "reads": sorted(p.reads), "writes": sorted(p.writes),
                "persistent": sorted(p.persistent),
                **({"device_ms": round(ms_of[p.name], 3)}
                   if p.name in ms_of else {}),
            })
        return {"passes": passes, "resources": shape_of}
