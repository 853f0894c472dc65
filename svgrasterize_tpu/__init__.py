"""svgrasterize-tpu: a TPU-native SVG rasterization framework.

Re-implements the capabilities of aslpavel/svgrasterize.py with a JAX/XLA/
Pallas compute path: host-side scene compilation (XML, path data, fonts,
stroke geometry) and device-side pixel work (coverage, paint, composition,
filters), designed to scale across TPU meshes via jax.sharding.
"""

def default_cache_dir() -> str:
    """Default persistent-compile-cache location: XDG_CACHE_HOME (or
    ~/.cache) — NOT /tmp, which is wiped between sessions and turned the
    driver's round-2 bench run into cold remote compiles that ate the
    whole time budget."""
    import os

    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "svgrasterize_tpu", "jax")


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache (the framework's analogue of
    checkpoint/resume: compiled scene-shape programs survive restarts).
    Disable with SVGR_COMPILE_CACHE=0."""
    import os

    # XLA:CPU stamps auto-tuning pseudo-features (+prefer-no-scatter,
    # +prefer-no-gather) into cached AOT results; at load time the host
    # feature check rejects them, so every cross-process "cache hit"
    # silently fell back to a full recompile (~5 s for a material-sized
    # program — the dominant cost of one-shot CLI renders).  Pinning the
    # ISA ceiling makes the stamped feature set host-compatible: loads
    # succeed (measured 6.5 s -> 1.6 s cross-process execute).  Respect
    # an explicit user setting.
    if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX512"
        ).strip()

    cache = os.environ.get("SVGR_COMPILE_CACHE", default_cache_dir())
    if not cache or cache == "0":
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # write every entry: on remote-compile TPU tunnels even a "fast"
        # compile costs a round trip, so any cross-process hit is a win
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        return
    try:
        # jax's persistent cache has a platform allowlist ("tpu", "gpu",
        # "cpu", "neuron"); experimental PJRT plugin platforms like the
        # remote-TPU tunnel ("axon") are silently refused, which costs
        # minutes of recompilation per scene shape in every fresh serving
        # process.  Opt such backends in when they support executable
        # serialization — on failure jax falls back to recompiling, no
        # worse than the cache being off.
        from jax._src import compilation_cache as _cc

        _orig_is_cache_used = _cc.is_cache_used

        def _is_cache_used(backend):
            if (
                backend.platform not in ("tpu", "gpu", "cpu", "neuron")
                and getattr(backend, "supports_executable_serialization", True)
                and _cc._is_cache_enabled()
            ):
                with _cc._cache_initialized_mutex:
                    _cc._cache_checked = True
                    _cc._cache_used = True
                return True
            return _orig_is_cache_used(backend)

        _cc.is_cache_used = _is_cache_used
    except Exception:  # pragma: no cover - private-API patch, best-effort
        pass


_setup_compile_cache()

from .core.transform import Transform
from .core.layer import Layer, canvas_create
from .core import color, png
from .geom.path import Path, FILL_NONZERO, FILL_EVENODD
from .geom.hull import ConvexHull
from .paint import GradLinear, GradRadial, Pattern
from .scene import Scene
from .filter import Filter
from .frontend.svg import scene_from_filepath, scene_from_str, scene_from_xml
from .render_plan import CompiledScene, compile_scene
from .frontend.parsers import parse_color, parse_transform
from .text.fonts import DEFAULT_FONTS, Font, FontsDB, Glyph

__version__ = "0.1.0"
