from .logging import RingLogger, create_logger
from .format import format_poly_count


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled XLA programs across processes so repeat CLI/server
    invocations skip recompilation (30-90s per program through a remote
    compile service). Called by the app entry points before first device
    use; opt out with WRT_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("WRT_NO_COMPILE_CACHE"):
        return
    import jax

    cache = path or os.environ.get(
        "WRT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "webgl_raytracer_tpu", "jax"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only home: run without the cache
