

def enable_compile_cache(path: str | None = None):
    """Persistent XLA compilation cache: first compiles of the Pallas frame
    kernel cost minutes over the remote-compile relay (and the relay's
    compile helper occasionally breaks entirely); cached executables make
    every later process start warm. Call before the first jit.

    Defaults to ``<repo>/.cache/jax`` regardless of CWD so every entry
    point (driver, CLI, scripts) shares one cache."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
