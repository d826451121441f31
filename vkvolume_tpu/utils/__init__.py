

def enable_compile_cache(path: str = ".cache/jax"):
    """Persistent XLA compilation cache: first compiles of the Pallas frame
    kernel cost minutes over the remote-compile relay; cached executables
    make every later process start warm. Call before the first jit."""
    import os

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
