"""Argv-compatible CLI front doors.

The reference ships 65 clone scripts; here two dispatchers (acquire,
track) plus the standalone utilities (cn0, spectrum, squaring) regenerate
every script's behavior from the signal registry.  scripts/ holds thin
drop-in wrappers with the reference's exact file names.
"""

import os as _os


def enable_compilation_cache():
    """Persistent jit-compilation cache for one-shot CLI runs.

    Every CLI invocation is a fresh process, so without this each run
    pays the full XLA compile (tens of seconds for the acquisition grid
    — minutes over the tunneled remote-compile service).  The cache
    makes repeat invocations start hot.  Opt out with
    GNSS_DSP_NO_COMPILE_CACHE=1 or point GNSS_DSP_CACHE_DIR elsewhere.
    """
    if _os.environ.get("GNSS_DSP_NO_COMPILE_CACHE"):
        return
    path = _os.environ.get(
        "GNSS_DSP_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gnss_dsp_tpu"))
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on the axon backend even a scalar
        # convert_element_type pays a ~0.4 s remote-compile round trip
        # per fresh process (measured round 5: 7 sub-threshold ops =
        # ~4-7 s of every cold CLI run), while a cache load is ~50 ms
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
