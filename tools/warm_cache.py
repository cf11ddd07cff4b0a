"""Compile-cache primer (round-5 VERDICT item 2).

Pre-compiles every program the 2017 sky workload uses — the three shared
tracking programs (W128-BPSK / W256-BPSK / subcarrier-16-row), the
acquisition grids of all 21 acquire-all scripts, and the tiny glue ops —
into the persistent compilation cache (~/.cache/gnss_dsp_tpu) by running
the batched workload against a locally-synthesized 120 ms capture.
Run it once after a fresh clone, a JAX upgrade, or a cache wipe, ideally
off-peak; subsequent cold CLI processes then LOAD executables instead of
compiling (measured 12/12 persistent-cache hits, ~0.5 s total, after
priming).

    python tools/warm_cache.py [capture.pcap]

What this does and does NOT bound (measured 2026-08-20, BASELINE.md
"cold path" section): with a fully-primed cache the remaining cold-run
cost is jit TRACING (~3-5 s host-side), device/runtime init, and the
axon service's executable-load + first-dispatch latency — the LAST of
which varied 4x for the SAME cached program within minutes (28 s vs
124 s single script; track-all 42.6-133.3 s over ten runs).  Explicit
AOT executable serialization (jax.experimental.serialize_executable)
works on this backend but is the same mechanism the persistent cache
already uses, so it cannot bound the service-side variance either.  On
a locally-attached TPU host the post-priming cold floor is the tracing
+ cache-load cost only.
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    data = sys.argv[1] if len(sys.argv) > 1 else None
    if data is None or not os.path.exists(data):
        data = os.path.join(tempfile.gettempdir(), "gnss-warm-120ms.pcap")
        if not os.path.exists(data):
            print("synthesizing 120 ms priming capture ...")
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "synth_sky.py"),
                 data, "120"],
                check=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    dest = os.path.join(tempfile.gettempdir(), "gnss-warm-out")
    print("priming: batched acquire-all + track-all (every workload "
          "program compiles into the persistent cache) ...")
    r = subprocess.run(
        [sys.executable, "-m", "gnss_dsp_tpu.cli.workload", "all",
         data, dest], cwd=REPO)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
