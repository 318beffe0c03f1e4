"""Profiling and debug utilities (SURVEY §5: the reference has only ad-hoc
timing in examples/benchmark.py:24-49; here tracing is first-class).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace.
* :func:`summarize_trace` — parse the perfetto json back into a per-op
  device-time table (the tool used to find the VPU-bound dequant and the
  host-resident-params bug during kernel bring-up).
* :func:`enable_nan_checks` — the reference sprinkles NaN asserts through
  the math (awq/quantize/quantizer.py:80,103); here it is one global debug
  switch (also honoured at import when ``AWQ_TPU_DEBUG_NANS=1``).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/autoawq_tpu_trace"):
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


def summarize_trace(log_dir: str, top: int = 25,
                    group: bool = True) -> List[Tuple[str, float, int]]:
    """-> [(op_name, total_device_us, count)] sorted by time desc."""
    files = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace files under {log_dir}")
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    device_pids = {
        e["pid"] for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg: Dict[str, float] = collections.Counter()
    cnt: Dict[str, int] = collections.Counter()
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and "dur" in e and not e["name"].startswith("jit_")):
            name = re.sub(r"\.\d+$", "", e["name"]) if group else e["name"]
            agg[name] += e["dur"]
            cnt[name] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [(n, d, cnt[n]) for n, d in rows]


def print_trace_summary(log_dir: str, top: int = 25) -> None:
    for name, us, n in summarize_trace(log_dir, top):
        print(f"{us:10.1f} us  x{n:6d}  {name[:90]}")


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


if os.environ.get("AWQ_TPU_DEBUG_NANS") == "1":  # pragma: no cover
    enable_nan_checks(True)
