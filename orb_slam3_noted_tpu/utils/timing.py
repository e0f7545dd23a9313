"""Per-stage timing instrumentation (the reference's REGISTER_TIMES).

The reference gates ``std::chrono`` spans around every pipeline stage behind
a compile-time flag (`/root/reference/include/Config.h:4`) and dumps
mean/std per stage at shutdown (``Tracking::PrintTimeStats``,
`src/Tracking.cc:194-251`, `src/System.cc:414-416`).  Same taxonomy here so
numbers stay comparable:

    extract, stereo_match, preintegrate, pose_pred, track_local_map,
    new_kf_decision, triangulate, fuse, local_ba, kf_cull,
    loop_detect, loop_correct, gba

Enable with ``StageTimer.enabled = True`` (or the ``ORB_TPU_TIMES`` env
var); disabled timers cost one attribute check.  ``block`` controls whether
a stage waits for device completion (jax dispatch is async — without
blocking, a span measures dispatch, not compute).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np


class StageTimer:
    enabled = bool(int(os.environ.get("ORB_TPU_TIMES", "0")))

    def __init__(self):
        self.spans = defaultdict(list)

    @contextmanager
    def stage(self, name: str, block=None):
        if not StageTimer.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if block is not None:
            try:
                import jax

                jax.block_until_ready(block)
            except Exception:
                pass
        self.spans[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, v in self.spans.items():
            a = np.asarray(v)
            out[name] = {
                "n": int(a.size),
                "mean_ms": float(a.mean() * 1e3),
                "std_ms": float(a.std() * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def print_stats(self, file=None):
        """Reference ``Tracking::PrintTimeStats`` analogue."""
        rows = self.summary()
        lines = ["stage                     n    mean ms     std ms    total s"]
        for name in sorted(rows):
            r = rows[name]
            lines.append(
                f"{name:<22} {r['n']:>5} {r['mean_ms']:>10.3f}"
                f" {r['std_ms']:>10.3f} {r['total_s']:>10.3f}"
            )
        text = "\n".join(lines)
        print(text, file=file)
        return text

    def save(self, path: str):
        """Dump per-stage means to a file (reference ``ExecTimeMean.txt``)."""
        with open(path, "w") as f:
            self.print_stats(file=f)


GLOBAL_TIMER = StageTimer()
