"""Observability: metrics logging, timers, running meters.

Parity targets: the reference's record files + TB scalars
(``finetune_src/utils/logger.py``, ``pretrain_src/utils/logger.py``:
``TensorboardLogger`` singleton, ``RunningMeter`` EMA, append-only
``train.txt``/``valid.txt``). Here the primary sink is an append-only
JSONL metrics file (machine-readable; one line per event) with optional
tensorboardX mirroring when available, plus wall-clock timers for the
per-phase profiling the reference lacks (SURVEY §5: env-step / H2D /
model / eval timing as a first-class concern).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional


class Timer:
    """Accumulating wall-clock timer (finetune_src/utils/logger.py:28-57)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.count = 0
        self.last = 0.0  # most recent interval (throughput/MFU logging)
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        assert self._start is not None
        self.last = time.perf_counter() - self._start
        self.total += self.last
        self.count += 1
        self._start = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class RunningMeter:
    """EMA-smoothed scalar (pretrain_src/utils/logger.py RunningMeter)."""

    def __init__(self, name: str, smooth: float = 0.99):
        self.name = name
        self.smooth = smooth
        self.val: Optional[float] = None

    def update(self, v: float):
        self.val = v if self.val is None else (
            self.val * self.smooth + v * (1 - self.smooth)
        )


def write_record(path: str, text: str) -> None:
    """Append-only record file (utils/logger.py:8-13)."""
    with open(path, "a") as f:
        f.write(text.rstrip() + "\n")


class profile_trace:
    """jax.profiler trace scope (SURVEY §5: tracing the reference
    lacks). Usage: ``with profile_trace("runs/trace"): step()`` — view
    with TensorBoard's profile plugin or xprof."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL metrics sink with per-phase timers and optional TB mirror."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        # rank-0 gating (the reference's NoOp on non-default ranks,
        # pretrain_src/utils/misc.py:68-74)
        try:
            import jax

            self.enabled = jax.process_index() == 0
        except Exception:
            self.enabled = True
        self.timers: Dict[str, Timer] = defaultdict(Timer)
        self._tb = None
        self.path = os.path.join(log_dir, filename)
        if not self.enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:  # optional mirror
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def timer(self, name: str) -> Timer:
        return self.timers[name]

    def log(self, step: int, scalars: Dict[str, Any], prefix: str = "") -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            rec[key] = float(v) if isinstance(v, (int, float)) else v
            if self._tb is not None and isinstance(v, (int, float)):
                self._tb.add_scalar(key, float(v), step)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_timers(self, step: int) -> None:
        self.log(step, {f"time/{k}": t.mean for k, t in self.timers.items()})
