"""Console + CSV metric logging, diffable against the reference run logs.

The reference prints loss components every 100 iters (tools/trainV2_simt.py:438-441,
trainV1_warmup.py:234-237) and per-class IoU tables every 1000; ``logs/*.out`` are its
only regression artifacts (SURVEY.md §4). These formatters reproduce those lines exactly
so our runs diff cleanly against the published logs, plus a structured CSV the reference
never had.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


def format_simt_line(i_iter: int, num_steps: int, m: Dict[str, float]) -> str:
    """trainV2_simt.py:439-441 format."""
    return (
        "iter = {0:8d}/{1:8d}, loss_seg_p = {2:.3f} loss_seg_y = {3:.3f} "
        "Convex = {4:.3f} Volume = {5:.3f} Anchor = {6:.3f} Place_loss = {7:.3f}".format(
            i_iter,
            num_steps,
            float(m["loss_seg_p"]),
            float(m["loss_seg_y"]),
            float(m["convex"]),
            float(m["volume"]),
            float(m["anchor"]),
            float(m["place"]),
        )
    )


def format_warmup_line(i_iter: int, num_steps: int, m: Dict[str, float]) -> str:
    """trainV1_warmup.py:235-237 format."""
    return "iter = {0:8d}/{1:8d}, loss_seg1 = {2:.3f} loss_seg2 = {3:.3f}".format(
        i_iter, num_steps, float(m["loss_seg1"]), float(m["loss_seg2"])
    )


class MetricWriter:
    """CSV metric sink + stdout passthrough."""

    def __init__(self, csv_path: Optional[str] = None):
        self.csv_path = csv_path
        self._writer = None
        self._file = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if self.csv_path is None:
            return
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None:
            os.makedirs(os.path.dirname(self.csv_path) or ".", exist_ok=True)
            self._file = open(self.csv_path, "w", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=list(row))
            self._writer.writeheader()
        self._writer.writerow(row)
        self._file.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()


class StepTimer:
    """Honest steps/s over a window (block_until_ready is the caller's job)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.count = 0

    def tick(self, n: int = 1) -> None:
        self.count += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else 0.0

    def reset(self) -> None:
        self.t0 = time.perf_counter()
        self.count = 0
