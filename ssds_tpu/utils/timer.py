"""Wall-clock accumulator for FPS/latency reporting.

Behavioral spec source: reference ``lib/utils/timer.py`` (SURVEY.md §2.7):
``tic``/``toc`` with running average — used by the demo's ``-t time`` mode
and the ObjectDetector per-stage timing. TPU note: call
``jax.block_until_ready`` on outputs before ``toc`` when timing device work
(async dispatch would otherwise under-report).
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        # using perf_counter: monotonic and high-resolution
        self.start_time = time.perf_counter()

    def toc(self, average=True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def clear(self):
        self.__init__()
