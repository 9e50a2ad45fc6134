"""Tracing / profiling utilities (SURVEY.md section 5).

The reference's only observability is wall-clock AverageMeters around the
forward (demo_Vimeo_VE.py:97-98,137-144).  This module keeps those
measurement points and adds the TPU-native layer: ``jax.profiler`` traces
(viewable in XProf/TensorBoard) and a frames/s/chip reporter.
"""

import contextlib
import time

from memcnet_tpu.metrics.meter import AverageMeter


class StageTimers:
    """proc/total timer pair matching the reference protocol: `proc` spans
    the model call, `total` spans the whole per-item loop body."""

    def __init__(self):
        self.proc = AverageMeter()
        self.total = AverageMeter()
        self._t0 = None

    @contextlib.contextmanager
    def item(self):
        start = time.time()
        yield self
        self.total.update(time.time() - start)

    @contextlib.contextmanager
    def model(self):
        start = time.time()
        yield
        self.proc.update(time.time() - start)

    def summary(self):
        return (
            f"proc {self.proc.avg * 1e3:.1f} ms/item, "
            f"total {self.total.avg * 1e3:.1f} ms/item over {self.total.count} items"
        )


@contextlib.contextmanager
def device_trace(log_dir=None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def frames_per_second(n_frames, seconds, n_chips=None):
    """frames/s and frames/s/chip (the BASELINE.json north-star metric)."""
    if n_chips is None:
        try:
            import jax

            n_chips = jax.device_count()
        except Exception:
            n_chips = 1
    fps = n_frames / seconds if seconds > 0 else float("inf")
    return {"frames_per_s": fps, "frames_per_s_per_chip": fps / max(n_chips, 1),
            "n_chips": n_chips}
