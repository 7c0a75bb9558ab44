"""Structured per-step metrics (SURVEY.md section 5: "metrics / logging /
observability" — the reference's only observability is the viewer FPS
counter and LOG_INFO timing lines; a production renderer needs per-step
rays/s, live-ray occupancy, bounce histograms, and gradient norms).

Two pieces:

* :class:`MetricsLogger` — append structured dicts as JSONL (one line
  per render/train step) to a file and/or stdout, with a monotonically
  increasing step counter and wall-clock timestamps.
* :class:`RaysMeter` — wall-clock rays/s meter for the render loop
  (reference analog: the viewer HUD FPS counter), with an exponential
  moving average for steady readouts.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, IO, Optional

import numpy as np

__all__ = ["MetricsLogger", "RaysMeter", "occupancy", "grad_norms"]


class MetricsLogger:
    """Append per-step metric dicts as JSONL.

    >>> m = MetricsLogger("/tmp/run.jsonl")
    >>> m.log(rays_per_s=1.2e8, live_occupancy=0.43, loss=0.012)
    """

    def __init__(
        self,
        path: Optional[str] = None,
        stream: Optional[IO[str]] = None,
        echo: bool = False,
    ):
        self._fh = open(path, "a") if path else None
        self._stream = stream
        self._echo = echo
        self._step = 0
        self._t0 = time.time()

    def log(self, step: Optional[int] = None, **metrics: Any) -> Dict:
        rec = {
            "step": self._step if step is None else int(step),
            "t": round(time.time() - self._t0, 4),
        }
        for k, v in metrics.items():
            if hasattr(v, "item") and getattr(v, "size", 2) == 1:
                v = v.item()
            elif isinstance(v, np.ndarray):
                v = v.tolist()
            rec[k] = v
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._stream:
            self._stream.write(line + "\n")
        if self._echo:
            sys.stdout.write(line + "\n")
        if step is None:
            self._step += 1
        return rec

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class RaysMeter:
    """Wall-clock rays/s meter with an EMA readout.

    Call :meth:`tick(n_rays)` once per completed (synchronized!) frame.
    """

    def __init__(self, ema: float = 0.8):
        self._ema = ema
        self._rate = None
        self._last = None
        self.total_rays = 0

    def tick(self, n_rays: int) -> Optional[float]:
        now = time.time()
        self.total_rays += int(n_rays)
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = n_rays / dt
            self._rate = (
                inst
                if self._rate is None
                else self._ema * self._rate + (1 - self._ema) * inst
            )
        self._last = now
        return self._rate

    @property
    def rays_per_s(self) -> Optional[float]:
        return self._rate


def occupancy(live) -> float:
    """Fraction of live rays in a wavefront buffer (post-compaction
    occupancy — the quantity that drives packet-traversal cost)."""
    live = np.asarray(live)
    return float(live.mean()) if live.size else 0.0


def grad_norms(grads) -> Dict[str, float]:
    """Per-leaf L2 norms of a gradient pytree, keyed by path string."""
    import jax

    out: Dict[str, float] = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = float(np.linalg.norm(np.asarray(leaf).ravel()))
    return out
