"""Iteration logger with wall-clock timing and optional wandb.

Behavioral parity with the reference ``Logger`` (``rlaopt/utils/logger.py:10-51``):
frequency-gated logging, per-round and cumulative wall-clock timing, optional
``wandb.init``/``log``/``finish``. TPU-specific addition: the timer blocks on
async dispatch (``jax.block_until_ready``) so wall-clock numbers measure real
device time, not dispatch time.
"""

import time
from typing import Any, Callable, Optional

import jax


__all__ = ["Logger"]


class Logger:
    """Frequency-gated metrics logger.

    Args:
        log_freq: Log every ``log_freq`` iterations.
        log_fn: Called as ``log_fn(w)``; returns the metrics dict.
        wandb_kwargs: If not None, ``wandb.init(**wandb_kwargs)`` is called and
            every log round is mirrored to wandb.
    """

    def __init__(
        self,
        log_freq: int,
        log_fn: Callable,
        wandb_kwargs: Optional[dict] = None,
    ):
        self.log_freq = log_freq
        self.log_fn = log_fn

        if wandb_kwargs is not None:
            import wandb

            self._wandb = wandb
            self.log_in_wandb = True
            wandb.init(**wandb_kwargs)
        else:
            self._wandb = None
            self.log_in_wandb = False

        self.start_time = time.time()
        self.iter_time = 0.0
        self.cum_time = 0.0

    def _reset_timer(self):
        self.start_time = time.time()

    def _update_cum_time(self):
        self.iter_time = time.time() - self.start_time
        self.cum_time += self.iter_time

    def _compute_log(self, i: int, *args: Any, force: bool = False, **kwargs: Any):
        """Compute the log dict for iteration ``i`` (None off-frequency).

        ``force=True`` logs regardless of frequency — used for the final
        iteration when ``max_iters`` is not a multiple of ``log_freq``, so
        the returned log always ends with a metric-checked entry.
        """
        if i % self.log_freq != 0 and not force:
            return None
        # Ensure all device work attributable to this round has finished so
        # iter_time/cum_time are real wall-clock measurements.
        if args:
            jax.block_until_ready(args[0])
        self._update_cum_time()
        metrics = self.log_fn(*args, **kwargs)

        log_dict = {"iter_time": self.iter_time, "cum_time": self.cum_time}
        log_dict["metrics"] = metrics

        if self.log_in_wandb:
            self._wandb.log(log_dict, step=i)

        self._reset_timer()
        return log_dict

    def _terminate(self):
        if self.log_in_wandb:
            self._wandb.finish()
