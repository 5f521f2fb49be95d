"""Tensorboard logger with a worker thread.

Capability equivalent of /root/reference/splat_trainer/logger/
tensorboard.py:24-129: queue + worker thread so logging never blocks the
train loop; scalars, HWC images, raw pre-binned histograms, markdown tables
for evaluation rows.
"""

import queue
import threading
from typing import Optional

import numpy as np

from splat_trainer_tpu.logger.histogram import Histogram
from splat_trainer_tpu.logger.logger import Logger


class TensorboardLogger(Logger):
    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(log_dir=log_dir)
        self.queue: "queue.Queue" = queue.Queue()
        self._step = 0
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    def _run(self):
        while True:
            item = self.queue.get()
            if item is None:
                break
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as e:  # logging must never kill training
                print(f"tensorboard logging error: {e}")

    def _submit(self, fn, *args, **kwargs):
        self.queue.put((fn, args, kwargs))

    def step(self, progress):
        self._step = progress.step

    def log_value(self, name, value, step=None):
        if hasattr(value, "item"):
            value = value.item()
        self._submit(self.writer.add_scalar, name, value,
                     step if step is not None else self._step)

    def log_image(self, name, image, caption=None, step=None, compressed=True):
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        self._submit(self.writer.add_image, name, image,
                     step if step is not None else self._step,
                     dataformats="HWC")

    def log_histogram(self, name, values, step=None):
        step = step if step is not None else self._step
        if isinstance(values, Histogram):
            # raw pre-binned histogram (reference write_histogram :120-129)
            h = values
            self._submit(self.writer.add_histogram_raw, name,
                         min=float(h.bin_edges[0]), max=float(h.bin_edges[-1]),
                         num=int(h.n), sum=h.total, sum_squares=h.total_sq,
                         bucket_limits=h.bin_edges[1:].tolist(),
                         bucket_counts=h.counts.tolist(), global_step=step)
        else:
            values = np.asarray(values).reshape(-1)
            values = values[np.isfinite(values)]
            if values.size:
                self._submit(self.writer.add_histogram, name, values, step)

    def log_evaluations(self, name, rows, step=None):
        if not rows:
            return
        cols = list(next(iter(rows.values())).keys())
        lines = ["| image | " + " | ".join(cols) + " |",
                 "|---" * (len(cols) + 1) + "|"]
        for fname, metrics in rows.items():
            lines.append(f"| {fname} | " + " | ".join(
                f"{metrics[c]:.4f}" for c in cols) + " |")
        self._submit(self.writer.add_text, name, "\n".join(lines),
                     step if step is not None else self._step)

    def log_config(self, config):
        import json
        self._submit(self.writer.add_text, "config",
                     f"```\n{json.dumps(config, indent=2, default=str)}\n```")

    def log_json(self, name, data):
        import json
        self._submit(self.writer.add_text, name,
                     f"```\n{json.dumps(data, indent=2, default=str)}\n```")

    def close(self):
        self.queue.put(None)
        self.worker.join(timeout=10)
        self.writer.close()
