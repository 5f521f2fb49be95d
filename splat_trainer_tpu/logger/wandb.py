"""Weights & Biases logger.

Capability equivalent of /root/reference/splat_trainer/logger/wandb.py:
30-160: scalars go straight to a step-ordered queue; heavy payloads
(image encode, histogram binning, point clouds, tables) are encoded on a
thread pool and drained by a single delivery worker in step order, so the
train loop never blocks on wandb's network IO.

The wandb package is not part of this image's baked dependencies, so the
import is deferred to construction with a clear error (the logger is only
instantiated when a run explicitly selects `logger: wandb`).
"""

import heapq
import itertools
import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from splat_trainer_tpu.logger.histogram import Histogram
from splat_trainer_tpu.logger.logger import Logger


class _OrderedDelivery:
    """Single worker draining (step, payload_fn) items in step order.

    Futures enqueue in submission order with their submission-time step, so
    a slow image encode can't deliver after a later step's scalars have
    already advanced wandb's internal step counter (wandb rejects
    out-of-order steps).
    """

    def __init__(self, deliver):
        self._deliver = deliver
        self._queue: "queue.Queue" = queue.Queue()
        self._heap = []
        self._tie = itertools.count()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def put(self, step: int, payload_fn):
        self._queue.put((step, next(self._tie), payload_fn))

    def _run(self):
        stopped = False
        while not stopped or self._heap:
            if not stopped:
                item = self._queue.get()
                if item is None:
                    stopped = True
                else:
                    heapq.heappush(self._heap, item)
                if not self._queue.empty():
                    continue
            while self._heap:
                step, _tie, payload_fn = heapq.heappop(self._heap)
                if payload_fn is None:
                    continue
                try:
                    data = payload_fn()
                    if data:
                        self._deliver(data, step)
                except Exception as e:  # logging must never kill training
                    print(f"wandb logging error: {e}")

    def close(self):
        self._queue.put(None)
        self._thread.join()


class WandbLogger(Logger):
    def __init__(self, project: Optional[str] = None,
                 entity: Optional[str] = None, name: Optional[str] = None,
                 group: Optional[str] = None, workers: int = 4,
                 run=None, wandb_module=None):
        wandb = wandb_module
        if wandb is None:
            try:
                import wandb
            except ImportError as e:
                raise ImportError(
                    "WandbLogger needs the `wandb` package "
                    "(pip install wandb)") from e
        self._wandb = wandb
        self.run = run or wandb.init(
            project=project, entity=entity, name=name, group=group,
            settings=wandb.Settings(start_method="thread", quiet=True))
        self._step = 0
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._delivery = _OrderedDelivery(
            lambda data, step: self.run.log(data, step=step))

    # -- plumbing ---------------------------------------------------------

    def step(self, progress):
        self._step = progress.step

    def _post(self, data: dict, step: Optional[int] = None):
        self._delivery.put(self._step if step is None else step, lambda: data)

    def _post_encoded(self, encode, step: Optional[int] = None):
        future = self._pool.submit(encode)
        self._delivery.put(self._step if step is None else step,
                           future.result)

    def close(self):
        self._delivery.close()
        self._pool.shutdown(wait=True)
        self.run.finish()

    # -- Logger interface --------------------------------------------------

    def log_value(self, name, value, step=None):
        if hasattr(value, "item"):
            value = value.item()
        self._post({name: value}, step)

    def log_values(self, name, values, step=None):
        self._post({f"{name}/{k}": (v.item() if hasattr(v, "item") else v)
                    for k, v in values.items()}, step)

    def log_image(self, name, image, caption=None, step=None,
                  compressed=True):
        image = np.asarray(image)

        def encode():
            img = image
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            return {name: self._wandb.Image(
                img, mode="RGB", caption=caption,
                file_type="jpg" if compressed else "png")}

        self._post_encoded(encode, step)

    def log_histogram(self, name, values, step=None):
        def encode():
            hist = (values if isinstance(values, Histogram)
                    else Histogram.from_values(np.asarray(values)))
            if hist.n == 0:
                return None
            counts = hist.counts / max(hist.counts.sum(), 1e-12)
            return {name: self._wandb.Histogram(
                np_histogram=(counts, hist.bin_edges))}

        self._post_encoded(encode, step)

    def log_cloud(self, name, points, colors=None, step=None):
        pts = np.asarray(points)
        cols = (np.full_like(pts, 127.0) if colors is None
                else np.asarray(colors) * 255.0)

        def encode():
            return {name: self._wandb.Object3D(
                np.concatenate([pts, cols], axis=1))}

        self._post_encoded(encode, step)

    def log_evaluations(self, name, rows, step=None):
        def encode():
            if not rows:
                return None
            columns = list(next(iter(rows.values())).keys())
            table = self._wandb.Table(columns=["filename"] + columns)
            for filename, row in rows.items():
                table.add_data(filename, *[row[c] for c in columns])
            return {name: table}

        self._post_encoded(encode, step)

    def log_config(self, config):
        self.run.config.update(config, allow_val_change=True)

    def log_json(self, name, data):
        self._post_encoded(lambda: {name: json.dumps(data, indent=2)}, step=None)
