"""Background batch prefetch thread
(reference /root/reference/splat_trainer/trainer/loading.py:6-34)."""

import queue
import threading


class ThreadedLoader:
    """Prefetches batches from an iterator on a worker thread."""

    def __init__(self, iterator, queue_size: int = 4):
        self.iterator = iterator
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for item in self.iterator:
                if self._stop.is_set():
                    return
                self.queue.put(item)
        except Exception as e:
            self.queue.put(e)

    def next(self):
        item = self.queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
