"""Fill procedural-dataset image caches with the HOST renderer (nice'd).

Companion to jax_cache_prefill.py for when the chip is busy: renders any
missing cache images for the named presets with the dataset's own host
path tracer at low CPU priority, so a concurrent chip run keeps the core.

Usage: nohup nice -n 19 python -m scripts_dev.host_cache_prefill m2 m4 ... &
"""
import os
import sys
import time

os.nice(19)

from scripts_dev.jax_cache_prefill import PRESETS  # preset table reuse
from splat_trainer_tpu.data import procedural as P


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or ["m2"]
    for name in names:
        ds = P.ProceduralDataset(**PRESETS[name])
        n = len(ds._images)
        t0 = time.time()
        done = 0
        for i in range(n):
            path = ds._cache_path(i)
            if os.path.exists(path):
                continue
            img = ds._render_image(i)
            import numpy as np
            np.save(path + f".tmp{os.getpid()}.npy", img)
            os.replace(path + f".tmp{os.getpid()}.npy", path)
            done += 1
        print(f"{name}: filled {done}/{n} in {time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
