from .data_parallel import make_camera_mesh, make_dp_train_step
from .points_parallel import (
    make_points_mesh, make_pp_train_step, scene_shardings,
    make_pp_densify,
)


def maybe_init_distributed() -> bool:
    """Initialize the JAX distributed runtime for multi-host (pod) runs.

    Called by the train CLI before any device use. Returns True when a
    multi-host setup was detected and initialized. Single-host (including
    single-chip and CPU-mesh tests) needs no coordinator and returns False.

    Detection: explicit coordinator env (JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES, the standard jax.distributed knobs) or a TPU-pod
    environment (TPU_WORKER_HOSTNAMES from the TPU VM metadata).
    """
    import os

    import jax

    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS")
    pod = os.environ.get("TPU_WORKER_HOSTNAMES")
    if not explicit and not pod:
        return False
    try:
        # with the env fully specified, initialize() reads everything itself
        jax.distributed.initialize()
        return True
    except (RuntimeError, ValueError):
        # already initialized (resume inside the same process) — fine
        return jax.process_count() > 1


__all__ = ["make_camera_mesh", "make_dp_train_step", "make_points_mesh",
           "make_pp_train_step", "scene_shardings", "make_pp_densify",
           "maybe_init_distributed"]
