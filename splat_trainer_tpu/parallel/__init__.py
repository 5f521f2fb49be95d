from .data_parallel import make_camera_mesh, make_dp_train_step

__all__ = ["make_camera_mesh", "make_dp_train_step"]
